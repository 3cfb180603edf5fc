package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{BooleanType, LongType, StringType, StructField, StructType}
import graft.dedup.DedupStore

/** STREAMING crawl ingestion against the persisted dedup store — the
  * missing tense of the q186/q189 story: a crawler does not hand the
  * store one batch, it delivers snapshots continuously. Each micro-batch
  * runs the EXACT q186 ingest (within-batch canonicals, store hash
  * anti-join, chunk-blocked near stage) against the store AS OF that
  * batch, then appends its accepted rows — so a document seen in batch
  * 0 suppresses its copies in batch 2 through the store itself, not
  * through stream state. That is the 100 TB design point: the
  * streaming state is the persisted store (O(corpus rows) on disk,
  * appended O(batch) per micro-batch), NOT an in-memory state store
  * that would have to hold the corpus's signatures under a watermark
  * that never expires (content never ages out of dedup).
  *
  * Mechanics: a file-source stream (one chunk per micro-batch, the q44
  * fixture discipline) drives `foreachBatch`; the batch body is pure
  * engine API — load / ingest / append — and writes each batch's
  * (doc_id, verdict, batch_id) to a parquet sink. Verdict labels are
  * [[DedupStore.ingest]]'s. Batches are sequential by contract, so the
  * append of batch i is visible to load in batch i+1.
  *
  * RESTART SAFETY comes with the architecture instead of being bolted
  * on: offsets live in the stream checkpoint (a clean stop resumes at
  * the next unprocessed chunk — [[ingestVerdictsRestartBounded]] proves
  * batches are neither skipped nor re-run), and even a CRASH replay
  * (foreachBatch is at-least-once) cannot corrupt the store — appending
  * the same accepted rows twice leaves duplicate hash/signature rows
  * that the anti-join and blocking stages absorb by construction, so
  * every later verdict is unchanged. Exactly the reason dedup state
  * belongs in an idempotent-append store rather than exactly-once
  * stream state.
  *
  * The bounded gate forms stage the corpus's doc_id % 3 terciles as
  * time-ordered chunks with planted cross-batch structure
  * ([[graft.Planted.streamIngestRows]]) and return ONE row of
  * aggregated verdict bits (the q189/q206 property-gate shape) — every
  * bit pinned by the construction. Work dirs are fresh per call and
  * self-clean; the result is materialized before cleanup.
  */
object DocStreamIngest {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType)))

  /** Stage one chunk as a single part file with an ascending mtime (the
    * stagedTimeOrderedEventsDir staging discipline).
    */
  private def stageChunk(src: java.nio.file.Path, chunk: DataFrame, i: Int): Unit = {
    val tmp = src.resolve(s"_stage_chunk_$i")
    chunk.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = tmp.toFile.listFiles().find(_.getName.startsWith("part-")).get
    val target = src.resolve(s"chunk_$i.parquet")
    java.nio.file.Files.move(part.toPath, target,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    java.nio.file.Files.setLastModifiedTime(target,
      java.nio.file.attribute.FileTime.fromMillis(1600000000000L + i * 60000L))
    tmp.toFile.listFiles().foreach(f => { f.delete(); () })
    java.nio.file.Files.deleteIfExists(tmp)
    ()
  }

  private def chunkOf(spark: SparkSession, sfDir: String, i: Int): DataFrame = {
    val organic = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), col("lang"))
    organic.filter(pmod(col("doc_id"), lit(3)) === i)
      .unionByName(graft.Planted.streamIngestDocs(spark)
        .filter(col("chunk") === i).drop("chunk"))
  }

  /** The three tercile chunks staged ONCE per sf dir (`_SUCCESS`-guarded,
    * shared across JVMs — the [[graft.streaming.EventsStream]] fixture
    * discipline): the chunk CONTENT is a deterministic function of the
    * corpus + planted rows, so re-deriving it per call was three corpus
    * scans + three single-task writes of fixture I/O billed to every
    * bench/verify invocation (round-17, guide §1.2 — don't compute things
    * twice). Per-call state (store, checkpoint, sink, and the src dir the
    * chunks are COPIED into with ascending mtimes) stays fresh per call —
    * the query's own work is computed from scratch every time.
    */
  private def stagedChunksDir(spark: SparkSession, sfDir: String): java.nio.file.Path = {
    val key = graft.FixtureKey(sfDir)
    val dir = java.nio.file.Paths.get(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"), s"graft_si_chunks_$key")
    if (!java.nio.file.Files.exists(dir.resolve("_SUCCESS"))) {
      java.nio.file.Files.createDirectories(dir)
      (0 until 3).foreach(i => stageChunk(dir, chunkOf(spark, sfDir, i), i))
      java.nio.file.Files.createFile(dir.resolve("_SUCCESS"))
      ()
    }
    dir
  }

  /** Copy staged chunk `i` into this call's src dir with the ascending
    * mtime the file source orders by.
    */
  private def arriveChunk(staged: java.nio.file.Path, src: java.nio.file.Path,
                          i: Int): Unit = {
    val target = src.resolve(s"chunk_$i.parquet")
    java.nio.file.Files.copy(staged.resolve(s"chunk_$i.parquet"), target)
    java.nio.file.Files.setLastModifiedTime(target,
      java.nio.file.attribute.FileTime.fromMillis(1600000000000L + i * 60000L))
    ()
  }

  /** One query incarnation over whatever chunks `src` currently holds:
    * drains everything available, then stops cleanly (offsets committed
    * in `ckpt`, so the next incarnation resumes after them).
    */
  private def runIncarnation(spark: SparkSession, src: java.nio.file.Path,
                             ckpt: java.nio.file.Path, store: java.nio.file.Path,
                             sink: java.nio.file.Path): Unit = {
    val stream = spark.readStream
      .schema(docSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(src.toString)
    val q = {
      // pin the drain's shuffle-partition count like every EventsStream
      // drain does (runToMemory's statePartitions discipline): each batch
      // is increment-sized, so batch-oriented counts only multiply the
      // per-stage task constant. start() clones the session conf, and the
      // batch body plans against the CLONED session (batch.sparkSession),
      // so the pin covers every per-batch job; the session value is
      // restored the moment start returns.
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", 8)
      try stream.writeStream
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          val sp = batch.sparkSession
          val st = DedupStore.load(sp, store.toString)
          val verdicts = DedupStore.ingest(st, batch)
          // one materialization serves both the sink write and the append
          val staged = verdicts.localCheckpoint(true)
          staged.select(col("doc_id"), col("verdict"), lit(batchId).as("batch_id"))
            .write.mode("append").parquet(sink.toString)
          DedupStore.append(
            staged.filter(col("verdict") === "new")
              .select(col("doc_id"), col("text"), col("lang")),
            store.toString)
          staged.unpersist()
          ()
        }
        .option("checkpointLocation", ckpt.toString)
        .trigger(Trigger.ProcessingTime(0))
        .start()
      finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    q.processAllAvailable()
    q.stop()
  }

  private def workDirs(): (java.nio.file.Path, java.nio.file.Path,
      java.nio.file.Path, java.nio.file.Path, java.nio.file.Path) = {
    val base = java.nio.file.Files.createTempDirectory("graft_stream_ingest_")
    val src = base.resolve("src")
    java.nio.file.Files.createDirectories(src)
    (base, src, base.resolve("ckpt"), base.resolve("store"), base.resolve("sink"))
  }

  private def seedEmptyStore(spark: SparkSession, store: java.nio.file.Path): Unit = {
    import spark.implicits._
    DedupStore.write(
      Seq.empty[(Long, String, String)].toDF("doc_id", "text", "lang"),
      store.toString)
  }

  /** Aggregate the construction-pinned verdict bits; `withExactlyOnce`
    * adds the restart gate's row-accounting bit (every document
    * verdicted exactly once across incarnations).
    */
  private def verdictBits(spark: SparkSession, sink: java.nio.file.Path,
                          nDocsExpected: Long,
                          withExactlyOnce: Boolean): DataFrame = {
    val B = graft.Planted.siBase
    val baseCols = Seq(
      min(when(col("doc_id") === B + 0, col("verdict") === "new"))
        .as("seed_new"),
      min(when(col("doc_id") === B + 1, col("verdict") === "dup_vs_store"))
        .as("cross_batch_exact_suppressed"),
      min(when(col("doc_id") === B + 2, col("verdict") === "near_dup_vs_store"))
        .as("cross_batch_near_suppressed"),
      min(when(col("doc_id") === B + 3, col("verdict") === "new"))
        .as("batch_canonical_new"),
      min(when(col("doc_id") === B + 4, col("verdict") === "dup_in_batch"))
        .as("within_batch_dup_labeled"),
      min(when(col("doc_id").isin(B + 5, B + 6), col("verdict") === "dup_vs_store"))
        .as("appended_batches_suppress"),
      min(when(col("doc_id") === B + 7, col("verdict") === "new"))
        .as("fresh_new"),
      (count_distinct(col("batch_id")) === 3).as("three_batches"))
    val cols = if (withExactlyOnce)
      baseCols :+ (count(lit(1)) === nDocsExpected).as("exactly_once")
    else baseCols
    val out = spark.read.parquet(sink.toString)
      .agg(cols.head, cols.tail: _*).collect()
    val names = Seq("seed_new", "cross_batch_exact_suppressed",
      "cross_batch_near_suppressed", "batch_canonical_new",
      "within_batch_dup_labeled", "appended_batches_suppress",
      "fresh_new", "three_batches") ++
      (if (withExactlyOnce) Seq("exactly_once") else Nil)
    spark.createDataFrame(
      spark.sparkContext.parallelize(out.toSeq, 1),
      StructType(names.map(StructField(_, BooleanType))))
  }

  def ingestVerdictsBounded(spark: SparkSession, sfDir: String): DataFrame = {
    val (base, src, ckpt, store, sink) = workDirs()
    seedEmptyStore(spark, store)
    val staged = stagedChunksDir(spark, sfDir)
    (0 until 3).foreach(i => arriveChunk(staged, src, i))
    runIncarnation(spark, src, ckpt, store, sink)
    val out = verdictBits(spark, sink, 0L, withExactlyOnce = false)
    graft.io.SwapDir.deleteRecursively(base)
    out
  }

  /** The restart proof (q75's two-incarnation pattern applied to the
    * store-backed ingest): incarnation 1 sees chunks 0–1, drains, and
    * stops — leaving committed offsets in the checkpoint and batch 0–1's
    * accepted content in the STORE (on disk, not in stream state). Chunk
    * 2 then "arrives" and incarnation 2 resumes from the same
    * checkpoint: it must skip the committed batches (no replayed
    * verdicts — the `exactly_once` row-accounting bit) yet still
    * suppress chunk 2's copies of chunk 0–1 content through the store
    * the first incarnation grew. A broken offset restore double-counts
    * rows; a store that lived in stream state would come back empty and
    * flip `appended_batches_suppress`.
    */
  def ingestVerdictsRestartBounded(spark: SparkSession, sfDir: String): DataFrame = {
    val (base, src, ckpt, store, sink) = workDirs()
    seedEmptyStore(spark, store)
    val staged = stagedChunksDir(spark, sfDir)
    // exactly-once row accounting: the staged chunks partition the corpus +
    // planted rows exactly, so their row count IS nDocs — a scan of the
    // three small staged files instead of a fresh corpus count per call
    val nDocs = spark.read.parquet(staged.toString).count()
    (0 until 2).foreach(i => arriveChunk(staged, src, i))
    runIncarnation(spark, src, ckpt, store, sink)
    arriveChunk(staged, src, 2)
    runIncarnation(spark, src, ckpt, store, sink)
    val out = verdictBits(spark, sink, nDocs, withExactlyOnce = true)
    graft.io.SwapDir.deleteRecursively(base)
    out
  }
}
