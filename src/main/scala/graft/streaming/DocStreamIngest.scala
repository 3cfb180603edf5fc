package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
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
  * The bounded gate form stages the corpus's doc_id % 3 terciles as
  * three time-ordered chunks with planted cross-batch structure
  * ([[graft.Planted.streamIngestRows]]) and returns ONE row of
  * aggregated verdict bits (the q189/q206 property-gate shape) — every
  * bit pinned by the construction. Work dirs are fresh per call and
  * self-clean; the result is materialized before cleanup.
  */
object DocStreamIngest {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType)))

  def ingestVerdictsBounded(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_stream_ingest_")
    val src = base.resolve("src"); val ckpt = base.resolve("ckpt")
    val store = base.resolve("store"); val sink = base.resolve("sink")
    java.nio.file.Files.createDirectories(src)
    // empty seed store: the stream starts from nothing ingested
    DedupStore.write(Seq.empty[(Long, String, String)].toDF("doc_id", "text", "lang"),
      store.toString)
    // three time-ordered chunks: organic terciles + the planted
    // cross-batch rows; single part file per chunk, ascending mtimes
    // (the stagedTimeOrderedEventsDir staging discipline)
    val organic = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), col("lang"))
    val planted = graft.Planted.streamIngestDocs(spark)
    (0 until 3).foreach { i =>
      val chunk = organic.filter(pmod(col("doc_id"), lit(3)) === i)
        .unionByName(planted.filter(col("chunk") === i).drop("chunk"))
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
    }
    val stream = spark.readStream
      .schema(docSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(src.toString)
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val st = DedupStore.load(spark, store.toString)
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
    q.processAllAvailable()
    q.stop()
    val B = graft.Planted.siBase
    val out = spark.read.parquet(sink.toString).agg(
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
      .collect()
    graft.io.SwapDir.deleteRecursively(base)
    spark.createDataFrame(
      spark.sparkContext.parallelize(out.toSeq, 1),
      StructType(Seq("seed_new", "cross_batch_exact_suppressed",
        "cross_batch_near_suppressed", "batch_canonical_new",
        "within_batch_dup_labeled", "appended_batches_suppress",
        "fresh_new", "three_batches")
        .map(StructField(_, org.apache.spark.sql.types.BooleanType))))
  }
}
