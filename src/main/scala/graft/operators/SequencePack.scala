package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sequence packing — the last mile of a training-data pipeline: the
  * corpus's tokens concatenated in one canonical order and cut into
  * fixed-`capacity` training sequences, documents crossing sequence
  * boundaries (the GPT pack-and-split convention: zero padding waste,
  * the attention mask handles intra-sequence document boundaries —
  * which is exactly what [[summary]]'s per-sequence document spans
  * feed).
  *
  * Determinism and scale shape: the only global state is the EXCLUSIVE
  * prefix sum of per-document token counts over the (idCol) total order
  * — [[DistRank.prefixSum]], the two-pass range-shuffle with one long
  * per partition on the driver, NEVER a single-partition window. Every
  * downstream column is arithmetic on (start_offset, n_tokens):
  *
  *   first_seq = start_offset / capacity
  *   last_seq  = (start_offset + n_tokens − 1) / capacity
  *
  * so the same corpus packs to the same sequences under any
  * parallelism, re-shuffle or re-ingest — a SQL cumsum replays it
  * bit-for-bit (q207). Zero-token documents are EXCLUDED (documented:
  * they occupy no stream positions; a packer emitting them would pin
  * them to an arbitrary boundary).
  *
  * [[summary]] explodes each document onto its touched sequences —
  * total_tokens/capacity + at most 2 rows per document, the bounded
  * fan-out — and aggregates (n_docs, n_tokens, first_doc, last_doc)
  * per sequence: every sequence holds exactly `capacity` tokens except
  * the last (the stream tail), and each document's overlap with
  * sequence k is min((k+1)·C, start+n) − max(k·C, start).
  */
object SequencePack {

  /** Per-document placement in the packed stream:
    * (idCol, n_tokens, start_offset, first_seq, last_seq).
    */
  def assign(docs: DataFrame, capacity: Long, idCol: String = "doc_id",
             tokensCol: Column = graft.functions.TextFunctions.tokenCount(col("text"))): DataFrame = {
    require(capacity >= 1, "capacity must be >= 1")
    val sized = docs
      .select(col(idCol), tokensCol.cast("bigint").as("n_tokens"))
      .filter(col("n_tokens") > 0)
    DistRank.prefixSum(sized, Seq(col(idCol)), "n_tokens")
      .withColumnRenamed("offset", "start_offset")
      .withColumn("first_seq", (col("start_offset") / capacity).cast("bigint"))
      .withColumn("last_seq",
        ((col("start_offset") + col("n_tokens") - 1) / capacity).cast("bigint"))
  }

  /** Persisted pack manifest — the INCREMENTAL tense: a training corpus
    * grows by crawl increments, and repacking 100 TB because 1 TB
    * arrived would be absurd. The stream-concatenation order makes
    * increments trivial: appending documents whose ids all sort AFTER
    * the stored ones extends the token stream, so their placements are
    * the same arithmetic with the stored stream length as the base
    * offset — every existing placement is UNTOUCHED (only the former
    * tail sequence can gain cohabitants), and increment-equals-batch is
    * exact: [[loadAssign]] after write+append is bit-identical to
    * [[assign]] over the union (the q210 gate proves it against the
    * batch cumsum oracle). State: the corpus-sized `assign/` table
    * (appended, never rewritten — the DedupStore discipline) + a 1-row
    * `meta/` (capacity, total_tokens, max_doc_id) swapped via
    * [[graft.io.SwapDir]]. The id-ordering requirement is CHECKED
    * (fail-fast) — interleaving ids would need a repack by definition.
    *
    * SINGLE-WRITER CONTRACT (the [[graft.io.SwapDir]] contract, stated
    * here because `append` also deletes): at most one process may mutate
    * a manifest directory at a time. Readers are safe beside that one
    * writer EXCEPT during [[append]]'s orphan cleanup: `cleanUncommitted`
    * physically deletes uncommitted assign files a concurrent reader may
    * already have LISTED, so that reader's scan can fail mid-execution
    * with FileNotFoundException even though its `id <= max_doc_id` filter
    * excludes every orphan row (round-16 ADVICE). Schedule appends like
    * compactions: as the single maintenance writer, not beside readers.
    */
  object Manifest {
    def write(docs: DataFrame, capacity: Long, dir: String,
              idCol: String = "doc_id",
              tokensCol: Column = graft.functions.TextFunctions.tokenCount(col("text"))): Unit = {
      val spark = docs.sparkSession
      import spark.implicits._
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
      val a = assign(docs, capacity, idCol, tokensCol)
      a.write.mode("overwrite").parquet(s"$dir/assign_staging")
      graft.io.SwapDir.swapIn(dir, "assign")
      val Seq((tot, maxId)) = spark.read.parquet(s"$dir/assign")
        .agg(coalesce(sum(col("n_tokens")), lit(0L)),
          coalesce(max(col(idCol)), lit(Long.MinValue)))
        .as[(Long, Long)].collect().toSeq
      Seq((capacity, tot, maxId)).toDF("capacity", "total_tokens", "max_doc_id")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta_staging")
      graft.io.SwapDir.swapIn(dir, "meta")
    }

    /** Extend the stream with `newDocs` (all ids strictly above the
      * stored max — checked): their placements append as new parquet
      * files, the stored table is never rewritten, and only `meta/` is
      * swapped. O(increment) work and I/O.
      */
    /** The id column of a stored assign table (caller-named at write time;
      * the other four columns are fixed by [[assign]]'s contract).
      */
    private def idColOf(df: DataFrame): String = {
      val fixed = Set("n_tokens", "start_offset", "first_seq", "last_seq")
      df.schema.fieldNames.find(!fixed.contains(_)).getOrElse("doc_id")
    }

    /** Crash/retry recovery for [[append]] (round-15 ADVICE): placements
      * land in `assign/` BEFORE `meta/` swaps, so `meta.max_doc_id` is the
      * COMMIT POINT — any assign file whose rows all carry ids above it was
      * written by an append that died (or will be retried) before its meta
      * swap. Files never mix committed and uncommitted ids (each append's
      * rows all exceed its base max), so deleting exactly those files
      * restores the committed state; a retry then re-derives the same
      * placements from the committed totals instead of duplicating them.
      */
    private def cleanUncommitted(spark: SparkSession, dir: String,
                                 committedMax: Long): Unit = {
      val assign = spark.read.parquet(s"$dir/assign")
      val idc = idColOf(assign)
      // pushdown on id > committedMax prunes committed files via row-group
      // stats — the scan reads footers, not the table
      val orphans = assign
        .withColumn("__f", input_file_name())
        .filter(col(idc) > committedMax)
        .select(col("__f")).distinct().collect().map(_.getString(0))
      if (orphans.nonEmpty) {
        // Hadoop FS API (round-16 ADVICE/VERDICT): input_file_name yields a
        // URI on whatever filesystem the store lives on — java.nio against
        // URI.getPath silently no-ops on HDFS/S3, exactly where the 100 TB
        // deployment runs (IterState.purge already deletes this way).
        // delete() returning false (already gone — a concurrent cleaner)
        // is fine; the recheck below is the correctness gate.
        val hconf = spark.sparkContext.hadoopConfiguration
        orphans.foreach { uri =>
          val p = new org.apache.hadoop.fs.Path(uri)
          p.getFileSystem(hconf).delete(p, false)
        }
        // post-condition, not best-effort (round-16 ADVICE): a surviving
        // orphan row would let the retry append DUPLICATE placements whose
        // ids the meta swap then commits — fail the append instead. The
        // re-read re-lists the dir, and the filter is footer-pruned.
        val survivors = spark.read.parquet(s"$dir/assign")
          .filter(col(idc) > committedMax).limit(1).count()
        require(survivors == 0L,
          s"cleanUncommitted: uncommitted rows (id > $committedMax) survive " +
            s"under $dir/assign — orphan delete failed; refusing to append " +
            "duplicate placements")
      }
    }

    def append(newDocs: DataFrame, dir: String, idCol: String = "doc_id",
               tokensCol: Column = graft.functions.TextFunctions.tokenCount(col("text"))): Unit = {
      val spark = newDocs.sparkSession
      import spark.implicits._
      graft.io.SwapDir.healSwap(dir, "assign")
      graft.io.SwapDir.healSwap(dir, "meta")
      val Seq((cap, tot, maxId)) = spark.read.parquet(s"$dir/meta")
        .select(col("capacity"), col("total_tokens"), col("max_doc_id"))
        .as[(Long, Long, Long)].collect().toSeq
      cleanUncommitted(spark, dir, maxId)
      val sized = newDocs
        .select(col(idCol), tokensCol.cast("bigint").as("n_tokens"))
        .filter(col("n_tokens") > 0)
      val minNew = sized.agg(min(col(idCol))).as[Option[Long]].collect()(0)
      minNew.foreach(m => require(m > maxId,
        s"append ids must sort after the stored stream (min new id $m <= " +
          s"stored max $maxId) — interleaving ids means a repack"))
      val a = DistRank.prefixSum(sized, Seq(col(idCol)), "n_tokens")
        .withColumn("start_offset", col("offset") + tot)
        .drop("offset")
        .withColumn("first_seq", (col("start_offset") / cap).cast("bigint"))
        .withColumn("last_seq",
          ((col("start_offset") + col("n_tokens") - 1) / cap).cast("bigint"))
        .select(col(idCol), col("n_tokens"), col("start_offset"),
          col("first_seq"), col("last_seq"))
      a.write.mode("append").parquet(s"$dir/assign")
      val Seq((dTot, dMax)) = a
        .agg(coalesce(sum(col("n_tokens")), lit(0L)),
          coalesce(max(col(idCol)), lit(Long.MinValue)))
        .as[(Long, Long)].collect().toSeq
      Seq((cap, tot + dTot, math.max(maxId, dMax)))
        .toDF("capacity", "total_tokens", "max_doc_id")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta_staging")
      graft.io.SwapDir.swapIn(dir, "meta")
    }

    def loadAssign(spark: SparkSession, dir: String): DataFrame = {
      graft.io.SwapDir.healSwap(dir, "assign")
      graft.io.SwapDir.healSwap(dir, "meta")
      // visibility = the committed snapshot: rows above meta.max_doc_id
      // belong to an append that never reached its meta swap (see
      // cleanUncommitted) and must not be readable — the filter pushes down
      // to the scan, so committed files prune via row-group stats
      val maxId = spark.read.parquet(s"$dir/meta")
        .select(col("max_doc_id")).collect()(0).getLong(0)
      val assign = spark.read.parquet(s"$dir/assign")
      assign.filter(col(idColOf(assign)) <= maxId)
    }

    def capacityOf(spark: SparkSession, dir: String): Long = {
      graft.io.SwapDir.healSwap(dir, "meta")
      spark.read.parquet(s"$dir/meta").select(col("capacity"))
        .collect()(0).getLong(0)
    }
  }

  /** Per-sequence report over an [[assign]] result:
    * (seq_id, n_docs, n_tokens, first_doc, last_doc).
    */
  def summary(assigned: DataFrame, capacity: Long,
              idCol: String = "doc_id"): DataFrame =
    assigned
      .select(col(idCol), col("n_tokens"), col("start_offset"),
        explode(sequence(col("first_seq"), col("last_seq"))).as("seq_id"))
      .withColumn("overlap",
        least(lit(capacity) * (col("seq_id") + 1),
          col("start_offset") + col("n_tokens")) -
          greatest(lit(capacity) * col("seq_id"), col("start_offset")))
      .groupBy(col("seq_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("overlap")).as("n_tokens"),
        min(col(idCol)).as("first_doc"),
        max(col(idCol)).as("last_doc"))
      .orderBy(col("seq_id"))
}
