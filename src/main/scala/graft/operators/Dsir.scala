package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection with Importance Resampling (Xie et al., "Data Selection
  * for Language Models via Importance Resampling", NeurIPS 2023) — the
  * domain-targeting selection stage of an LLM data pipeline: score every
  * raw document by how much more likely its hashed n-gram features are
  * under a TARGET distribution (a trusted high-quality slice) than under
  * the RAW corpus distribution, then keep the highest-importance documents.
  *
  * Both distributions are bag-of-hashed-unigram models with add-one
  * smoothing over `nBuckets` feature buckets; a document's importance is
  * the sum over its token occurrences of
  *
  *   ln p_target(bucket) − ln p_raw(bucket)
  *
  * quantized ONCE per bucket to integer NANOS via FLOOR(ln·1e9) — floor of
  * a double is the same on every engine (no rounding-mode subtlety), so
  * everything downstream of the two ln calls is EXACT BIGINT arithmetic
  * and the oracle replays scores integer-for-integer (the q134 recipe with
  * floor instead of half-up rounding).
  *
  * Scale shape: one token explode (the TF-IDF/BPE corpus pass), two
  * bucket-sized aggregations (`nBuckets` rows — KBs), a bucket-sized
  * broadcast join back onto per-doc term frequencies, one per-doc agg. No
  * driver materialization anywhere: the weight table stays a distributed
  * 512-row DataFrame that AQE broadcasts. At 100 TB the explode dominates,
  * exactly like every other token-level pass in the ledger.
  */
object Dsir {
  val defaultBuckets = 512

  /** Per-document importance scores in integer nanos, one row per doc that
    * has at least one token: (doc columns..., n_tokens, logw_nanos).
    *
    * `isTarget` marks the rows whose token distribution defines the
    * target; they are scored too (a target doc's score is its own
    * importance under the model, which is how DSIR calibrates).
    */
  def importanceScores(docs: DataFrame, isTarget: Column,
                       nBuckets: Int = defaultBuckets): DataFrame = {
    val b = lit(nBuckets.toLong)
    val toks = docs
      .select(col("doc_id"), col("lang"), isTarget.as("_tgt"),
        explode(split(trim(col("text")), " +")).as("token"))
      .filter(length(col("token")) > 0)
      .select(col("doc_id"), col("lang"), col("_tgt"),
        (graft.functions.KmvSketch.kmvKey(col("token")) % b).as("bucket"))
    val counts = toks.groupBy("bucket").agg(
      count(lit(1)).as("cr"),
      sum(when(col("_tgt"), 1L).otherwise(0L)).as("ct"))
    // bucket-sized (512-row) totals; windowed sum keeps it one pass
    val tot = counts.agg(sum("cr").as("nr"), sum("ct").as("nt"))
    def lnNanos(cnt: Column, n: Column): Column =
      floor(log((cnt + 1L).cast("double") / (n + b).cast("double"))
        * lit(1.0e9)).cast("long")
    val weights = counts.crossJoin(broadcast(tot))
      .select(col("bucket"),
        (lnNanos(col("ct"), col("nt")) - lnNanos(col("cr"), col("nr")))
          .as("wn"))
    val tf = toks.groupBy(col("doc_id"), col("lang"), col("bucket"))
      .agg(count(lit(1)).as("tf"))
    tf.join(broadcast(weights), Seq("bucket"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("tf")).as("n_tokens"),
        sum(col("tf") * col("wn")).as("logw_nanos"))
  }

  /** The selection report: top `n` docs by importance (ties broken by
    * doc_id — deterministic output for the gate).
    */
  def topByImportance(docs: DataFrame, isTarget: Column, n: Int,
                      nBuckets: Int = defaultBuckets): DataFrame =
    importanceScores(docs, isTarget, nBuckets)
      .orderBy(col("logw_nanos").desc, col("doc_id"))
      .limit(n)
}
