package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
