package graft.dedup

import graft.functions.HashExprs
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SimHash near-duplicate detection: 64-bit locality-sensitive token hash +
  * pigeonhole blocking on 16-bit chunks + Hamming-distance verification.
  *
  * Pigeonhole guarantee: two signatures within Hamming distance 3 must agree
  * exactly on at least one of the four 16-bit chunks, so blocking on chunks
  * finds ALL pairs with distance <= 3 (and, probabilistically, most slightly
  * farther ones). One explode (×4), one hash-keyed shuffle, no cartesian —
  * the same scale shape as MinHash banding.
  */
object SimHashDedup {

  /** (id, sim) signatures via the codegen'd [[graft.functions.SimHashExpr]]. */
  def signatures(documents: DataFrame, textCol: String = "text",
                 idCol: String = "doc_id"): DataFrame =
    documents.select(col(idCol).as("id"),
      HashExprs.simhash64(col(textCol)).as("sim"))

  /** Candidate pairs agreeing on >= 1 of 4 16-bit chunks. */
  def candidatePairs(sigs: DataFrame, maxBucketSize: Int = 256): DataFrame = {
    val chunked = sigs.select(col("id"), col("sim"),
      explode(array((0 until 4).map { c =>
        struct(lit(c).as("chunk"),
          shiftright(col("sim"), c * 16).bitwiseAND(lit(0xffffL)).as("ch"))
      }: _*)).as("b"))
      .select(col("id"), col("sim"), col("b.chunk").as("chunk"), col("b.ch").as("ch"))
    // bucket cap via groupBy().count() + semi-join (no per-bucket SORT; the
    // (chunk, ch) exchange is shared with the pair join via ReusedExchange)
    val smallBuckets = chunked.groupBy(col("chunk"), col("ch"))
      .agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n") <= maxBucketSize)
      .select(col("chunk"), col("ch"))
    val capped = chunked.join(smallBuckets, Seq("chunk", "ch"), "left_semi")
    val l = capped.select(col("chunk"), col("ch"), col("id").as("id1"), col("sim").as("sim1"))
    val r = capped.select(col("chunk"), col("ch"), col("id").as("id2"), col("sim").as("sim2"))
    l.join(r, Seq("chunk", "ch"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"), col("sim1"), col("sim2"))
      .distinct()
  }

  /** Pairs within the given Hamming distance (bit_count of XOR).
    *
    * Deliberately NOT staged (round-17 A/B): the simhash64 kernel is one
    * pass over the text and the per-branch recompute measured CHEAPER
    * than a copyOut round-trip at every scale tried (q71 sf1 1.26 s lazy
    * vs 2.19 s staged; q23 1.76 vs 2.32) — the MinHash/Cosine staging
    * rationale does not transfer to a kernel this light.
    */
  def nearDuplicates(documents: DataFrame, maxHamming: Int = 3,
                     textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val sigs = signatures(documents, textCol, idCol)
    candidatePairs(sigs)
      .withColumn("hamming", bit_count(col("sim1").bitwiseXOR(col("sim2"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id1"), col("id2"), col("hamming"))
      .orderBy(col("id1"), col("id2"))
  }
}
