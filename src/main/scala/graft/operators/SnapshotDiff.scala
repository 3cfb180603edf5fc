package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed snapshot diff — the dataset-versioning audit of a corpus build:
  * given two versions of the same keyed table, classify every key as
  * `added` / `removed` / `changed` / `unchanged` (the row-level change
  * report behind "what moved between corpus v1 and v2", the first audit a
  * data owner runs before re-training).
  *
  * Shape: ONE full-outer shuffle join on the key; both sides are
  * co-partitioned by the join key, so at 100 TB this is a single
  * hash-partitioned pass with no residual skew (keys are unique per side
  * by contract). Payload comparison happens AFTER the join on the packed
  * struct with null-safe equality, so a NULL payload field never
  * misclassifies. For wide payloads (full document text, binary media)
  * compare checksums instead: pass e.g. `xxhash64(text)` through
  * `payloadCols` — the wire then carries 8 bytes per side instead of the
  * payload, which is the 100 TB form (classification only needs equality,
  * not content).
  */
object SnapshotDiff {

  /** Per-key change classification between `v1` (old) and `v2` (new).
    *
    * Returns one row per key present in either side: the key, `status`,
    * and each of `carryCols` coalesced v2-over-v1 (so `removed` rows carry
    * their last-known attributes and everything else carries the new
    * ones). Keys must be unique within each snapshot — it is a SNAPSHOT
    * diff, not a changelog merge (use the SCD-2 / CDC operators for
    * history tables).
    */
  def diff(v1: DataFrame, v2: DataFrame, keyCol: String,
           payloadCols: Seq[String], carryCols: Seq[String] = Nil): DataFrame = {
    require(payloadCols.nonEmpty, "payloadCols must name at least one column")
    def packed(df: DataFrame, side: String) =
      df.select(
        (col(keyCol) +:
          struct(payloadCols.map(col): _*).as(s"_pay$side") +:
          lit(1).as(s"_in$side") +:
          carryCols.map(c => col(c).as(s"_c$side$c"))): _*)
    val joined = packed(v1, "1").join(packed(v2, "2"), Seq(keyCol), "full_outer")
    val status =
      when(col("_in1").isNull, lit("added"))
        .when(col("_in2").isNull, lit("removed"))
        .when(col("_pay1") <=> col("_pay2"), lit("unchanged"))
        .otherwise(lit("changed"))
    joined.select(
      (col(keyCol) +: status.as("status") +:
        carryCols.map(c => coalesce(col(s"_c2$c"), col(s"_c1$c")).as(c))): _*)
  }

  /** Roll the classification up to per-(carry, status) counts — the
    * one-screen change report. Pure partial→final agg above the diff join.
    */
  def summary(diffed: DataFrame, groupCols: Seq[String]): DataFrame =
    diffed.groupBy((groupCols :+ "status").map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
}
