package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join WITHOUT an equi-key: left rows at time t joined to
  * right intervals with t in [start, end] (inclusive, SQL BETWEEN
  * semantics). Spark has no native form — a plain theta join plans as
  * BroadcastNestedLoopJoin (or a cartesian), which is O(|L|·|R|) predicate
  * evaluations and fatal at scale.
  *
  * Bucketed form: discretize time into fixed-width buckets, explode each
  * interval to every bucket it spans, tag each left row with its single
  * bucket, and EQUI-join on the bucket before applying the range predicate.
  * Each qualifying (row, interval) pair meets in exactly ONE bucket — the
  * row's own — so the join produces no duplicates and needs no dedup.
  *
  * Scale notes: cost is one hash-keyed equi-join; the right side is
  * replicated by ceil(interval_length / bucket) + 1, so pick the bucket
  * width near the median interval length to keep replication ~2x. Skewed
  * buckets (every row in one time window) fall under the same AQE
  * skew-join remedies as any hot equi-key.
  */
object RangeJoin {

  def bucketed(left: DataFrame, right: DataFrame,
               leftTime: String, rightStart: String, rightEnd: String,
               bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    require(!left.columns.contains("__bucket") && !right.columns.contains("__bucket"),
      "inputs must not already carry a __bucket column (it is used internally)")
    val bm = bucketSeconds * 1000000L // bucket width in microseconds
    val l = left.withColumn("__bucket",
      expr(s"unix_micros(`$leftTime`) div ${bm}L"))
    val r = right.withColumn("__bucket", explode(sequence(
      expr(s"unix_micros(`$rightStart`) div ${bm}L"),
      expr(s"unix_micros(`$rightEnd`) div ${bm}L"))))
    l.join(r, Seq("__bucket"))
      .filter(col(leftTime) >= col(rightStart) && col(leftTime) <= col(rightEnd))
      .drop("__bucket")
  }
}
