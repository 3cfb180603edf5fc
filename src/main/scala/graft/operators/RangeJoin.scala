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

  /** Replication cap: an interval may explode to at most this many buckets
    * before the join fails fast (see [[bucketed]]). 4096 is far above the
    * ~2-3 of a well-chosen width and far below Spark's array-size limit.
    */
  val DefaultMaxBucketsPerInterval: Long = 4096L

  def bucketed(left: DataFrame, right: DataFrame,
               leftTime: String, rightStart: String, rightEnd: String,
               bucketSeconds: Long,
               maxBucketsPerInterval: Long = DefaultMaxBucketsPerInterval): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    require(maxBucketsPerInterval > 0, "maxBucketsPerInterval must be positive")
    require(!left.columns.contains("__bucket") && !right.columns.contains("__bucket"),
      "inputs must not already carry a __bucket column (it is used internally)")
    val bm = bucketSeconds * 1000000L // bucket width in microseconds
    val l = left.withColumn("__bucket",
      expr(s"unix_micros(`$leftTime`) div ${bm}L"))
    val startB = expr(s"unix_micros(`$rightStart`) div ${bm}L")
    val endB = expr(s"unix_micros(`$rightEnd`) div ${bm}L")
    // inverted intervals (end < start) match nothing under BETWEEN, but
    // sequence(start, end) would generate a DESCENDING bucket list for them
    // — junk rows the post-join filter has to discard. Drop them up front.
    // A pathological span/bucket ratio (width chosen orders of magnitude
    // below the interval lengths) is a silent replication bomb: fail fast
    // with the observed bucket count instead of materializing it.
    val guardedEnd = coalesce(
      when(endB - startB >= lit(maxBucketsPerInterval), raise_error(concat(
        lit(s"RangeJoin.bucketed: an interval spans "),
        (endB - startB + 1).cast("string"),
        lit(s" buckets (cap $maxBucketsPerInterval) — bucketSeconds=$bucketSeconds is far " +
          "below the interval lengths; raise it (or use bucketedAuto) or raise maxBucketsPerInterval")))),
      endB)
    val r = right.filter(col(rightEnd) >= col(rightStart))
      .withColumn("__bucket", explode(sequence(startB, guardedEnd)))
    l.join(r, Seq("__bucket"))
      .filter(col(leftTime) >= col(rightStart) && col(leftTime) <= col(rightEnd))
      .drop("__bucket")
  }

  /** [[bucketed]] with the bucket width derived from the data: the median
    * interval length (one approx-percentile pass over the right side — a
    * single-row driver action, same k-sized class as a broadcast-threshold
    * probe). Median-width buckets hold typical replication to ~2-3× no
    * matter the time unit the intervals live in; only a heavy tail past
    * `maxBucketsPerInterval × median` can still trip [[bucketed]]'s cap,
    * which is exactly when the caller should see an error instead of a
    * silent explosion.
    */
  def bucketedAuto(left: DataFrame, right: DataFrame,
                   leftTime: String, rightStart: String, rightEnd: String,
                   maxBucketsPerInterval: Long = DefaultMaxBucketsPerInterval): DataFrame = {
    val med = right.filter(col(rightEnd) >= col(rightStart))
      .select(percentile_approx(
        (expr(s"unix_micros(`$rightEnd`)") - expr(s"unix_micros(`$rightStart`)")) / lit(1000000.0),
        lit(0.5), lit(10000)).as("med"))
      .head().getAs[Any]("med")
    val medSeconds = Option(med).map(_.asInstanceOf[Double]).getOrElse(0.0)
    val bucketSeconds = math.max(1L, math.ceil(medSeconds).toLong)
    bucketed(left, right, leftTime, rightStart, rightEnd, bucketSeconds, maxBucketsPerInterval)
  }
}
