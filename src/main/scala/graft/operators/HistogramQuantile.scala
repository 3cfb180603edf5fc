package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Mergeable RELATIONAL quantile sketch: a log-bucketed histogram kept as
  * plain (group, bucket, count) rows — the storable, re-aggregatable
  * companion to `percentile_approx` (whose sketch lives only inside one
  * aggregation and cannot be persisted or re-merged afterwards).
  *
  * Bucketing: positive value v lands in bucket floor(ln v / ln(1+eps)), so
  * bucket boundaries grow geometrically and ANY value in a bucket is within
  * a factor (1+eps) of the bucket's upper edge — a guaranteed RELATIVE
  * error bound of eps on any quantile estimated from the histogram,
  * independent of the data distribution (the DDSketch construction, Masson
  * et al., VLDB 2019). At eps = 1% a 9-decade value range needs ~2100
  * buckets, so a per-group sketch is a few KB of rows.
  *
  * Why rows and not a binary blob: histogram merge is plain
  * `groupBy(bucket).sum(cnt)` — Catalyst partial-aggregates it map-side,
  * AQE re-plans it freely, and stored daily sketches roll up to any
  * window with a k-sized aggregation that never revisits raw data (the
  * same stored-sketch discipline as [[graft.functions.HyperLogLog]]
  * columns). Quantile extraction is a cumulative sum over the ~2k bucket
  * rows of each group — a window over METADATA-sized partitions, not data.
  */
object HistogramQuantile {

  /** Log-bucket index of a positive value; eps is the relative error. */
  def bucketOf(v: Column, eps: Double): Column =
    floor(log(v) / math.log1p(eps)).cast("int")

  /** Upper edge (1+eps)^(bucket+1) — the estimate returned for any quantile
    * that lands in the bucket; true value is in ((1+eps)^b, (1+eps)^(b+1)],
    * so estimate/true is within [1, 1+eps) up to float jitter at the edges.
    */
  def bucketUpper(bucket: Column, eps: Double): Column =
    exp((bucket.cast("double") + 1.0) * math.log1p(eps))

  /** One histogram row per (groupCols..., bucket): the storable sketch.
    * `value` must be strictly positive (log bucketing) — enforced row-wise:
    * a non-positive value would make `log` NULL, land every such row in a
    * NULL bucket that still counts toward `n` and sorts FIRST up the
    * cumulative ladder, silently skewing every quantile. `raise_error`
    * fails the job at the offending row instead.
    */
  def sketch(df: DataFrame, groupCols: Seq[String], value: Column,
             eps: Double): DataFrame = {
    val guarded = when(value > 0, bucketOf(value, eps))
      .otherwise(raise_error(concat(
        lit("HistogramQuantile.sketch requires value > 0 (log bucketing); got "),
        value.cast("string"))))
    df.groupBy((groupCols.map(col) :+ guarded.as("bucket")): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Quantile estimates from (already merged) histogram rows
    * (`groupCol`, `bucket`, `cnt`): for each probability p, the estimate
    * for the value at rank ceil(p * n) — the lower-rank-nearest
    * definition, matching `element_at(array_sort(xs), ceil(p*n))` on the
    * raw data. Output: one row per group with `n` and an `est_pXX`
    * column per requested p.
    */
  def quantiles(hist: DataFrame, groupCol: String, eps: Double,
                ps: Seq[Double]): DataFrame = {
    val byBucket = Window.partitionBy(col(groupCol)).orderBy(col("bucket"))
    // cumulative count up the bucket ladder; partitions are bucket-count
    // sized (~2k rows), never data-sized
    val cum = hist
      .withColumn("cum", sum(col("cnt")).over(
        byBucket.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy(col(groupCol))))
    val estimates = ps.map { p =>
      val rank = ceil(lit(p) * col("n"))
      // the first bucket whose cumulative count reaches the rank holds the
      // p-quantile; min() selects it without a second window pass
      min(when(col("cum") >= rank, bucketUpper(col("bucket"), eps)))
        .as(f"est_p${math.round(p * 100)}%02d")
    }
    cum.groupBy(col(groupCol))
      .agg(max(col("n")).as("n"), estimates: _*)
  }
}
