package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Median/MAD robust outlier gate — the heavy-tail-proof companion of the
  * 3-sigma z-score gate (q84): mean and sigma are themselves dragged by the
  * outliers they are supposed to flag, while the median and the Median
  * Absolute Deviation (Hampel's rule; Leys et al. 2013 recommend
  * |x − med| > k·MAD with k ≈ 3.5/0.6745) stay put under up to 50%
  * contamination. This is the filter a pipeline runs on metrics whose
  * distribution is unknown or spiky — exactly where z-scores misfire.
  *
  * Exactness contract (what makes the gate hash-comparable cross-engine):
  * values enter as INTEGER cents and every statistic stays in exact
  * arithmetic — the median is computed over DOUBLED cents (even integers,
  * so the even-count interpolated median (a+b)/2 is itself an exact
  * integer), deviations d2 = |2c − med2| are exact integers, the MAD over
  * them is at worst a half-integer (exact in a double), and the verdict
  * compares 2·d2 > 7·mad2 — all products of exact small integers. No
  * division, no sqrt, no rounding anywhere.
  *
  * Scale shape: Spark's exact `percentile` aggregates a value→count map,
  * so its state is bounded by the DISTINCT value count — cents from a
  * bounded metric domain (here ~10^4 distinct) make it KB-state mergeable
  * like a sketch, NOT an all-values sort. Three passes over the narrow
  * (group, cents) projection: median agg, broadcast join + MAD agg,
  * broadcast join + verdict agg. For unbounded-domain metrics at 100 TB,
  * swap the exact percentile for the DDSketch quantile operator (q131) —
  * same plan shape, bounded state by construction.
  */
object RobustAnomaly {

  /** Per-group robust outlier report over an integer-valued column:
    * (group, n_events, median_x2, mad_x4, n_outliers) — the doubled
    * encodings keep every emitted statistic an exact BIGINT. An event is
    * an outlier iff |x − median| > 3.5 · MAD (2·d2 > 7·mad2 in the
    * doubled integer domain).
    */
  def madOutliers(df: DataFrame, groupCol: String, intValueCol: Column)
      : DataFrame = {
    val base = df.select(col(groupCol), intValueCol.cast("long").as("_v"))
    val med = base.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_events"),
        percentile(col("_v") * 2, lit(0.5)).as("_med2"))
    val dev = base.join(broadcast(med), Seq(groupCol))
      .withColumn("_d2", abs(col("_v") * 2 - col("_med2")))
    val mad = dev.groupBy(col(groupCol))
      .agg(percentile(col("_d2"), lit(0.5)).as("_mad2"))
    dev.join(broadcast(mad), Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(max(col("n_events")).as("n_events"),
        max(col("_med2")).cast("long").as("median_x2"),
        max(col("_mad2") * 2).cast("long").as("mad_x4"),
        sum((col("_d2") * 2 > col("_mad2") * 7).cast("long")).as("n_outliers"))
  }
}
