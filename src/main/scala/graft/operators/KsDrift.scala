package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Two-sample Kolmogorov-Smirnov drift statistic over BUCKETED empirical
  * CDFs — the continuous-distribution companion to the categorical KL
  * drift (q125): "has the value distribution of slice B drifted from
  * slice A?" is the standard data-quality gate between corpus snapshots.
  *
  * Exactness discipline: values are quantized to integer cents and
  * bucketed by integer division, so the bucket index needs NO float
  * transcendentals (a log-bucket variant would hinge on cross-engine
  * `ln` ulps at edge values). Both CDFs are step functions changing only
  * at bucket points, so the KS sup over the bucketed distributions equals
  * the max over the bucket union — and it is computed as the INTEGER
  * maximum of |ca*nb - cb*na| in wide DECIMALs (exact to 10^36), divided
  * once at the end. Bit-identical on any engine, any row order.
  *
  * Scale shape: one (side, bucket) partial-aggregated count — the only
  * data-sized pass — then a full-outer bucket join and a cumulative
  * window over the bucket table, which is METADATA-sized (bounded by the
  * value range / bucket width, not by rows; the unpartitioned window is
  * deliberate and k-sized, the q131 sketch-row precedent).
  */
object KsDrift {

  /** Integer bucket of a non-negative value: floor(cents / centsPerBucket).
    * `/` on longs is FLOAT division in both engines (non-ANSI Spark and
    * DuckDB alike), so the floor form is the one that reads identically on
    * both sides; it is exact because the true quotient is never within
    * 1/centsPerBucket of the next integer unless it IS one (callers with
    * signed values must shift first — floor vs truncate diverge below 0).
    */
  def bucketOf(value: Column, centsPerBucket: Int): Column =
    floor(round(value * 100).cast("long") / lit(centsPerBucket.toLong)).cast("long")

  /** The (bucket, ca, cb) count table — the ONLY data-sized pass: a plain
    * partial-aggregated groupBy, output bounded by the value range /
    * bucket width.
    */
  def bucketCounts(df: DataFrame, sideCol: String, sideA: String,
                   sideB: String, valueCol: String,
                   centsPerBucket: Int): DataFrame =
    df.filter(col(sideCol) === sideA || col(sideCol) === sideB)
      .groupBy(bucketOf(col(valueCol), centsPerBucket).as("bucket"))
      .agg(
        sum(when(col(sideCol) === sideA, 1L).otherwise(0L)).as("ca"),
        sum(when(col(sideCol) === sideB, 1L).otherwise(0L)).as("cb"))

  /** KS statistic between the `valueCol` distributions of two slices of
    * `df` selected by `sideCol` ∈ {sideA, sideB}. One output row:
    * (n_a, n_b, ks_at_bucket, ks) where ks_at_bucket is the smallest
    * bucket attaining the max (deterministic tie-break) and ks is the
    * max CDF gap as a double.
    */
  def ks(df: DataFrame, sideCol: String, sideA: String, sideB: String,
         valueCol: String, centsPerBucket: Int): DataFrame = {
    // the bucket table is referenced by the window AND the totals — stage
    // it file-backed (IterState.copyOut) so the raw data is scanned ONCE,
    // not re-aggregated per reference, and nothing stays pinned in the
    // block manager after the call (the r7 localCheckpoint here leaked)
    val counts = graft.IterState.copyOut(
      bucketCounts(df, sideCol, sideA, sideB, valueCol, centsPerBucket))
    // cumulative counts up the bucket ladder: window over the
    // metadata-sized bucket table (value range / width rows, not data);
    // the single-partition window is deliberate and k-sized
    val w = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = counts
      .withColumn("cum_a", sum(col("ca")).over(w))
      .withColumn("cum_b", sum(col("cb")).over(w))
    val tot = counts.agg(sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"))
    // |F_a - F_b| at each bucket as the exact integer |ca*nb - cb*na|
    val gap = abs(col("cum_a").cast("decimal(18,0)") * col("n_b").cast("decimal(18,0)")
      - col("cum_b").cast("decimal(18,0)") * col("n_a").cast("decimal(18,0)"))
    // ONE aggregate finds the max gap AND its smallest bucket: struct
    // ordering compares gap first, then -bucket (largest -bucket = the
    // smallest bucket among the tied maxima)
    cum.crossJoin(broadcast(tot))
      .withColumn("gap", gap)
      .agg(
        max(struct(col("gap"), (-col("bucket")).as("negb"))).as("m"),
        max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"))
      .select(col("n_a"), col("n_b"),
        (-col("m.negb")).as("ks_at_bucket"),
        round(col("m.gap").cast("double") /
          (col("n_a").cast("double") * col("n_b").cast("double")), 9).as("ks"))
  }
}
