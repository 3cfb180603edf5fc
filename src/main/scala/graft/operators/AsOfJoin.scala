package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the single right row with the greatest
  * right-time <= left-time within the same key (the standard time-series
  * "latest state as of" operator; Spark has no native form).
  *
  * Per the custom-operator preference order, this COMPOSES built-ins rather
  * than dropping to a custom SparkPlan: an equi-join on the key with a range
  * predicate, then a per-left-row argmax via ranking window. Catalyst plans
  * the equi-part as a hash join (the range predicate is a post-join filter),
  * and the window sorts only within (left-row) groups.
  *
  * Scale notes: the shuffle is keyed by the join key, so co-partitioning with
  * either input's layout is preserved; for dimension-sized right sides pass
  * `broadcastRight = true` and no shuffle of the left occurs at all. Skewed
  * keys fall under AQE skew handling like any equi-join. A merge-scan
  * implementation (sorted zipPartitions) is the round-2 upgrade path if
  * range-density makes the join+filter explode.
  */
object AsOfJoin {

  /** Left columns survive; right columns arrive with `rightPrefix`.
    * Determinism: ties on right-time break by the largest `rightTieBreak`.
    */
  def asof(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTime: String, rightTime: String,
           rightTieBreak: String,
           rightPrefix: String = "asof_",
           broadcastRight: Boolean = false): DataFrame = {
    val r0 = right.columns.foldLeft(right)((d, c) => d.withColumnRenamed(c, rightPrefix + c))
    val r = if (broadcastRight) broadcast(r0) else r0
    val joined = left.join(r,
      col(leftKey) === col(rightPrefix + rightKey) &&
        col(rightPrefix + rightTime) <= col(leftTime),
      "inner")
    val leftCols = left.columns.map(col).toSeq
    val w = Window.partitionBy(leftCols: _*)
      .orderBy(col(rightPrefix + rightTime).desc, col(rightPrefix + rightTieBreak).desc)
    joined
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .drop("__rk")
  }
}
