package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic stratified interleave — the training-order half of the
  * mixing family: given per-stratum quality rankings, emit the round-robin
  * curriculum order (best doc of every stratum first, then every second
  * best, ...) WITHOUT a global sort. The global position is a computed
  * column — `(rank_within_stratum - 1) · n_strata + stratum_index` — so
  * "write the corpus in curriculum order" is a sort BY A FORMULA at write
  * time (range-partition on the position), never a driver-side merge; two
  * docs never collide because (rank, stratum) → position is a bijection.
  *
  * Scale shape: one window per stratum for the within-stratum rank (the
  * q161 budget-select precedent; for extreme per-stratum skew swap in
  * [[DistRank.byRange]] keyed by stratum), a stratum-count-sized distinct
  * for the stratum index (broadcast back), and the preview `take` prunes
  * on rank BEFORE any ordering touches data — the final sort sees ≤take
  * rows.
  */
object Curriculum {

  /** `(pos, stratum, id, score)` for the first `take` positions of the
    * interleaved order; rank ties broken by id ascending, stratum index by
    * stratum name ascending. `pos` is 0-based.
    */
  def interleave(df: DataFrame, stratumCol: String, idCol: String,
                 scoreCol: Column, take: Int): DataFrame = {
    val ranked = df
      .select(col(stratumCol).as("stratum"), col(idCol).as("id"),
        scoreCol.as("score"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("stratum"))
          .orderBy(col("score").desc, col("id").asc)))
      .filter(col("rank") <= take) // pos >= rank-1, so rank > take can't land
    val strata = df.select(col(stratumCol).as("stratum")).distinct()
      .withColumn("stratum_idx", row_number().over(
        Window.orderBy(col("stratum"))) - 1) // stratum-count rows only
    val n = strata.agg(count(lit(1)).as("n_strata")) // 1-row broadcast
    ranked.join(broadcast(strata), Seq("stratum"))
      .crossJoin(broadcast(n))
      .withColumn("pos",
        (col("rank") - 1).cast("bigint") * col("n_strata") + col("stratum_idx"))
      .filter(col("pos") < take)
      .select(col("pos"), col("stratum"), col("id"), col("score"))
      .orderBy(col("pos"))
  }
}
