package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew-handling operators. AQE's runtime skew-join split is on by
  * default in our sessions; these are the STATIC forms for when the skew is
  * known ahead of time (a hot key in a 100 TB fact table) or when AQE can't
  * see it (e.g. aggregation state, not join partitions).
  */
object Skew {

  /** Salted inner equi-join: the big (skewed) side gets a uniform random
    * salt in [0, nSalts); the small side is replicated nSalts times with an
    * exploded salt column; the join key becomes (key, salt), so one hot key
    * spreads over nSalts reducers instead of one.
    *
    * Replication cost is |small| × nSalts — use for dimension-sized right
    * sides. Results are identical to a plain inner join on `key`.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 nSalts: Int = 8, seed: Long = 42L): DataFrame = {
    val salted = big.withColumn("__salt", (rand(seed) * nSalts).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase salted aggregation for skewed group keys: phase 1 aggregates
    * (key, salt) partials, phase 2 merges partials per key. For algebraic
    * aggregates Spark's map-side combine already does this implicitly; the
    * explicit form matters when per-key state is heavy (e.g. large
    * collect_set / exact distinct counts) and one reducer would hold the
    * whole hot key's state.
    */
  def saltedDistinctCount(df: DataFrame, key: String, valueCol: String,
                          nSalts: Int = 8): DataFrame =
    df
      // partition the value space: same value → same salt, so phase-1
      // distincts are disjoint and phase-2 can SUM them
      .withColumn("__salt", pmod(xxhash64(col(valueCol)), lit(nSalts)))
      .groupBy(col(key), col("__salt"))
      .agg(countDistinct(col(valueCol)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as(s"n_distinct_$valueCol"))
}
