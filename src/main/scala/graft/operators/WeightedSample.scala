package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.similarity.TopKAggregator

/** Deterministic weighted sampling without replacement — the
  * quality-weighted cousin of [[Mixing]] (rates) and the q88 stratified
  * take (uniform exact-k): pick exactly k docs per stratum with inclusion
  * probability increasing in a per-row weight, reproducibly.
  *
  * Uses the Efraimidis–Spirakis A-ES scheme: each row gets key u^(1/w)
  * (u uniform in (0,1], w its weight) and the k largest keys per stratum
  * are the sample. Instead of an RNG, u is the Knuth multiplicative hash
  * of the row id ([[Mixing.knuthHash]], bijective mod 2^32) scaled by
  * 2^-32 — exact dyadic arithmetic, same rows on every run and engine.
  *
  * Weights are restricted to {1, 2, 4} so u^(1/w) is computed as sqrt
  * chains: sqrt is IEEE-754 correctly rounded (bit-identical on every
  * engine), whereas pow/ln are libm-dependent and can differ in the last
  * ulp — the difference between a hash-exact oracle gate and a flaky one.
  * {1,2,4} covers the common keep/prefer/strongly-prefer quality tiering;
  * arbitrary weights would need the pow route plus rounding tolerance.
  *
  * Scale shape: the key is a narrow per-row expression (no shuffle), and
  * the per-stratum take rides the bounded top-k AGGREGATE (O(k) map-side
  * state, partial-aggregated before the exchange) — not a ranking window
  * that would sort whole language partitions; identical shape to q88.
  */
object WeightedSample {

  /** A-ES key u^(1/w) for weight ∈ {1, 2, 4}; other values fall back to
    * weight 1. Larger key = more likely sampled.
    */
  def aresKey(id: Column, weight: Column): Column = {
    val u = (Mixing.knuthHash(id) + lit(1L)).cast("double") / lit(Mixing.M.toDouble)
    when(weight === 4, sqrt(sqrt(u)))
      .when(weight === 2, sqrt(u))
      .otherwise(u)
  }

  /** Exactly `k` rows per stratum (fewer if the stratum is smaller),
    * weighted by `weightCol` ∈ {1,2,4}; emits (idCol, strataCol, rank,
    * score) ordered by (stratum, rank). Ties (possible only past 2^32 ids,
    * where the hash aliases) break by ascending id on every engine.
    */
  def topKPerStratum(df: DataFrame, strataCol: String, weightCol: Column,
                     k: Int, idCol: String = "doc_id"): DataFrame =
    df.select(col(idCol), col(strataCol),
        aresKey(col(idCol), weightCol).as("score"))
      .groupBy(col(strataCol))
      .agg(TopKAggregator.topK(k)(col(idCol), col("score")).as("top"))
      .select(col(strataCol), posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("s.id").as(idCol), col(strataCol),
        (col("pos") + 1).cast("int").as("rank"), col("s.score").as("score"))
      .orderBy(col(strataCol), col("rank"))
}
