package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shuffle-key skew profiler — the measurement that DECIDES the
  * salting/AQE-skew-join question before a 100 TB join runs: given a
  * prospective key column, report the exact shape of its per-key count
  * distribution (max, median, p99, top-1/top-k mass shares, max/median
  * ratio). A key with skew_x100 in the tens is safe to hash-partition; a
  * key whose top-1 share approaches a whole partition's capacity needs
  * salting or an AQE skew split — this operator turns that judgment into
  * integers.
  *
  * Exactness: every statistic is an integer fact (counts, floor-ppm
  * shares, floor-scaled ratios), so the oracle replays it bit for bit.
  * The percentile definition is the classic inverse CDF over KEYS
  * (smallest count c with #{keys: cnt ≤ c} ≥ ceil(p·n_keys/100)).
  *
  * Scale shape: one key-keyed count aggregate (the vocabulary-sized table
  * any distinct/groupBy would build anyway — partial aggregation collapses
  * repeats map-side), then everything downstream runs on the
  * COUNT-OF-COUNTS table, which has at most ~sqrt(2n) rows for n input
  * rows (distinct frequencies f₁<f₂<… with Σ#keysᵢ·fᵢ = n bound it), so
  * the cumulative window that computes the percentiles sorts a provably
  * tiny table; the top-k mass comes from a TakeOrdered over the key-count
  * table, never a global sort. Output is ONE row regardless of input size.
  */
object SkewProfile {

  /** One-row profile of `keyCol`'s count distribution:
    * `(n_rows, n_keys, max_cnt, p50_cnt, p99_cnt, top1_ppm, topk_ppm,
    *   skew_x100)` where topX_ppm = floor(1e6 · mass of X heaviest keys /
    * n_rows) and skew_x100 = floor(100 · max_cnt / p50_cnt).
    */
  def profile(df: DataFrame, keyCol: String, k: Int = 10): DataFrame = {
    require(k >= 1, "k must be positive")
    val counts = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("cnt"))
    // count-of-counts: at most ~sqrt(2n) rows — the percentile substrate
    val spectrum = counts.groupBy(col("cnt")).agg(count(lit(1)).as("nk"))
    val cum = spectrum.withColumn("ckeys",
      sum(col("nk")).over(Window.orderBy(col("cnt"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val totals = counts.agg(sum(col("cnt")).as("n_rows"),
      count(lit(1)).as("n_keys"), max(col("cnt")).as("max_cnt"))
    val pcts = cum.crossJoin(broadcast(totals))
      .agg(
        min(when(col("ckeys") * 100 >= col("n_keys") * 50, col("cnt")))
          .as("p50_cnt"),
        min(when(col("ckeys") * 100 >= col("n_keys") * 99, col("cnt")))
          .as("p99_cnt"))
    val topMass = counts.orderBy(col("cnt").desc, col("key")).limit(k)
      .agg(sum(col("cnt")).as("topk_mass"), max(col("cnt")).as("top1_mass"))
    // DIV: exact integer floor division on both engines — no float anywhere
    totals.crossJoin(broadcast(pcts)).crossJoin(broadcast(topMass))
      .selectExpr("n_rows", "n_keys", "max_cnt", "p50_cnt", "p99_cnt",
        "CAST(top1_mass * 1000000 DIV n_rows AS BIGINT) AS top1_ppm",
        "CAST(topk_mass * 1000000 DIV n_rows AS BIGINT) AS topk_ppm",
        "CAST(max_cnt * 100 DIV p50_cnt AS BIGINT) AS skew_x100")
  }
}
