package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Deterministic two-pass exact heavy hitters: a mergeable Misra-Gries
  * summary proposes candidates, an exact recount over ONLY those candidates
  * decides — the classic distributed exact-heavy-hitter scheme, and the
  * deterministic-guarantee companion to the probabilistic CMS route (q91).
  *
  * GUARANTEE (why two passes beat one vocab-sized aggregate at 100 TB): a
  * Misra-Gries summary with `k` counters — merged across partitions per
  * Agarwal et al., "Mergeable Summaries" (PODS'12) — retains EVERY item
  * whose true frequency exceeds n/(k+1). So for a support threshold
  * phi > 1/(k+1), the candidate set provably contains all phi-heavy items;
  * pass 2 recounts candidates exactly (a ≤k-row broadcast semi-join prunes
  * the token stream BEFORE the aggregate shuffle) and the final filter
  * `cnt * denom > n * num` is exact integer arithmetic. The output — every
  * token with frequency > phi·n, with its exact count — is therefore
  * independent of partitioning, stream order, and every MG internal, which
  * is what makes it oracle-checkable: DuckDB computes the same set from a
  * plain GROUP BY.
  *
  * Scale shape: pass 1 is one global aggregate whose partial state is ≤k
  * (token, weight) pairs per partition (KB-scale on the wire); pass 2
  * aggregates only rows matching the ≤k candidates. The vocabulary-sized
  * `groupBy(token)` that a naive exact count would shuffle never happens.
  */
object HeavyHitters {

  /** `(token, cnt, n_total)` for every token with cnt·denom > n·num
    * (i.e. frequency > num/denom), exact counts, ordered by cnt desc.
    */
  def exactHeavyHitters(tokens: DataFrame, tokenCol: String, k: Int,
                        num: Long, denom: Long): DataFrame = {
    require(num * (k + 1).toLong > denom,
      s"threshold $num/$denom must exceed 1/(k+1) for the MG guarantee")
    val t = tokens.select(col(tokenCol).as("token"))
    val cands = t
      .agg(MisraGries.candidates(k)(col("token")).as("cand"))
      .select(explode(col("cand")).as("token"))
    val total = t.agg(count(lit(1)).as("n_total")) // 1-row broadcast
    t.join(broadcast(cands), Seq("token"), "left_semi")
      .groupBy(col("token"))
      .agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter(col("cnt") * lit(denom) > col("n_total") * lit(num))
      .orderBy(col("cnt").desc, col("token"))
  }
}

/** Misra-Gries frequent-items summary as a typed algebraic aggregate:
  * ≤`k` (item, weight) counters; `reduce` is the textbook increment /
  * insert / global-decrement step, `merge` the PODS'12 combine (sum
  * counters, subtract the (k+1)-th largest weight, drop non-positives) —
  * both keep the summary's deficit bound ≤ n/(k+1), so the finished
  * candidate list contains every item with true count > n/(k+1).
  * Output is the sorted candidate list (order only for determinism of the
  * array value; the caller treats it as a set).
  */
class MisraGries(k: Int)
    extends Aggregator[String, Map[String, Long], Array[String]] {
  require(k > 0, "k must be positive")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(m: Map[String, Long], x: String): Map[String, Long] =
    m.get(x) match {
      case Some(c) => m.updated(x, c + 1L)
      case None if m.size < k => m.updated(x, 1L)
      case None => // decrement every counter, dropping the exhausted ones
        m.flatMap { case (t, c) => if (c > 1L) Some(t -> (c - 1L)) else None }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val combined = b.foldLeft(a) { case (acc, (t, c)) =>
      acc.updated(t, acc.getOrElse(t, 0L) + c)
    }
    if (combined.size <= k) combined
    else {
      // (k+1)-th largest weight; entries strictly above it number <= k
      val cut = combined.valuesIterator.toArray.sorted(Ordering[Long].reverse)(k)
      combined.flatMap { case (t, c) => if (c > cut) Some(t -> (c - cut)) else None }
    }
  }

  override def finish(m: Map[String, Long]): Array[String] =
    m.keysIterator.toArray.sorted

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Array[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()
}

object MisraGries {
  /** Column form: `mg_candidates(tokenCol)` → array<string> (≤k items). */
  def candidates(k: Int)(token: Column): Column =
    udaf(new MisraGries(k)).apply(token)
}
