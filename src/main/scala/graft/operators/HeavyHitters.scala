package graft.operators

import scala.collection.mutable

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
  * pass 2 recounts candidates exactly and the final filter
  * `cnt * denom > n * num` is exact integer arithmetic. The output — every
  * token with frequency > phi·n, with its exact count — is therefore
  * independent of partitioning, stream order, and every MG internal, which
  * is what makes it oracle-checkable: DuckDB computes the same set from a
  * plain GROUP BY.
  *
  * Scale shape: pass 1 is ONE full scan — a global aggregate whose partial
  * state is ≤k (token, weight) pairs per partition (KB-scale on the wire)
  * with the stream length n riding the same aggregate row, so no dedicated
  * count pass. The ≤k candidates + n come back as one k-bounded driver row
  * (the sanctioned centroid-collect shape); pass 2 is the second and last
  * scan — a codegen'd `isin` set-filter on the ≤k candidate LITERALS prunes
  * the token stream before the aggregate shuffle, so no join at all. The
  * vocabulary-sized `groupBy(token)` a naive exact count would shuffle
  * never happens.
  */
object HeavyHitters {

  /** `(token, cnt, n_total)` for every token with cnt·denom > n·num
    * (i.e. frequency > num/denom), exact counts, ordered by cnt desc.
    *
    * EAGER, BY DESIGN: pass 1 (the MG candidate scan) executes via
    * `.head()` at CALL time, not when the returned DataFrame is first
    * acted on — the ≤k candidates and n_total are baked into the returned
    * plan as literals (that is what makes pass 2 a join-free codegen'd
    * `isin` filter). Two consequences a caller must know: (a) calling
    * this — or even just `.explain()`-ing the result — pays one full scan
    * of `tokens`; (b) the candidate set and n_total are FROZEN at call
    * time, so if the underlying source mutates between the call and the
    * result's execution, pass 2 filters new data against the old
    * candidates. Both are the standard two-pass contract (same freeze as
    * any collected-then-broadcast model, e.g. the k-means centroid loop).
    */
  def exactHeavyHitters(tokens: DataFrame, tokenCol: String, k: Int,
                        num: Long, denom: Long): DataFrame = {
    require(num * (k + 1).toLong > denom,
      s"threshold $num/$denom must exceed 1/(k+1) for the MG guarantee")
    val t = tokens.select(col(tokenCol).as("token"))
    // pass 1: MG candidates AND n in one scan, one k-bounded driver row
    val row = t.agg(MisraGries.candidates(k)(col("token")).as("cand"),
      count(lit(1)).as("n_total")).head()
    val cands: Seq[String] =
      Option(row.getSeq[String](0)).getOrElse(Seq.empty)
    val nTotal = row.getLong(1)
    val pruned =
      if (cands.isEmpty) t.filter(lit(false))
      else t.filter(col("token").isin(cands: _*))
    pruned
      .groupBy(col("token"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("n_total", lit(nTotal))
      .filter(col("cnt") * lit(denom) > lit(nTotal) * lit(num))
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
  *
  * The buffer is declared `collection.Map` but lives as a
  * `mutable.HashMap` between updates (ScalaAggregator keeps the buffer as
  * an object, serializing only at exchange boundaries), so the hot
  * increment path is one in-place hash update and the global-decrement
  * step mutates in place instead of reallocating the whole map — the
  * total decrement work stays amortized O(1) per input item (every unit
  * decremented was a unit previously incremented). Rows arriving from a
  * deserialized exchange are immutable maps; `mut` re-admits them once
  * per merge.
  */
class MisraGries(k: Int)
    extends Aggregator[String, collection.Map[String, Long], Array[String]] {
  require(k > 0, "k must be positive")

  private def mut(m: collection.Map[String, Long]): mutable.HashMap[String, Long] =
    m match {
      case h: mutable.HashMap[String, Long] @unchecked => h
      case other => mutable.HashMap.from(other)
    }

  override def zero: collection.Map[String, Long] =
    mutable.HashMap.empty[String, Long]

  override def reduce(m0: collection.Map[String, Long], x: String): collection.Map[String, Long] = {
    val m = mut(m0)
    m.get(x) match {
      case Some(c) => m.update(x, c + 1L); m
      case None if m.size < k => m.update(x, 1L); m
      case None => // decrement every counter in place, dropping exhausted ones
        m.filterInPlace((_, c) => c > 1L)
        m.mapValuesInPlace((_, c) => c - 1L)
        m
    }
  }

  override def merge(a0: collection.Map[String, Long], b: collection.Map[String, Long]): collection.Map[String, Long] = {
    val a = mut(a0)
    b.foreach { case (t, c) => a.update(t, a.getOrElse(t, 0L) + c) }
    if (a.size <= k) a
    else {
      // (k+1)-th largest weight; entries strictly above it number <= k
      val cut = a.valuesIterator.toArray.sorted(Ordering[Long].reverse)(k)
      a.filterInPlace((_, c) => c > cut)
      a.mapValuesInPlace((_, c) => c - cut)
      a
    }
  }

  override def finish(m: collection.Map[String, Long]): Array[String] =
    m.keysIterator.toArray.sorted

  override def bufferEncoder: Encoder[collection.Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[collection.Map[String, Long]]()
  override def outputEncoder: Encoder[Array[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()
}

object MisraGries {
  /** Column form: `mg_candidates(tokenCol)` → array<string> (≤k items). */
  def candidates(k: Int)(token: Column): Column =
    udaf(new MisraGries(k)).apply(token)
}
