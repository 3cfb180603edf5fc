package graft.similarity

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k aggregate: keeps the k highest-scoring (id, score) pairs
  * per group with O(k) state (SURVEY §7.3 — the one genuinely custom
  * aggregate on the roadmap).
  *
  * Scale rationale: the window-function top-k (`row_number over partitionBy
  * query`) shuffles EVERY scored row to the query's partition and sorts
  * |corpus| rows per query. This aggregate is algebraic — partial buffers of
  * at most k pairs combine associatively — so the map side reduces each
  * partition to k rows before the exchange: the shuffle payload drops from
  * O(|Q|·N) to O(|Q|·k·P). At 100 TB that is the difference between a
  * terabyte-scale sort and kilobytes on the wire.
  */
final case class ScoredId(id: Long, score: Double)

class TopKAggregator(k: Int)
    extends Aggregator[ScoredId, List[ScoredId], Array[ScoredId]] {

  require(k > 0, "k must be positive")

  /** Buffers are kept sorted descending by (score, then id ascending for
    * determinism) and truncated to k — insertion is O(k) which is fine for
    * the small k of a top-k query.
    */
  private def insert(buf: List[ScoredId], x: ScoredId): List[ScoredId] = {
    if (buf.length >= k && !better(x, buf.last)) buf
    else {
      val (before, after) = buf.span(b => better(b, x))
      (before ::: (x :: after)).take(k)
    }
  }

  private def better(a: ScoredId, b: ScoredId): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  override def zero: List[ScoredId] = Nil
  override def reduce(buf: List[ScoredId], x: ScoredId): List[ScoredId] = insert(buf, x)
  override def merge(a: List[ScoredId], b: List[ScoredId]): List[ScoredId] =
    b.foldLeft(a)(insert)
  override def finish(buf: List[ScoredId]): Array[ScoredId] = buf.toArray
  override def bufferEncoder: Encoder[List[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[ScoredId]]()
  override def outputEncoder: Encoder[Array[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[ScoredId]]()
}

object TopKAggregator {
  /** Column form: `top_k(idCol, scoreCol)` → array<struct<id,score>>. */
  def topK(k: Int)(id: Column, score: Column): Column =
    udaf(new TopKAggregator(k)).apply(id, score)
}
