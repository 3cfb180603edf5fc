package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion (Cormack, Clarke, Büttcher: "Reciprocal Rank
  * Fusion outperforms Condorcet and individual Rank Learning Methods",
  * SIGIR 2009) — the standard score-free combiner for hybrid retrieval
  * (BM25 + dense ANN, the RAG-stack shape): each input ranking
  * contributes 1/(k + rank) for every (query, doc) it lists, summed
  * across rankings; k=60 per the paper.
  *
  * Exactness discipline (the q98 rule): contributions are EXACT INTEGER
  * micro-units — `1e6 div (k + rank)` — so the cross-list sum is
  * order-independent integer arithmetic and a SQL oracle replays it
  * bit-for-bit; no float ever decides an order. Ties break by doc id.
  *
  * Scale shape: inputs are already top-N-bounded per query (each ranking
  * carries at most its own N rows per query), so the union, the fused
  * aggregate and the final ranking window all run over k-BOUNDED
  * per-query groups — metadata-sized regardless of corpus size. The
  * expensive work (scoring the corpus) happens upstream in the
  * individual rankers, which keep their own scale shapes.
  */
object Rrf {

  /** Fuse bounded rankings (columns `queryCol`, `idCol`, `rankCol`; rank
    * 1-based) into (query, doc, rrf_micros, n_lists, rank) — top `topN`
    * per query by fused score, ties by doc id.
    */
  def fuse(rankings: Seq[DataFrame], queryCol: String = "query_id",
           idCol: String = "doc_id", rankCol: String = "rank",
           k: Int = 60, topN: Int = 10): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    val tagged = rankings.map(_.select(
      col(queryCol).cast("long").as("query_id"),
      col(idCol).cast("long").as("doc_id"),
      expr(s"1000000L div (${k}L + CAST($rankCol AS BIGINT))").as("contrib")))
    val fused = tagged.reduce(_ unionAll _)
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("contrib")).as("rrf_micros"), count(lit(1)).as("n_lists"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_micros").desc, col("doc_id"))
    fused.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= topN)
  }
}
