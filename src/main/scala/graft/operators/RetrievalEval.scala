package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.similarity.TopKAggregator

/** Offline retrieval-quality evaluation: hits\@k, MRR (micro-units),
  * DCG/IDCG and nDCG\@k for a ranker against binary relevance labels — the
  * metrics every RAG / retrieval pipeline reports before a ranker change
  * ships. Every probe term appears in the output: a term absent from the
  * corpus (or with no relevant docs) reports a zero row rather than
  * silently vanishing, so the eval covers exactly the queried set.
  *
  * Cross-engine determinism is by construction, not by float luck:
  *
  *   - the per-rank nDCG discounts `1/log2(rank+1)` are a FIXED table of
  *     ten integer micro-unit literals (`discMicros`, floor(1e6/log2(r+1)))
  *     inlined identically into the oracle SQL — DCG and IDCG are then sums
  *     of integers picked from that table, no transcendental evaluated by
  *     either engine at query time;
  *   - MRR\@k is `floor(1e6 / first_relevant_rank)` — exact integer
  *     division;
  *   - nDCG itself is the 6dp rounding of a division of two already-equal
  *     integers (the q72 exact-cents rule).
  *
  * Scale shape: the ranking is a bounded [[TopKAggregator]] per query —
  * O(k) map-side state, k·partitions rows across the exchange — never a
  * ranking window over a corpus-sized partition; relevance totals ride the
  * same (query, doc) term-frequency aggregate. The per-rank explode and the
  * metric aggregation operate on |queries|·k rows. At 100 TB the only
  * data-sized stages are the token explode (map-only, pruned to the probe
  * terms BEFORE the shuffle) and one (query, doc)-keyed partial aggregate.
  */
object RetrievalEval {

  /** floor(1e6 / log2(rank+1)) for rank = 1..10 — the shared integer
    * discount table (also inlined as literals in q164's oracle SQL).
    */
  val discMicros: Seq[Long] = Seq(1000000L, 630929L, 500000L, 430676L,
    386852L, 356207L, 333333L, 315464L, 301029L, 289064L)

  /** Per-(query term, doc) term frequencies, pruned to the probe terms
    * before the aggregate shuffle (the q98 posting-prune shape).
    */
  def termPostings(documents: DataFrame, terms: Seq[String]): DataFrame =
    documents
      .select(col("doc_id"), explode(split(trim(col("text")), " +")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))

  /** Evaluate the tf-ranking (tf desc, doc_id asc, top `k`) against binary
    * relevance `tf >= relevanceTf`: one row per probe term — zero rows for
    * terms with no postings — with
    * `(term, n_relevant, hits_at_k, first_rel_rank, mrr_micros,
    *   dcg_micros, idcg_micros, ndcg)`.
    */
  def evaluate(documents: DataFrame, terms: Seq[String], k: Int = 10,
               relevanceTf: Int = 3): DataFrame = {
    require(k <= discMicros.length, s"discount table covers k <= ${discMicros.length}")
    val spark = documents.sparkSession
    import spark.implicits._
    val postings = termPostings(documents, terms)

    // ranking: bounded top-k per term (tf desc, doc_id asc via the
    // aggregator's (score desc, id asc) order) — O(k) state per group
    val top = postings
      .groupBy(col("term"))
      .agg(TopKAggregator.topK(k)(col("doc_id"), col("tf").cast("double")).as("top"))
      .select(col("term"), posexplode(col("top")).as(Seq("pos", "hit")))
      .select(col("term"), (col("pos") + 1).as("rank"),
        col("hit.id").as("doc_id"), col("hit.score").cast("bigint").as("tf"))

    // relevance totals per term (capped at k for the IDCG prefix)
    val rel = postings.filter(col("tf") >= relevanceTf)
      .groupBy(col("term")).agg(count(lit(1)).as("n_relevant"))

    // integer discount lookup tables (rank -> disc, m -> prefix sum)
    val disc = discMicros.zipWithIndex
      .map { case (d, i) => (i + 1, d) }
      .toDF("rank", "disc_micros")
    val idcgPrefix = discMicros.scanLeft(0L)(_ + _).tail.zipWithIndex
      .map { case (s, i) => (i + 1L, s) }
      .toDF("m", "idcg_micros")

    val perHit = top.join(broadcast(disc), Seq("rank"))
      .withColumn("is_rel", (col("tf") >= relevanceTf).cast("int"))
    val agg = perHit.groupBy(col("term"))
      .agg(sum(col("is_rel").cast("bigint")).as("hits_at_k"),
        min(when(col("is_rel") === 1, col("rank"))).as("first_rel_rank"),
        sum(when(col("is_rel") === 1, col("disc_micros")).otherwise(lit(0L)))
          .as("dcg_micros"))

    // seed from the probe-term list so a term with no postings reports a
    // zero row instead of vanishing from the eval report
    val probe = terms.distinct.toDF("term")
    probe.join(agg, Seq("term"), "left")
      .join(rel, Seq("term"), "left")
      .withColumn("n_relevant", coalesce(col("n_relevant"), lit(0L)))
      .withColumn("hits_at_k", coalesce(col("hits_at_k"), lit(0L)))
      .withColumn("dcg_micros", coalesce(col("dcg_micros"), lit(0L)))
      .withColumn("m", least(col("n_relevant"), lit(k.toLong)))
      .join(broadcast(idcgPrefix), Seq("m"), "left")
      .withColumn("idcg_micros", coalesce(col("idcg_micros"), lit(0L)))
      .select(col("term"), col("n_relevant"), col("hits_at_k"),
        coalesce(col("first_rel_rank"), lit(0)).cast("int").as("first_rel_rank"),
        when(col("first_rel_rank").isNotNull,
          floor(lit(1000000L) / col("first_rel_rank")))
          .otherwise(lit(0L)).cast("bigint").as("mrr_micros"),
        col("dcg_micros"), col("idcg_micros"),
        when(col("idcg_micros") > 0,
          round(col("dcg_micros").cast("double")
            / col("idcg_micros").cast("double"), 6))
          .otherwise(lit(0.0)).as("ndcg"))
      .orderBy(col("term"))
  }
}
