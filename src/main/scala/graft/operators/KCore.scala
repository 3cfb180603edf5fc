package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** K-core peeling over an undirected edge table — the classic dense-subgraph
  * extraction (Seidman 1983): iteratively delete vertices of degree < k until
  * the survivors all have induced degree >= k. The k-core is the canonical
  * "strip the long tail, keep the interaction core" primitive for
  * recommendation graphs and spam/bot subgraph mining.
  *
  * Shape per round (the same Pregel-as-joins discipline as
  * [[graft.operators.PageRank]]): ONE degree aggregation (explode both
  * endpoints, groupBy vertex) + TWO semi-joins filtering the edge table to
  * surviving endpoints — all equi-key exchanges, no windows, no collects.
  * The edge table SHRINKS monotonically round over round, so later rounds
  * cost less than earlier ones; [[graft.IterState.checkpoint]] after each
  * round cuts the exponentially deepening lineage exactly as PageRank does,
  * and the previous round's blocks are released the moment the next round
  * is materialized — at most two edge tables are ever pinned, and none
  * remain after return (the trace itself is driver-built and k-sized). At
  * cluster scale: `checkpoint` to the fault-tolerant store instead — a
  * lost executor would otherwise replay the whole peel chain.
  *
  * Rounds are FIXED (caller-chosen), and per-round survivor counts are the
  * output — a deterministic, term-for-term-oracleable trace of the peeling
  * dynamics (the q105 PageRank pattern). `converged` marks rounds whose edge
  * set already equals the previous round's, so a trace that stabilizes
  * early is visible in the result rather than silently truncated.
  */
object KCore {

  /** Per-round peeling trace: (round, n_vertices, n_edges, converged).
    *
    * `edges` must be undirected-deduplicated: one row per edge with
    * columns `a` < `b`. `n_vertices` counts vertices of induced degree >= k
    * at the START of the round (the survivors the round keeps); `n_edges`
    * counts edges with BOTH endpoints surviving — the input to the next
    * round. `converged` is true when the round deleted nothing (fixpoint).
    */
  def peelRounds(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val spark = edges.sparkSession
    import spark.implicits._

    var (e, releaseE) = graft.IterState.checkpoint(
      edges.select(col("a").cast("long").as("a"),
        col("b").cast("long").as("b")))
    var prevEdges = e.count()
    val trace = Seq.newBuilder[(Int, Long, Long, Boolean)]
    var r = 1
    while (r <= rounds) {
      val deg = e.select(col("a").as("v"))
        .unionAll(e.select(col("b").as("v")))
        .groupBy(col("v")).agg(count(lit(1)).as("deg"))
      // checkpoint the (vertex-sized) survivor set so the degree agg runs
      // ONCE per round: nv counts the materialized blocks, and both
      // semi-joins read them instead of re-running the agg — previously
      // keep.count() re-aggregated the whole edge table a second time
      val (keep, releaseKeep) = graft.IterState.checkpoint(
        deg.filter(col("deg") >= k).select(col("v")))
      val nv = keep.count()
      val (e2, releaseE2) = graft.IterState.checkpoint(e
        .join(keep.withColumnRenamed("v", "a"), Seq("a"), "left_semi")
        .join(keep.withColumnRenamed("v", "b"), Seq("b"), "left_semi")
        .select(col("a"), col("b")))
      releaseKeep() // e2 is materialized; the survivor set is spent
      val ne = e2.count()
      trace += ((r, nv, ne, ne == prevEdges))
      prevEdges = ne
      releaseE()
      e = e2
      releaseE = releaseE2
      r += 1
    }
    releaseE() // the trace is driver-side; no round state survives the call
    trace.result()
      .toDF("round", "n_vertices", "n_edges", "converged")
      .orderBy(col("round"))
  }
}
