package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting over an undirected simple graph.
  *
  * Input: one row per undirected edge as columns (`a`, `b`) with `a != b`;
  * duplicate rows and reversed duplicates are tolerated (normalized away).
  *
  * Algorithm: compact-forward / degree orientation. Every edge is oriented
  * low→high under the total order (degree, id); wedges are enumerated only
  * at their LOWEST-ranked vertex, and a wedge (u; v, w) closes iff the
  * oriented edge v→w exists. Each triangle is found exactly once — at its
  * minimum-(degree, id) vertex.
  *
  * 100 TB shape: the naive apex join enumerates sum-of-degree-squares
  * wedges — a single celebrity vertex with 10^7 neighbors would emit 10^14
  * pairs. Orientation bounds every vertex's out-degree by ~sqrt(m), so the
  * wedge join is O(m^1.5) worst case and skew-proof: hubs have high degree,
  * therefore rank HIGHEST, therefore enumerate no wedges at all. All three
  * joins (two degree attachments, one closure) are equi-joins on vertex
  * ids; nothing is ever broadcast except what AQE chooses to.
  */
object Triangles {

  /** Per-vertex triangle participation counts: (`v`, `n_tri`). Vertices in
    * no triangle are absent. Orientation-invariant: the same set of
    * triangles exists under any acyclic orientation, so results match a
    * plain id-ordered oracle.
    *
    * The oriented edge table feeds THREE consumers (both wedge-join sides
    * and the closure join). The wedge sides share an exchange on `s`, but
    * the closure join repartitions on (t1, t2) — a different key — so
    * without materialization the whole orient subtree (scan + two degree
    * joins) recomputes for it, and under memory pressure the r7 bench saw
    * q123 swing 37–624 s at sf1 on identical plans. The orient table is
    * therefore FILE-STAGED eagerly ([[graft.IterState.copyOut]]: computed
    * once, scanned three times from parquet) and the vertex-sized result
    * is copied out the same way — no block-manager state ever exists, so
    * the wedge join gets the whole heap (the r8 block-checkpointed form
    * still swung [49, 94] s at sf1 from GC pressure alone).
    *
    * `materialize = false` returns the fully LAZY plan instead (no
    * staging, orient recomputed per consumer modulo exchange reuse) —
    * for plan-shape inspection and for callers that persist differently.
    */
  def perVertexCounts(edges: DataFrame, materialize: Boolean = true): DataFrame = {
    val pairs = edges
      .select(least(col("a"), col("b")).as("a"), greatest(col("a"), col("b")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val deg = pairs.select(explode(array(col("a"), col("b"))).as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("d"))
    val withDeg = pairs
      .join(deg.select(col("v").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("v").as("b"), col("d").as("db")), Seq("b"))
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val orientPlan = withDeg.select(
      when(aFirst, col("a")).otherwise(col("b")).as("s"),
      when(aFirst, col("b")).otherwise(col("a")).as("t"),
      when(aFirst, col("db")).otherwise(col("da")).as("dt"))
    // file-staged rather than block-manager-checkpointed: the wedge join
    // below is the heap-hungriest stage in the suite (18.8M triangles at
    // sf1), and holding an edge-sized block table in memory through it is
    // pure GC pressure — r8 measured a [49, 94] s sf1 spread with the
    // blocks pinned. A parquet stage costs a fixed disk hop, is read
    // cheaply by all three consumers, and leaves the whole heap to the
    // join (and at cluster scale it is the fault-tolerant form anyway).
    val orient =
      if (materialize) graft.IterState.copyOut(orientPlan)
      else orientPlan
    // wedge (s; t1, t2) with (dt1, t1) < (dt2, t2); the closing edge is
    // then oriented t1→t2 under the same total order
    val wedges = orient.as("e1").join(orient.as("e2"),
        col("e1.s") === col("e2.s") &&
          (col("e1.dt") < col("e2.dt") ||
            (col("e1.dt") === col("e2.dt") && col("e1.t") < col("e2.t"))))
      .select(col("e1.s").as("u"), col("e1.t").as("t1"), col("e2.t").as("t2"))
    val tris = wedges.join(orient.select(col("s").as("t1"), col("t").as("t2")),
      Seq("t1", "t2"))
    val res = tris.select(explode(array(col("u"), col("t1"), col("t2"))).as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("n_tri"))
    if (!materialize) res else graft.IterState.copyOut(res)
  }
}
