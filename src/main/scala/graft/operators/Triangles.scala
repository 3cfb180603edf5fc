package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed triangle counting over an undirected simple graph.
  *
  * Input: one row per undirected edge as columns (`a`, `b`) with `a != b`;
  * duplicate rows and reversed duplicates are tolerated (normalized away).
  *
  * Algorithm: degree orientation + adjacency intersection (the
  * edge-iterator form of compact-forward). Every edge is oriented low→high
  * under the total order (degree, id); a triangle u→v, u→w, v→w is then
  * found exactly once, at its (lowest, middle) edge (u, v), as a common
  * out-neighbor w of u and v: `array_intersect(out(u), out(v))`.
  *
  * 100 TB shape, and why intersection beats the wedge self-join it
  * replaced (round-10): the naive apex join enumerates
  * sum-of-degree-squares wedges — a single celebrity vertex with 10^7
  * neighbors would emit 10^14 pairs. Orientation bounds every vertex's
  * out-degree by ~sqrt(m), so EITHER formulation is O(m^1.5) work and
  * skew-proof (hubs rank highest, so they are targets, not apexes). The
  * difference is what crosses the wire: the r9 form materialized every
  * wedge as a ROW and shuffled the wedge stream on (t1, t2) for the
  * closure probe — at sf1 that is tens of millions of 3-long rows through
  * an exchange, and it dominated the suite (sf1 median ~43 s staged, up to
  * 624 s unstaged under memory pressure). Here wedges never exist as rows:
  * ONE adjacency join shuffles an edge-sized table, and the intersection
  * runs inside the join projection.
  *
  * Round-12 probe-join shape (phase-profiled at sf1: the old probe stage
  * was 26 s of the query's 39 s):
  *   - the probe stream is `adj` itself re-exploded — edge (s, t) rows are
  *     exactly (s, out(s)) unnested — so the first adjacency join of the
  *     r10 form (re-attaching out(s) to an edge table that was DERIVED
  *     from out(s)) disappears; only the `t`-keyed join remains;
  *   - that remaining join takes a SHUFFLE_HASH hint on the vertex-sized
  *     adjacency side: sort-merge would range-sort the edge-sized stream
  *     WITH its ~0.5 KB adjacency payloads (the single hottest cost in the
  *     r10 plan); hashing the small side touches the heavy stream exactly
  *     once, in place;
  *   - adjacency lists are sorted ONCE at build (`sort_array` inside the
  *     aggregate) so the per-edge intersection is a codegen'd linear merge
  *     ([[graft.functions.SetKernels.sortedIntersect]]) instead of
  *     `array_intersect`'s per-row hash-set build.
  */
object Triangles {

  /** Per-vertex triangle participation counts: (`v`, `n_tri`). Vertices in
    * no triangle are absent. Orientation-invariant: the same set of
    * triangles exists under any acyclic orientation, so results match a
    * plain id-ordered oracle.
    *
    * The normalized edge table feeds two consumers (the degree aggregate
    * and the orientation join) and the adjacency table two (the exploded
    * probe stream and the t-keyed build side), so both are FILE-STAGED
    * eagerly ([[graft.IterState.copyOut]]: computed once, scanned by every
    * consumer from parquet) — no block-manager state ever exists, the
    * joins get the whole heap, and at cluster scale the stage is the
    * fault-tolerant form anyway (the r8 block-checkpointed variant swung
    * [49, 94] s at sf1 from GC pressure alone). Vertex ids are normalized
    * to BIGINT on entry (the sorted-merge intersection kernel is
    * long-typed), so `v` is BIGINT whatever the input id type.
    *
    * `materialize = false` returns the fully LAZY plan instead (no
    * staging, subtrees recomputed per consumer modulo exchange reuse) —
    * for plan-shape inspection and for callers that persist differently.
    */
  def perVertexCounts(edges: DataFrame, materialize: Boolean = true): DataFrame = {
    def stage(df: DataFrame): DataFrame =
      if (materialize) graft.IterState.copyOut(df) else df
    // normalized edge MULTISET (round-17; was .distinct() through round
    // 16): cross-input duplicates survive to the adjacency build, whose
    // collect_set dedups them INSIDE the aggregate — the dedicated
    // distinct() exchange of the full edge table is gone, and collect_set's
    // partial aggregation dedups map-side before the one remaining
    // edge-keyed exchange. Degrees are therefore MULTISET degrees; (deg,
    // id) is still a total order, any total order yields a valid acyclic
    // orientation, and the triangle set — hence every per-vertex count —
    // is orientation-invariant (TrianglesSpec pins duplicate/reversed-edge
    // tolerance). The ~sqrt(m) out-degree cost bound survives: multiset
    // degree majorizes distinct degree monotonically per vertex.
    val pairs = stage(edges
      .select(least(col("a"), col("b")).cast("bigint").as("a"),
        greatest(col("a"), col("b")).cast("bigint").as("b"))
      .filter(col("a") =!= col("b")))
    val deg = pairs.select(explode(array(col("a"), col("b"))).as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("d"))
    val withDeg = pairs
      .join(deg.select(col("v").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("v").as("b"), col("d").as("db")), Seq("b"))
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val orient = withDeg.select(
      when(aFirst, col("a")).otherwise(col("b")).as("s"),
      when(aFirst, col("b")).otherwise(col("a")).as("t"))
    // out-adjacency (deduped by collect_set), ASCENDING-sorted once and
    // varint-DELTA-PACKED to binary ([[graft.functions.VdeltaKernels]]):
    // ~3 B/neighbor on the wire and on disk vs Tungsten's 8 B + header —
    // the probe join below ships one such list per EDGE, so the packing
    // ratio is the exchange volume (sf10 measured the unpacked form as
    // the suite's one memory wall). Out-degree is bounded ~sqrt(m) by
    // orientation, so no list outgrows an executor.
    val adj = stage(orient.groupBy(col("s"))
      .agg(graft.functions.SetExprs.vdeltaPack(
        sort_array(collect_set(col("t")))).as("nbrs")))
    // probe each oriented edge (s, t): common out-neighbors of s and t are
    // exactly the third vertices w with s→w and t→w — one triangle each,
    // each triangle seen only at its (lowest, middle) edge. The edge
    // stream is adj re-exploded (carrying PACKED out(s) with it; the
    // unpacked array exists only inside the pre-exchange projection), so
    // only ONE join is needed: t-keyed against the vertex-sized adjacency
    // table, hash-built on that small side — the edge-sized stream is
    // never sorted and crosses the wire exactly once, packed.
    val probes = adj.select(col("s"), col("nbrs").as("nbrs_s"),
      explode(graft.functions.SetExprs.vdeltaUnpack(col("nbrs"))).as("t"))
    val closed = probes.join(
        adj.select(col("s").as("t"), col("nbrs").as("nbrs_t")).hint("shuffle_hash"),
        Seq("t"))
      .select(col("s"), col("t"),
        graft.functions.SetExprs.vdeltaIntersect(col("nbrs_s"), col("nbrs_t")).as("ws"))
      .filter(size(col("ws")) > 0)
    // one pass to per-vertex credits: s and t each join |ws| triangles,
    // every apex w joins one — no re-read of the join output per branch
    val vc: Column = struct(col("s").as("v"), size(col("ws")).cast("bigint").as("c"))
    val res = closed
      .select(explode(concat(
        array(vc, struct(col("t").as("v"), size(col("ws")).cast("bigint").as("c"))),
        transform(col("ws"), w => struct(w.as("v"), lit(1L).as("c"))))).as("e"))
      .select(col("e.v").as("v"), col("e.c").as("c"))
      .groupBy(col("v")).agg(sum(col("c")).as("n_tri"))
    if (!materialize) res else graft.IterState.copyOut(res)
  }
}
