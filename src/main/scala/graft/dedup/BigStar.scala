package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by ALTERNATING LARGE-STAR / SMALL-STAR edge
  * rewriting (Kiveris, Lattanzi, Mirrokni, Rastogi, Vassilvitskii:
  * "Connected Components in MapReduce and Beyond", SoCC 2014) — the
  * adversarial-graph companion to [[ConnectedComponents]]'s min-label
  * propagation.
  *
  * Min-label propagation needs O(component diameter) rounds: right for
  * dedup-shaped graphs (dense clusters, diameter 1-2), catastrophic for
  * long chains (a 10k-link path needs 10k rounds, each a full shuffle).
  * Star rewriting converges in O(log² n) rounds on ANY graph — measured
  * here: a 4096-vertex path closes in 7 alternations (BigStarSpec) —
  * because each round rewires edges toward component minima instead of
  * forwarding labels one hop:
  *
  *   - LARGE-STAR(u): every neighbor v > u re-attaches to
  *     m = min(N(u) ∪ u) — doubles the reach of small ids "down-hill";
  *   - SMALL-STAR(u): u and all neighbors v < u re-attach to
  *     m = min(N<(u) ∪ u) — collapses down-chains into stars.
  *
  * Both preserve connectivity and the component minimum (paper, Lemmas
  * 1-2); the fixpoint is a forest of stars rooted at component minima,
  * from which labels read off without any propagation.
  *
  * Scale shape: the edge set is kept CANONICAL (hi, lo) — each op is one
  * groupBy(min) plus one equi-join back on the SAME key (exchange-
  * shared), then a distinct; edges only ever rewire, never multiply
  * beyond the distinct (paper: edge count is non-increasing under
  * small-star and bounded under large-star). Per round the lineage is
  * truncated and the previous round's blocks released
  * ([[graft.IterState]] discipline); the result is copied out
  * file-backed — `getPersistentRDDs` is empty the moment this returns.
  * Convergence is detected by a (count, xxhash64-sum) fingerprint of the
  * canonical edge set — one 2-value aggregate per round, no edge-set
  * join.
  */
object BigStar {

  /** (id, label) for every vertex of `pairs`; label = min id reachable.
    * Self-loops and duplicate/reversed pairs are tolerated (normalized
    * away); vertices appearing only in self-loops are dropped, matching
    * [[ConnectedComponents.components]].
    *
    * Throws [[IllegalStateException]] if the alternation has not reached
    * the star-forest fixpoint within `maxIter` rounds — the label read-off
    * is only sound at the fixpoint, so non-convergence fails loudly
    * rather than returning silently wrong labels.
    */
  def components(pairs: DataFrame, src: String = "id1", dst: String = "id2",
                 maxIter: Int = 50): DataFrame =
    run(pairs, src, dst, maxIter)._1

  /** (doc_id, canonical_id) — the [[ConnectedComponents.canonicalAssignments]]
    * shape from the star algorithm.
    */
  def canonicalAssignments(pairs: DataFrame, src: String = "id1",
                           dst: String = "id2"): DataFrame =
    components(pairs, src, dst)
      .select(col("id").as("doc_id"), col("label").as("canonical_id"))

  /** One large-star pass over the canonical (hi, lo) edge set: neighbors
    * ABOVE each vertex re-attach to the minimum of its closed
    * neighborhood. Output is canonical again (the new partner is always
    * strictly below the re-attached vertex).
    */
  private[dedup] def largeStar(e: DataFrame): DataFrame = {
    val sym = e.select(col("hi").as("u"), col("lo").as("v"))
      .unionAll(e.select(col("lo").as("u"), col("hi").as("v")))
    val mins = sym.groupBy(col("u")).agg(min(col("v")).as("mn"))
    sym.join(mins, "u")
      .filter(col("v") > col("u"))
      .select(col("v").as("hi"), least(col("mn"), col("u")).as("lo"))
      .distinct()
  }

  /** One small-star pass: each vertex and its BELOW-neighbors re-attach
    * to the minimum below-neighbor. Canonical in, canonical out.
    */
  private[dedup] def smallStar(e: DataFrame): DataFrame = {
    val mins = e.groupBy(col("hi")).agg(min(col("lo")).as("mn"))
    val reattached = e.join(mins, "hi")
      .filter(col("lo") =!= col("mn"))
      .select(col("lo").as("hi"), col("mn").as("lo"))
    reattached.unionAll(mins.select(col("hi"), col("mn").as("lo")))
      .distinct()
  }

  /** (labels, alternations run). Exposed for the round-count assertions
    * in BigStarSpec — the O(log² n) claim is measured, not cited.
    */
  private[graft] def run(pairs: DataFrame, src: String, dst: String,
                         maxIter: Int): (DataFrame, Int) = {
    val norm = pairs
      .select(col(src).cast("long").as("a"), col(dst).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .select(greatest(col("a"), col("b")).as("hi"),
        least(col("a"), col("b")).as("lo"))
      .distinct()
    var (edges, releaseEdges) = graft.IterState.checkpoint(norm)

    def fingerprint(e: DataFrame): (Long, java.math.BigDecimal) = {
      val r = e.agg(count(lit(1)),
        sum(xxhash64(col("hi"), col("lo")).cast("decimal(38,0)"))).collect()(0)
      (r.getLong(0), if (r.isNullAt(1)) java.math.BigDecimal.ZERO else r.getDecimal(1))
    }
    var prev = fingerprint(edges)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val (next, releaseNext) =
        graft.IterState.checkpoint(smallStar(largeStar(edges)))
      val cur = fingerprint(next)
      converged = cur == prev
      prev = cur
      releaseEdges()
      edges = next
      releaseEdges = releaseNext
      iter += 1
    }
    // The read-off below is only sound AT the star-forest fixpoint (each
    // hi has exactly one lo); running it mid-alternation would silently
    // emit conflicting labels for chain-interior vertices. Fail loudly
    // instead — the IterState.checkpoint stance. O(log² n) measured rounds
    // mean maxIter=50 covers any realistic graph; hitting it is a bug or
    // a caller forcing maxIter below the convergence count.
    if (!converged) {
      releaseEdges()
      throw new IllegalStateException(
        s"BigStar did not converge within maxIter=$maxIter alternations; " +
          "labels at this point are not a star forest and would be silently " +
          "wrong. Raise maxIter (rounds are O(log^2 n)).")
    }
    // fixpoint is a star forest: every edge is (member, root); roots are
    // exactly the lo side and label themselves
    val labels = edges.select(col("hi").as("id"), col("lo").as("label"))
      .unionAll(edges.select(col("lo").as("id"), col("lo").as("label")).distinct())
    val out = graft.IterState.copyOut(labels)
    releaseEdges()
    (out, iter)
  }
}
