package graft.operators

import graft.SparkSpec

/** Truth tables for k-core peeling: fixpoints, cascades, and the trace
  * semantics (per-round survivor counts + convergence marks) the q132
  * oracle replays term for term.
  */
class KCoreSpec extends SparkSpec {
  import spark.implicits._

  private def trace(edges: Seq[(Long, Long)], k: Int, rounds: Int)
      : Seq[(Int, Long, Long, Boolean)] =
    KCore.peelRounds(edges.toDF("a", "b"), k, rounds)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSeq

  test("K4 is its own 3-core: round 1 deletes nothing and converges") {
    val k4 = for { i <- 0L to 3L; j <- (i + 1) to 3L } yield (i, j)
    assert(trace(k4, k = 3, rounds = 2) ==
      Seq((1, 4L, 6L, true), (2, 4L, 6L, true)))
  }

  test("a star has no 2-core: one round empties it") {
    val star = (1L to 5L).map(i => (0L, i))
    val t = trace(star, k = 2, rounds = 2)
    // round 1: only the hub has degree >= 2, but no edge has BOTH
    // endpoints surviving, so the edge set empties; round 2 is a
    // converged empty fixpoint
    assert(t == Seq((1, 1L, 0L, false), (2, 0L, 0L, true)))
  }

  test("caterpillar tail peels one vertex per round (cascade)") {
    // triangle 1-2-3 with chain 3-4, 4-5, 5-6; k=2: each round removes
    // only the current chain END (degree 1), so convergence takes one
    // round per tail vertex — the multi-round dynamic q132 exercises
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    val t = trace(g, k = 2, rounds = 5)
    assert(t == Seq(
      (1, 5L, 5L, false),   // 6 dropped (deg 1); edge 5-6 gone
      (2, 4L, 4L, false),   // 5 dropped
      (3, 3L, 3L, false),   // 4 dropped; triangle remains
      (4, 3L, 3L, true),    // fixpoint: the triangle is the 2-core
      (5, 3L, 3L, true)))
  }

  test("k above the max degree empties everything immediately") {
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val t = trace(tri, k = 5, rounds = 2)
    assert(t == Seq((1, 0L, 0L, false), (2, 0L, 0L, true)))
  }

  test("two cliques joined by a bridge: the bridge is not core-carrying") {
    // K4 on 1-4, K4 on 5-8, bridge 4-5; k=3 keeps both cliques, drops
    // the bridge edge only when an endpoint falls — here both endpoints
    // have degree 4 >= 3, so the bridge SURVIVES (its endpoints are
    // 3-core members) and the trace converges in round 1
    val k4a = for { i <- 1L to 4L; j <- (i + 1) to 4L } yield (i, j)
    val k4b = for { i <- 5L to 8L; j <- (i + 1) to 8L } yield (i, j)
    val g = k4a ++ k4b ++ Seq((4L, 5L))
    assert(trace(g, k = 3, rounds = 2) ==
      Seq((1, 8L, 13L, true), (2, 8L, 13L, true)))
  }
}
