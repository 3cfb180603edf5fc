package graft.operators

import graft.SparkSpec

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    PageRank.ranksMillionths(edges.toDF("s", "d"), iters, checkpoint = false)
      .as[(Long, Long)].collect().toMap

  test("symmetric 2-cycle is the exact fixed point (rank stays 1_000_000)") {
    // r' = 150000 + 850000 * (1e6 div 1) div 1e6 = 1_000_000 exactly
    val got = ranks(Seq((1L, 2L), (2L, 1L)), iters = 7)
    assert(got === Map(1L -> 1000000L, 2L -> 1000000L))
  }

  test("4-leaf star after one round matches the hand computation") {
    // center 0 <-> leaves 1..4. deg(0)=4, deg(leaf)=1.
    // r1(center) = 150000 + 850000 * (4 * 1_000_000) div 1_000_000 = 3_550_000
    // r1(leaf)   = 150000 + 850000 * (1_000_000 div 4) div 1_000_000 = 362_500
    val leaves = (1L to 4L)
    val edges = leaves.flatMap(l => Seq((0L, l), (l, 0L)))
    val got = ranks(edges, iters = 1)
    assert(got(0L) === 3550000L)
    leaves.foreach(l => assert(got(l) === 362500L, s"leaf $l: ${got(l)}"))
  }

  test("total mass stays within the damping bound (no rank explosion or loss)") {
    // with truncating division mass can only leak DOWN per round; the 0.15
    // floor injects n*150000 — total must stay in (n*150000, n*1000000 * 1.01]
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (2L, 1L), (3L, 2L), (1L, 3L))
    val got = ranks(edges, iters = 10)
    val total = got.values.sum
    assert(total <= (3 * 1000000 * 101L) / 100, s"mass exploded: $got")
    assert(total > 3 * 150000L, s"mass vanished: $got")
  }
}
