package graft.dedup

import graft.SparkSpec

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def assignments(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.canonicalAssignments(pairs.toDF("id1", "id2"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chains, triangles, singleton pairs, reversed/duplicate edges") {
    val got = assignments(Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),    // 4-chain: diameter > 1
      (10L, 11L), (11L, 10L),          // reversed duplicate
      (20L, 21L), (21L, 22L), (22L, 20L), // triangle
      (30L, 30L),                      // self-loop only
      (40L, 41L)))
    assert(got(1L) === 1L && got(2L) === 1L && got(3L) === 1L && got(4L) === 1L)
    assert(got(10L) === 10L && got(11L) === 10L)
    assert(got(20L) === 20L && got(21L) === 20L && got(22L) === 20L)
    assert(got(40L) === 40L && got(41L) === 40L)
    // pure self-loop vertex is dropped by the s != d filter: no pair info
    assert(!got.contains(30L))
  }

  test("long chain converges (diameter 19)") {
    val chain = (0L until 19L).map(i => (i, i + 1))
    val got = assignments(chain)
    assert(got.size === 20 && got.values.forall(_ === 0L))
  }

  test("deduplicate keeps canonical + unpaired docs, drops other members") {
    val docs = Seq((1L, "a"), (2L, "a'"), (3L, "b"), (4L, "c"))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("id1", "id2")
    val kept = ConnectedComponents.deduplicate(docs, pairs)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq === Seq(1L, 3L, 4L))
  }
}
