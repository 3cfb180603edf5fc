package graft.operators

import graft.SparkSpec

class RrfSpec extends SparkSpec {
  import spark.implicits._

  test("fusion is exact integer arithmetic with id tie-break") {
    // query 1: doc 10 is rank 1 in A and rank 3 in B; doc 20 rank 2/1;
    // doc 30 only in A at rank 3; doc 40 only in B at rank 2
    val a = Seq((1L, 10L, 1), (1L, 20L, 2), (1L, 30L, 3)).toDF("query_id", "doc_id", "rank")
    val b = Seq((1L, 20L, 1), (1L, 40L, 2), (1L, 10L, 3)).toDF("query_id", "doc_id", "rank")
    val got = Rrf.fuse(Seq(a, b), topN = 10).collect()
      .map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3), r.getInt(4))).toMap
    def c(r: Int): Long = 1000000L / (60 + r)
    assert(got(10L) === ((c(1) + c(3), 2L, 2)))
    assert(got(20L) === ((c(1) + c(2), 2L, 1))) // 1/61+1/62 > 1/61+1/63
    assert(got(30L) === ((c(3), 1L, 4)))       // ties with 40 on micros?
    assert(got(40L) === ((c(2), 1L, 3)))
  }

  test("ties on fused score break by doc id; topN truncates") {
    val a = Seq((7L, 5L, 1), (7L, 3L, 2), (7L, 9L, 2)).toDF("query_id", "doc_id", "rank")
    // docs 3 and 9 tie at rank 2 (same contribution): 3 must rank before 9
    val got = Rrf.fuse(Seq(a), topN = 2).collect()
      .map(r => (r.getLong(1), r.getInt(4))).toMap
    assert(got(5L) === 1 && got(3L) === 2 && !got.contains(9L))
  }

  test("per-query groups stay bounded: fused rows <= lists * topN per query") {
    val a = (1 to 50).map(i => (1L, i.toLong, i)).toDF("query_id", "doc_id", "rank")
    val b = (1 to 50).map(i => (1L, (i + 25).toLong, i)).toDF("query_id", "doc_id", "rank")
    val fused = Rrf.fuse(Seq(a, b), topN = 10)
    assert(fused.count() === 10)
    // top of the fused list is the doc ranked high in BOTH lists
    val first = fused.orderBy("rank").head
    assert(first.getLong(3) === 2L) // n_lists = 2 for the winner
  }
}
