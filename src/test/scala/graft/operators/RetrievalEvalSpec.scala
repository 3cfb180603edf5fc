package graft.operators

import graft.SparkSpec

class RetrievalEvalSpec extends SparkSpec {
  import spark.implicits._

  // tf("x"): doc1=4 doc3=3 doc2=2; tf("y"): doc2=2; "z" absent entirely
  private def corpus = Seq(
    (1L, "x x x x"),
    (2L, "x x y y"),
    (3L, "x x x")).toDF("doc_id", "text")

  test("discount table is floor(1e6 / log2(rank+1)) for ranks 1..10") {
    val expected = (1 to 10).map(r =>
      math.floor(1e6 / (math.log(r + 1.0) / math.log(2.0))).toLong)
    assert(RetrievalEval.discMicros == expected)
  }

  test("metrics match the hand computation on a known ranking") {
    val out = RetrievalEval.evaluate(corpus, Seq("x", "y"), k = 10, relevanceTf = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getInt(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getDouble(7)))
    // "x": ranking doc1(tf4) doc3(tf3) doc2(tf2); relevant = {doc1, doc3}
    //   hits@10=2, first_rel_rank=1, mrr=1000000,
    //   dcg = disc(1)+disc(2) = 1630929 = idcg(m=2), ndcg = 1.0
    // "y": one posting tf=2, nothing relevant: all-zero metrics
    assert(out === Array(
      ("x", 2L, 2L, 1, 1000000L, 1630929L, 1630929L, 1.0),
      ("y", 0L, 0L, 0, 0L, 0L, 0L, 0.0)))
  }

  test("a probe term absent from the corpus reports a zero row, not no row") {
    val out = RetrievalEval.evaluate(corpus, Seq("x", "z"), k = 10, relevanceTf = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getInt(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getDouble(7)))
    assert(out.length == 2)
    assert(out(1) === (("z", 0L, 0L, 0, 0L, 0L, 0L, 0.0)))
  }

  test("idcg prefix caps at k when relevant docs outnumber the ranks") {
    // ranking is tf desc and relevance is tf >= threshold, so a relevant
    // doc can never rank below a non-relevant one; the interesting branch
    // is n_relevant > k, where m = k caps the IDCG prefix
    val docs = Seq(
      (1L, "q q q"), (2L, "q q q"), (3L, "q q q")).toDF("doc_id", "text")
    val out = RetrievalEval.evaluate(docs, Seq("q"), k = 2, relevanceTf = 3)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getDouble(7)))
    // 3 relevant docs, only 2 ranks: hits=2, m=min(3,2)=2, dcg=idcg, ndcg=1
    assert(out === Array((3L, 2L, 1000000L, 1630929L, 1630929L, 1.0)))
  }

  test("ranking is bounded top-k aggregation, not a corpus-sized window") {
    val plan = RetrievalEval.evaluate(corpus, Seq("x"), k = 10, relevanceTf = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected window operator:\n$plan")
  }

  test("k above the discount table is rejected") {
    intercept[IllegalArgumentException] {
      RetrievalEval.evaluate(corpus, Seq("x"), k = 11)
    }
  }
}
