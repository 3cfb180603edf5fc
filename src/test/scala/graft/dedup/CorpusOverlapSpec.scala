package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusOverlapSpec extends SparkSpec {
  import spark.implicits._

  private def corpora(a: Seq[String], b: Seq[String]) =
    a.map(("A", _)).concat(b.map(("B", _))).toDF("corpus", "text")

  test("estimate tracks exact Jaccard on a known-overlap corpus") {
    // J = |{c,d}| / |{a..f}| = 1/3
    val df = corpora(Seq("a", "b", "c", "d"), Seq("c", "d", "e", "f"))
    val sk = CorpusOverlap.sketches(df, "corpus", "text", 256)
    val est = CorpusOverlap.estimate(sk, "corpus", "A", "B")
      .as[Double].collect()(0)
    assert(math.abs(est - 1.0 / 3.0) < 0.15, s"est=$est")
  }

  test("identical corpora estimate exactly 1.0; disjoint near 0") {
    val same = corpora(Seq("x", "y", "z"), Seq("x", "y", "z"))
    val skSame = CorpusOverlap.sketches(same, "corpus", "text", 128)
    assert(CorpusOverlap.estimate(skSame, "corpus", "A", "B")
      .as[Double].collect()(0) === 1.0)
    val disj = corpora(Seq("a", "b", "c"), Seq("d", "e", "f"))
    val skDisj = CorpusOverlap.sketches(disj, "corpus", "text", 128)
    assert(CorpusOverlap.estimate(skDisj, "corpus", "A", "B")
      .as[Double].collect()(0) < 0.1)
  }

  test("duplicated documents cannot move the sketch (min is dup-invariant)") {
    val once = corpora(Seq("p", "q", "r"), Nil)
    val duped = corpora(Seq("p", "q", "r", "p", "p", "q"), Nil)
    val a = CorpusOverlap.sketches(once, "corpus", "text", 64)
      .orderBy($"i").select($"minh").as[Long].collect().toSeq
    val b = CorpusOverlap.sketches(duped, "corpus", "text", 64)
      .orderBy($"i").select($"minh").as[Long].collect().toSeq
    assert(a === b)
  }

  test("merge of two days' sketches equals the sketch of the union") {
    val day1 = Seq("m", "n", "o").map(("C", _)).toDF("corpus", "text")
    val day2 = Seq("o", "p").map(("C", _)).toDF("corpus", "text")
    val merged = CorpusOverlap.merge(
        CorpusOverlap.sketches(day1, "corpus", "text", 64),
        CorpusOverlap.sketches(day2, "corpus", "text", 64))
      .orderBy($"i").select($"minh").as[Long].collect().toSeq
    val direct = CorpusOverlap.sketches(day1.unionByName(day2), "corpus", "text", 64)
      .orderBy($"i").select($"minh").as[Long].collect().toSeq
    assert(merged === direct)
  }

  test("containment flags a truncated re-crawl that Jaccard misses") {
    val full = "the quick brown fox jumps over the lazy dog and keeps running far away"
    val docs = Seq(
      (1L, full),
      (2L, full.substring(0, 25)), // prefix: contained, low jaccard
      (3L, "completely unrelated words with no shared trigrams at all"))
      .toDF("doc_id", "text")
    val pairs = Seq((2L, 1L), (3L, 1L)).toDF("id1", "id2")
    val got = NgramJaccard.forPairsWithContainment(pairs, docs)
      .orderBy($"id1")
      .select($"id1", $"ngram_jaccard", $"containment_1_in_2")
      .as[(Long, Double, Double)].collect()
    val (_, j2, c2) = got(0)
    val (_, _, c3) = got(1)
    assert(c2 === 1.0, "prefix must be fully contained")
    assert(j2 < 0.5, "jaccard must NOT flag the truncation")
    assert(c3 < 0.3, "unrelated doc must not look contained")
  }
}
