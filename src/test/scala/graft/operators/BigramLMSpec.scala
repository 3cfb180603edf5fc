package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.catalyst.plans.logical.Join

class BigramLMSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "a b a b"),
    (2L, "a b"),
    (3L, "solo"),       // < 2 tokens: contributes no bigram events
    (4L, "  x  y  "))   // ragged whitespace still pairs (x, y)
    .toDF("doc_id", "text")

  test("bigram frequencies are adjacent-pair counts per document") {
    val got = BigramLM.bigramFrequencies(docs)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2, t._3))
    assert(got === Array(
      (1L, "a", "b", 2L), (1L, "b", "a", 1L),
      (2L, "a", "b", 1L),
      (4L, "x", "y", 1L)))
  }

  test("cross-entropy matches the hand-derived interpolated model") {
    // corpus bigram events: ab x3, ba x1, xy x1  (N = 5)
    // c1: a->3, b->1, x->1 ; c2: b->3, a->1, y->1
    val n = 5.0
    val HALF_UP = scala.math.BigDecimal.RoundingMode.HALF_UP
    def s(c12: Long, c1: Long, c2: Long): BigDecimal = {
      // same float-op order as the operator, same HALF_UP 9dp round as
      // Spark's round(col, 9)
      val p = 0.75 * c12.toDouble / c1.toDouble + 0.25 * c2.toDouble / n
      BigDecimal(-math.log(p)).setScale(9, HALF_UP)
    }
    val sAB = s(3, 3, 3) // p = .75 + .15  = .90
    val sBA = s(1, 1, 1) // p = .75 + .05  = .80
    val sXY = s(1, 1, 1) // p = .75 + .05  = .80
    def ce(terms: (BigDecimal, Long)*): Double = {
      val num = terms.map { case (sv, tf) => sv * tf }.sum
      val den = terms.map(_._2).sum
      BigDecimal(num.toDouble / den.toDouble).setScale(6, HALF_UP).toDouble
    }
    val got = BigramLM.crossEntropy(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(got === Array(
      (1L, 3L, ce((sAB, 2L), (sBA, 1L))),
      (2L, 1L, ce((sAB, 1L))),
      (4L, 1L, ce((sXY, 1L)))))
  }

  test("an observed bigram can never score p = 0 under interpolation") {
    // a bigram seen once in a huge left context still gets the unigram term
    val skew = (Seq((0L, ("c " * 1000).trim)) ++ Seq((1L, "c d")))
      .toDF("doc_id", "text")
    val ce = BigramLM.crossEntropy(skew)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(!ce(1L).isInfinite && !ce(1L).isNaN)
  }

  test("pair construction is map-only: no join below the tf aggregate") {
    val joins = BigramLM.bigramFrequencies(docs)
      .queryExecution.optimizedPlan.collect { case j: Join => j }
    assert(joins.isEmpty, "bigram stream must come from arrays_zip, not a self-join")
  }
}
