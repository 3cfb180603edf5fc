package graft.operators

import graft.SparkSpec

/** Exact-math truth table for the unigram cross-entropy scorer: the scores
  * must equal a driver-side BigDecimal replay of the same round-9 surprisal
  * arithmetic, and rarer vocabulary must score strictly higher.
  */
class UnigramLMSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (0L, "the cat sat on the mat"),
    (1L, "the dog sat on the rug"),
    (2L, "quantum chromodynamics baffles everyone"),
    (3L, "the the the the"))

  private def driverScores: Map[Long, (Long, Double)] = {
    val toks = corpus.map { case (id, t) => id -> t.trim.split(" +").toSeq }
    val counts = toks.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val total = counts.values.sum.toDouble
    toks.map { case (id, ts) =>
      val sum = ts.map { t =>
        BigDecimal(-math.log(counts(t) / total))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP)
      }.sum
      id -> (ts.size.toLong,
        (sum / BigDecimal(ts.size)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble)
    }.toMap
  }

  private def engineScores: Map[Long, (Long, Double)] =
    UnigramLM.crossEntropy(corpus.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap

  test("cross-entropy equals the driver-side exact replay, per document") {
    val (eng, ref) = (engineScores, driverScores)
    assert(eng.keySet == ref.keySet)
    eng.foreach { case (id, (n, ce)) =>
      assert(n == ref(id)._1, s"doc $id token count")
      assert(math.abs(ce - ref(id)._2) < 1e-9, s"doc $id: $ce vs ${ref(id)._2}")
    }
  }

  test("rare-vocabulary documents score strictly higher than common ones") {
    val eng = engineScores
    // doc 2 is all-singleton tokens; doc 3 is the most common token only
    assert(eng(2L)._2 > eng(0L)._2)
    assert(eng(3L)._2 < eng(0L)._2)
  }

  test("termFrequencies drops empty tokens and counts duplicates") {
    val tf = UnigramLM.termFrequencies(
        Seq((7L, "  a  a   b ")).toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(tf == Set((7L, "a", 2L), (7L, "b", 1L)))
  }
}
