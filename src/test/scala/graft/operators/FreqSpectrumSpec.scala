package graft.operators

import graft.SparkSpec

class FreqSpectrumSpec extends SparkSpec {
  import spark.implicits._

  test("trigram spectrum matches the hand count") {
    // "a b c a b c": trigrams abc, bca, cab, abc -> f(abc)=2, f(bca)=1,
    // f(cab)=1 -> spectrum f=1: 2 types/2 mass, f=2: 1 type/2 mass
    val docs = Seq(Tuple1("a b c a b c")).toDF("text")
    val got = FreqSpectrum.spectrum(docs, "text", n = 3, capF = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got === Array((1L, 2L, 2L), (2L, 1L, 2L)))
  }

  test("frequencies above capF fold into the single tail bucket") {
    val docs = Seq(Tuple1("x x x x x")).toDF("text")
    val got = FreqSpectrum.spectrum(docs, "text", n = 1, capF = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got === Array((3L, 1L, 5L))) // f(x)=5 > 2 -> bucket capF+1 = 3
  }

  test("documents shorter than n contribute nothing") {
    val docs = Seq(Tuple1("a b"), Tuple1("")).toDF("text")
    assert(FreqSpectrum.spectrum(docs, "text", n = 3).count() == 0L)
  }

  test("mass is conserved: sum(mass) equals the total gram count") {
    val docs = (1L to 50L).map(i => Tuple1(s"w${i % 7} w${i % 5} w${i % 3} w${i % 2} end"))
      .toDF("text")
    val spec = FreqSpectrum.spectrum(docs, "text", n = 2, capF = 3).collect()
    val totalGrams = 50L * 4 // 5 tokens per doc -> 4 bigrams each
    assert(spec.map(_.getLong(2)).sum == totalGrams)
  }

  test("invalid params are rejected") {
    val docs = Seq(Tuple1("a b c")).toDF("text")
    intercept[IllegalArgumentException] {
      FreqSpectrum.spectrum(docs, "text", n = 0)
    }
  }
}
