package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CosineLSHSpec extends SparkSpec {
  import spark.implicits._

  // deterministic corpus: 30 random-ish vectors + exact copies of the first 3
  private lazy val corpus = {
    val rnd = new scala.util.Random(7)
    val base = (0 until 30).map(i => (i.toLong, Array.fill(16)(rnd.nextGaussian())))
    val copies = base.take(3).map { case (id, v) => (id + 1000L, v) }
    (base ++ copies).map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "embedding")
  }

  test("planted exact copies are always found, nothing else at 0.99") {
    val got = CosineLSH.nearDuplicates(corpus, threshold = 0.99)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(got === Set((0L, 1000L), (1L, 1001L), (2L, 1002L)), s"got $got")
  }

  test("cosine of an exact copy rounds to 1.0; pairs are ordered id1 < id2") {
    val rows = CosineLSH.nearDuplicates(corpus, threshold = 0.99).collect()
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) === 1.0)
    }
  }

  test("signature determinism: same seed same buckets, different seed different planes") {
    val a = CosineLSH.hyperplanes(4, 8, seed = 42L)
    val b = CosineLSH.hyperplanes(4, 8, seed = 42L)
    val c = CosineLSH.hyperplanes(4, 8, seed = 43L)
    assert(a.flatten.toSeq === b.flatten.toSeq)
    assert(a.flatten.toSeq !== c.flatten.toSeq)
  }

  test("autoBits keeps mean bucket occupancy ~4 and is stable at the gate scales") {
    // gate scales: sf0.001/sf0.01 corpora (520/820 vectors) must stay at
    // 8 bits so the driver-gate signatures are bit-identical to the fixed
    // width the suite shipped with; larger corpora widen logarithmically.
    assert(CosineLSH.autoBits(520) === 8)
    assert(CosineLSH.autoBits(820) === 8)
    assert(CosineLSH.autoBits(2020) === 9)   // sf0.1
    assert(CosineLSH.autoBits(8020) === 11)  // sf1 — the scale where 8 bits lost pairs
    assert(CosineLSH.autoBits(1L << 40) === 20) // clamped: sig stays band-packable
    assert(CosineLSH.autoBits(0) === 8)
    // occupancy bound: n / 2^bits <= 8 for every n up to the clamp knee
    Seq(100L, 1000L, 10000L, 100000L, 1000000L).foreach { n =>
      val bits = CosineLSH.autoBits(n)
      assert(n.toDouble / (1L << bits) <= 8.0, s"n=$n bits=$bits")
    }
    // band count buys recall back as bands widen; 8-bit gate width -> the
    // original 4 bands (signatures bit-identical to the shipped gate)
    assert(CosineLSH.autoBands(8) === 4)
    assert(CosineLSH.autoBands(11) === 8)
    assert(CosineLSH.autoBands(20) === 12)
  }

  test("no persisted state and a reused exchange (single signature computation)") {
    val out = CosineLSH.nearDuplicates(corpus, threshold = 0.99)
    out.collect()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
    assert(out.queryExecution.executedPlan.toString.contains("ReusedExchange"))
  }
}
