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

  test("no persisted state and a reused exchange (single signature computation)") {
    val out = CosineLSH.nearDuplicates(corpus, threshold = 0.99)
    out.collect()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
    assert(out.queryExecution.executedPlan.toString.contains("ReusedExchange"))
  }
}
