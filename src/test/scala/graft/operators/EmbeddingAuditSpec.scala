package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EmbeddingAuditSpec extends SparkSpec {
  import spark.implicits._

  private def table = Seq(
    ("A", Seq(1.0, 2.0)),            // qnorm = 1000^2 + 2000^2 = 5,000,000
    ("A", Seq(Double.NaN, 1.0)),     // non-finite vector
    ("A", Seq(0.0, 0.0)),            // exact zero vector
    ("A", Seq(0.0005, 0.0)),         // dead band: floor(0.5) = 0 -> zero vector
    ("A", Seq(-0.0005, 0.0)),        // floor(-0.5) = -1 -> qnorm 1, NOT zero
    ("B", Seq(1.0)),                 // dimension drift (expected 2)
    ("B", Seq(3.0, 0.0, 0.0))        // drift the other way
  ).toDF("label", "vec")

  test("per-label verdict counts match the hand audit") {
    val got = EmbeddingAudit.audit(table, col("vec"), col("label"), expectedDim = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getInt(6), r.getInt(7)))
    assert(got === Array(
      // A: 5 vecs, dims ok, 1 NaN vec, 2 zero vecs ([0,0] and the dead-band
      // positive); qnorm mass = 5,000,000 (v1) + 1,000,000 (NaN vec's
      // finite 1.0) + 0 + 0 + 1 (the -0.0005 vec)
      ("A", 5L, 0L, 1L, 2L, 6000001L, 2, 2),
      // B: both rows deviate from the dim-2 contract
      ("B", 2L, 2L, 0L, 0L, 1000000L + 9000000L, 1, 3)))
  }

  test("the zero-vector dead band is one-sided, as documented") {
    val eps = Seq(("p", Seq(0.0009)), ("n", Seq(-0.0009))).toDF("label", "vec")
    val byLabel = EmbeddingAudit.audit(eps, col("vec"), col("label"),
      expectedDim = 1).collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(byLabel("p") == 1L, "tiny positive quantizes to 0 -> zero vector")
    assert(byLabel("n") == 0L, "tiny negative quantizes to -1 -> not zero")
  }

  test("non-finite elements never poison the quantized norm") {
    val inf = Seq(("x", Seq(Double.PositiveInfinity, 2.0))).toDF("label", "vec")
    val row = EmbeddingAudit.audit(inf, col("vec"), col("label"), expectedDim = 2)
      .collect().head
    assert(row.getLong(3) == 1L)        // counted as a non-finite vector
    assert(row.getLong(5) == 4000000L)  // norm sums only the finite 2.0
  }

  test("audit is one map + one aggregate: no joins, no windows") {
    val plan = EmbeddingAudit.audit(table, col("vec"), col("label"),
      expectedDim = 2).queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Window"), plan)
  }
}
