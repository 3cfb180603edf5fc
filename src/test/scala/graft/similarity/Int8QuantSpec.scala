package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Int8QuantSpec extends SparkSpec {
  import spark.implicits._

  test("codes are round(x*127/maxabs); extremes hit ±127 exactly") {
    val df = Seq((1L, Seq(2.0f, -4.0f, 1.0f, 0.0f))).toDF("vec_id", "embedding")
    val row = df.select(
      Int8Quant.codes(col("embedding"), Int8Quant.maxAbs(col("embedding"))).as("q"))
      .head.getSeq[Int](0)
    assert(row === Seq(64, -127, 32, 0)) // round(2*127/4)=64 (63.5 half-up)
  }

  test("all-zero vector quantizes to zero codes, audit bound holds with equality") {
    val df = Seq((0L, Seq(0.0f, 0.0f)), (1L, Seq(1.0f, -1.0f)))
      .toDF("vec_id", "embedding")
    val got = Int8Quant.audit(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(4))).toMap
    assert(got(0L) === ((0L, true)))
    assert(got(1L) === ((0L, true))) // 127 + (-127) = 0
  }

  test("integer dot product is exact and matches a driver-side recompute") {
    val a = Seq(100, -50, 3)
    val b = Seq(-7, 20, 127)
    val got = spark.range(1)
      .select(Int8Quant.intDot(
        typedLit(a), typedLit(b)).as("d")).head.getLong(0)
    assert(got === a.zip(b).map { case (x, y) => x.toLong * y }.sum)
  }

  test("audit on real embeddings: every dot0_ok true, dims constant") {
    val out = Int8Quant.audit(graft.Tables.embeddings(spark, sf("sf0.001")))
    assert(out.filter(!col("dot0_ok")).count() === 0)
    assert(out.select("n_dims").distinct().count() === 1)
  }
}
