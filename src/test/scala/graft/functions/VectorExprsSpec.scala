package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorExprsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, Seq(1.0, 2.0, 3.0)),
    (2L, Seq(0.0, 0.0, 0.0)),
    (3L, Seq(-1.0, 1.0, 0.5))
  ).toDF("id", "v")

  test("kernels agree with the built-in fold forms bit-for-bit") {
    val w = Array(0.5, -1.0, 2.0)
    val folds = df.select(
      aggregate(zip_with(col("v"), typedLit(w), (x, y) => x * y),
        lit(0.0d), (acc, x) => acc + x).as("dot"),
      sqrt(aggregate(col("v"), lit(0.0d), (acc, x) => acc + x * x)).as("nrm"))
      .as[(Double, Double)].collect()
    val kernels = df.select(
      VectorExprs.dotVec(col("v"), typedLit(w)).as("dot"),
      VectorExprs.normVec(col("v")).as("nrm"))
      .as[(Double, Double)].collect()
    assert(folds.toSeq === kernels.toSeq)
  }

  test("argmin: first index wins exact ties") {
    val cents = Array(Array(1.0, 2.0, 3.0), Array(1.0, 2.0, 3.0), Array(0.0, 0.0, 0.0))
    val got = df.orderBy("id")
      .select(VectorExprs.argminConst(col("v"), cents))
      .as[Int].collect().toSeq
    assert(got === Seq(0, 2, 2))
  }

  test("vector kernel expressions stay inside whole-stage codegen") {
    // a parquet-backed frame — a local Seq is constant-folded away into a
    // LocalTableScan before any codegen happens
    val emb = graft.Tables.embeddings(spark, sf("sf0.001"))
      .select(col("embedding").cast("array<double>").as("v"))
    val plan = emb.select(VectorExprs.argminConst(col("v"),
        Array(Array.fill(64)(0.0), Array.fill(64)(1.0))).as("a"),
      VectorExprs.dotVec(col("v"), col("v")).as("d"))
      .queryExecution.executedPlan.toString
    // codegen'd spans are prefixed `*(n)`; a CodegenFallback expression
    // would break the span around the projection
    assert(plan.linesIterator.exists(l =>
        l.trim.startsWith("*") && l.contains("Project")),
      s"projection not codegen'd:\n$plan")
  }

  test("null vector yields null, not a crash") {
    val withNull = Seq((1L, Some(Seq(1.0, 2.0))), (2L, None))
      .toDF("id", "v")
    val out = withNull.select(VectorExprs.normVec(col("v"))).collect()
    assert(out(1).isNullAt(0))
  }
}
