package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The relational log-histogram quantile sketch: the eps relative-error
  * guarantee, exact mergeability of stored sketch rows, and the rank
  * definition parity with sorted-array extraction (what the q131 exact
  * gate side relies on).
  */
class HistogramQuantileSpec extends SparkSpec {
  import spark.implicits._

  private val eps = 0.01

  test("quantile estimates are within eps of exact for a geometric spread") {
    // values spanning 5 decades — log bucketing's home turf
    val values = (1 to 4000).map(i => math.pow(10.0, i / 800.0))
    val df = values.map(("g", _)).toDF("grp", "v")
    val hist = HistogramQuantile.sketch(df, Seq("grp"), col("v"), eps)
    val ps = Seq(0.1, 0.5, 0.9, 0.95, 0.99)
    val row = HistogramQuantile.quantiles(hist, "grp", eps, ps).head()
    assert(row.getLong(row.fieldIndex("n")) == values.size)
    val sorted = values.sorted
    ps.foreach { p =>
      val k = math.ceil(p * values.size).toInt
      val exact = sorted(k - 1)
      val est = row.getDouble(
        row.fieldIndex(f"est_p${math.round(p * 100)}%02d"))
      val rel = math.abs(est / exact - 1.0)
      // bucket-edge jitter can shift one bucket: allow 2*eps
      assert(rel <= 2 * eps, f"p=$p est=$est exact=$exact rel=$rel%.4f")
    }
  }

  test("stored daily sketches merge to exactly the all-at-once sketch") {
    val d1 = (1 to 500).map(i => ("d1", i * 1.5)).toDF("grp", "v")
    val d2 = (1 to 700).map(i => ("d2", i * 2.5)).toDF("grp", "v")
    val all = d1.union(d2).withColumn("grp", lit("all"))
    // merge = bucket-wise count sum over the stored rows
    val merged = HistogramQuantile.sketch(d1.union(d2), Seq("grp"), col("v"), eps)
      .groupBy(col("bucket")).agg(sum(col("cnt")).as("cnt"))
    val direct = HistogramQuantile.sketch(all, Seq("grp"), col("v"), eps)
      .select(col("bucket"), col("cnt"))
    assert(merged.collect().map(r => (r.getInt(0), r.getLong(1))).toMap ==
      direct.collect().map(r => (r.getInt(0), r.getLong(1))).toMap)
  }

  test("sketch size is bucket-bound, not data-bound") {
    // 100k values over 3 decades at eps=1% -> at most ~700 bucket rows
    val big = (1 to 100000).map(i => ("g", 1.0 + (i % 999))).toDF("grp", "v")
    val nRows = HistogramQuantile.sketch(big, Seq("grp"), col("v"), eps).count()
    assert(nRows < 800, s"sketch has $nRows rows")
  }

  test("constant column: every quantile is the single bucket's upper edge") {
    val df = (1 to 100).map(i => ("g", 42.0)).toDF("grp", "v")
    val hist = HistogramQuantile.sketch(df, Seq("grp"), col("v"), eps)
    assert(hist.count() == 1)
    val row = HistogramQuantile.quantiles(hist, "grp", eps, Seq(0.5, 0.95)).head()
    val p50 = row.getDouble(row.fieldIndex("est_p50"))
    val p95 = row.getDouble(row.fieldIndex("est_p95"))
    assert(p50 == p95)
    assert(math.abs(p50 / 42.0 - 1.0) <= 2 * eps)
  }

  test("non-positive values fail the sketch instead of skewing quantiles") {
    val df = Seq(("g", 5.0), ("g", 0.0), ("g", 9.0)).toDF("grp", "v")
    val e = intercept[Exception] {
      HistogramQuantile.sketch(df, Seq("grp"), col("v"), eps).collect()
    }
    assert(e.getMessage != null && e.toString.contains("value > 0")
      || e.getCause != null && e.getCause.getMessage.contains("value > 0"))
  }
}
