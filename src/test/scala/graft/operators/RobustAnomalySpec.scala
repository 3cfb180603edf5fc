package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RobustAnomalySpec extends SparkSpec {
  import spark.implicits._

  /** Brute reference: interpolated median over sorted doubles. */
  private def med(xs: Seq[Long]): Double = {
    val s = xs.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2).toDouble else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  private def reference(xs: Seq[Long]): (Long, Long, Long) = {
    val med2 = med(xs.map(_ * 2))
    val d2 = xs.map(v => math.abs(2 * v - med2).toLong)
    val mad2 = med(d2)
    (med2.toLong, (mad2 * 2).toLong,
      d2.count(d => 2 * d > 7 * mad2).toLong)
  }

  test("median/MAD/outliers equal brute force for odd and even groups") {
    val odd = Seq(1L, 2L, 3L, 4L, 100L)              // odd count, one spike
    val even = Seq(10L, 10L, 11L, 13L, 14L, 500L)    // even count, .5 MAD case
    val df = (odd.map(("odd", _)) ++ even.map(("even", _)))
      .toDF("g", "v")
    val got = RobustAnomaly.madOutliers(df, "g", col("v"))
      .orderBy("g").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    for ((name, xs) <- Seq("odd" -> odd, "even" -> even)) {
      val (m, mad4, out) = reference(xs)
      assert(got(name) === ((xs.length.toLong, m, mad4, out)),
        s"group $name diverged")
    }
  }

  test("robust gate ignores the contamination a z-score gate absorbs") {
    // 90 points at 10 plus 10 spikes at 10000: the spikes drag sigma so
    // far that NO point is 3 sigma out, while MAD still flags all 10
    val xs = Seq.fill(90)(10L) ++ Seq.fill(10)(10000L)
    val df = xs.map(("g", _)).toDF("g", "v")
    val r = RobustAnomaly.madOutliers(df, "g", col("v")).collect()(0)
    assert(r.getLong(4) === 10L) // exactly the planted spikes
    val (mean, sd) = (xs.sum.toDouble / xs.length,
      math.sqrt(xs.map(x => math.pow(x - xs.sum.toDouble / xs.length, 2)).sum / xs.length))
    assert(xs.count(x => math.abs(x - mean) > 3 * sd) === 0) // z-score blind
  }

  test("all-constant group flags nothing (MAD = 0, strict inequality)") {
    val df = Seq.fill(8)(("g", 42L)).toDF("g", "v")
    val r = RobustAnomaly.madOutliers(df, "g", col("v")).collect()(0)
    assert(r.getLong(2) === 84L && r.getLong(3) === 0L && r.getLong(4) === 0L)
  }
}
