package graft.segmentation

import graft.SparkSpec

class ElbowSpec extends SparkSpec {
  import spark.implicits._

  test("secondDiff matches np.diff(_, 2) semantics") {
    // np.diff([10, 6, 4, 3, 2.5], 2) = [2, 1, 0.5]
    val d2 = Elbow.secondDiff(Seq(10.0, 6.0, 4.0, 3.0, 2.5))
    assert(d2 === Seq(2.0, 1.0, 0.5))
  }

  test("elbowK index arithmetic is argmin(diff2) + 2 (codeText.txt:149-162)") {
    // FIXTURES.md elbow_seq: hand-built WCSS with a known knee.
    // diff2 minima: for wcss = [100, 50, 30, 28, 27, 26]:
    //   diff2 = [100-100+30=30, 50-60+28=18, 30-56+27=1, 28-54+26=0] → argmin=3 → k*=5
    val wcss = Seq(100.0, 50.0, 30.0, 28.0, 27.0, 26.0)
    assert(Elbow.elbowK(wcss) === 5)
    // diff2([10, 9, 1, 0.9, 0.8]) = [-7, 7.9, 0] → argmin=0 → k*=2
    assert(Elbow.elbowK(Seq(10.0, 9.0, 1.0, 0.9, 0.8)) === 2)
  }

  test("sweep: our WCSS expression cross-checks MLlib trainingCost") {
    val rnd = new scala.util.Random(5)
    val pts = Seq.fill(500)((rnd.nextInt(24).toDouble, rnd.nextInt(7).toDouble))
    val df = pts.toDF("order_hour_of_day", "order_dow")
    val sweep = Elbow.sweep(df, Seq("order_hour_of_day"), ks = Seq(2, 3, 4))
    sweep.foreach { p =>
      // same quantity computed two ways (SURVEY §5.3): DataFrame agg vs MLlib
      assert(math.abs(p.wcss - p.trainingCost) / math.max(p.trainingCost, 1e-9) < 1e-6,
        s"k=${p.k}: wcss=${p.wcss} trainingCost=${p.trainingCost}")
    }
    // WCSS decreases with k
    assert(sweep.map(_.wcss) === sweep.map(_.wcss).sorted.reverse)
  }

  test("findK returns a k in the swept range") {
    val rnd = new scala.util.Random(9)
    // 4 well-separated 1-D blobs → elbow should land near 4
    val pts = Seq.fill(800) {
      val c = Seq(2.0, 9.0, 16.0, 22.0)(rnd.nextInt(4))
      (c + rnd.nextGaussian() * 0.3, rnd.nextInt(7).toDouble)
    }
    val df = pts.toDF("order_hour_of_day", "order_dow")
    val k = Elbow.findK(df, Seq("order_hour_of_day"), ks = 2 until 8)
    assert(k >= 2 && k < 8)
  }
}
