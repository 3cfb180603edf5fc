package graft.segmentation

import graft.SparkSpec

class KMeansSpec extends SparkSpec {
  import spark.implicits._

  // FIXTURES.md tiny_points: two obvious blobs
  private lazy val blobs = Seq(
    (0, 0), (1, 0), (0, 1),       // blob A around (0.33, 0.33)
    (10, 10), (11, 10), (10, 11)  // blob B around (10.33, 10.33)
  ).toDF("x", "y")

  test("assignExpr matches the pure-Scala kernel on random data") {
    val rnd = new scala.util.Random(7)
    val pts = Seq.fill(200)((rnd.nextDouble() * 20 - 10, rnd.nextDouble() * 20 - 10))
    val cents = Array(Array(0.0, 0.0), Array(5.0, 5.0), Array(-5.0, 5.0), Array(0.0, -7.0))
    val df = pts.toDF("x", "y")
    val got = KMeansMR.assignClusters(df, Seq("x", "y"), cents)
      .select("x", "y", "cluster").collect()
    got.foreach { r =>
      val expect = Distance.assign(Array(r.getDouble(0), r.getDouble(1)), cents)
      assert(r.getInt(2) === expect)
    }
  }

  test("assignExpr tie-break: lowest index wins (incl. duplicate centroids)") {
    val df = Seq((1.0, 0.0)).toDF("x", "y")
    val cents = Array(Array(0.0, 0.0), Array(2.0, 0.0))
    assert(KMeansMR.assignClusters(df, Seq("x", "y"), cents)
      .select("cluster").as[Int].head() === 0)
    val dup = Array(Array(6.0, 4.0), Array(5.0, 16.0), Array(6.0, 4.0))
    val at = Seq((6.0, 4.0)).toDF("x", "y")
    assert(KMeansMR.assignClusters(at, Seq("x", "y"), dup)
      .select("cluster").as[Int].head() === 0)
  }

  test("fit converges on two blobs to the blob means and stops early") {
    val res = KMeansMR.fit(blobs, Seq("x", "y"),
      init = Array(Array(0.0, 0.0), Array(10.0, 10.0)), maxIter = 10)
    assert(res.converged)
    assert(res.iterations < 10)
    val sorted = res.centroids.sortBy(_.head)
    assert(math.abs(sorted(0)(0) - 1.0 / 3) < 1e-12)
    assert(math.abs(sorted(0)(1) - 1.0 / 3) < 1e-12)
    assert(math.abs(sorted(1)(0) - 31.0 / 3) < 1e-12)
  }

  test("final centroids are exactly the means of their assigned points") {
    val rnd = new scala.util.Random(11)
    val pts = Seq.fill(300)((rnd.nextInt(24).toDouble, rnd.nextInt(7).toDouble))
    val df = pts.toDF("x", "y")
    val res = KMeansMR.fit(df, Seq("x", "y"),
      init = Array(Array(5.0, 1.0), Array(12.0, 3.0), Array(20.0, 5.0)),
      maxIter = 25)
    // invariant: each centroid == mean of its assigned points (Lloyd's fixed point)
    val assigned = KMeansMR.assignClusters(df, Seq("x", "y"), res.centroids)
      .groupBy("cluster").avg("x", "y").collect()
      .map(r => (r.getInt(0), Array(r.getDouble(1), r.getDouble(2))))
      .sortBy(_._1).map(_._2)
    assert(assigned.length === res.centroids.length)
    if (res.converged)
      res.centroids.zip(assigned).foreach { case (c, m) =>
        assert(math.abs(c(0) - m(0)) < 1e-9); assert(math.abs(c(1) - m(1)) < 1e-9)
      }
  }

  test("RDD MapReduce form converges to the same centroids as the DataFrame form") {
    val rnd = new scala.util.Random(21)
    val pts = Seq.fill(500)((rnd.nextInt(24).toDouble, rnd.nextInt(7).toDouble))
    val df = pts.toDF("x", "y")
    val init = Array(Array(4.0, 1.0), Array(12.0, 3.0), Array(20.0, 6.0))
    val a = KMeansMR.fit(df, Seq("x", "y"), init, maxIter = 25)
    val b = KMeansRDD.fit(df, Seq("x", "y"), init, maxIter = 25)
    assert(a.centroids.length === b.centroids.length)
    a.centroids.zip(b.centroids).foreach { case (ca, cb) =>
      assert(math.abs(ca(0) - cb(0)) < 1e-9 && math.abs(ca(1) - cb(1)) < 1e-9,
        s"${ca.toSeq} vs ${cb.toSeq}")
    }
  }

  test("duplicate initial centroids → empty cluster drops, k shrinks (codeText.txt:783)") {
    // all mass near (6,4); duplicate init at index 0 and 2 — index 2 starves
    val df = Seq((6, 4), (6, 5), (7, 4), (5, 4), (0, 19), (1, 18)).toDF("x", "y")
    val init = Array(Array(6.0, 4.0), Array(5.0, 16.0), Array(6.0, 4.0))
    val res = KMeansMR.fit(df, Seq("x", "y"), init, maxIter = 10)
    assert(res.centroids.length < init.length) // k shrank
  }

  test("WCSS is non-increasing across Lloyd's iterations") {
    val rnd = new scala.util.Random(3)
    val pts = Seq.fill(400)((rnd.nextDouble() * 24, rnd.nextDouble() * 7))
    val df = pts.toDF("x", "y").persist()
    var cents = Array(Array(2.0, 2.0), Array(12.0, 3.0), Array(22.0, 6.0))
    var prev = Double.MaxValue
    for (_ <- 1 to 6) {
      val w = KMeansMR.wcss(df, Seq("x", "y"), cents)
      assert(w <= prev + 1e-9)
      prev = w
      val upd = KMeansMR.updateStep(df, Seq("x", "y"), cents)
      cents = upd.map(_._2)
    }
    df.unpersist()
  }

  test("golden-structure: report K=3 init on hour/dow-shaped data converges to 3 separated centroids") {
    // BASELINE.md row 1: init (17,0),(13,0),(8,3) on (hour, dow). Our fixture
    // data is synthetic, so the assertion is structural (3 clusters spanning
    // low/mid/high hours), not bit-exact (BASELINE.md caveat).
    val rnd = new scala.util.Random(42)
    val hours = Seq.fill(2000) {
      val mode = rnd.nextInt(3)
      val h = mode match {
        case 0 => 8 + rnd.nextInt(3)   // morning
        case 1 => 13 + rnd.nextInt(3)  // midday
        case 2 => 17 + rnd.nextInt(4)  // evening
      }
      (h, rnd.nextInt(7))
    }
    val df = hours.toDF("order_hour_of_day", "order_dow")
    val res = KMeansMR.fit(df, Seq("order_hour_of_day", "order_dow"),
      init = Array(Array(17.0, 0.0), Array(13.0, 0.0), Array(8.0, 3.0)),
      maxIter = 10)
    val hs = res.centroids.map(_.head).sorted
    assert(res.centroids.length === 3)
    assert(hs(0) < 11 && hs(1) > 12 && hs(1) < 16 && hs(2) > 16)
  }
}
