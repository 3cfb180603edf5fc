package graft.segmentation

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path}

/** End-to-end replay of the reference notebook's whole workflow on the
  * FIXTURES.md §1 `orders_flat.csv` stand-in: S1 all-strings CSV ingest →
  * P1 select / P2 drop → P3/P4 recodes → P5 copy / P6 casts → O1/O2 seeded
  * sampling → U4 K-means with the report's golden initial centroids →
  * U5 elbow. Structural golden assertions per BASELINE.md's caveat (the
  * Instacart CSV is not shipped, so goldens anchor algorithm shape, not
  * bit-exact centroid replay).
  */
class ReferenceParitySpec extends SparkSpec {
  import spark.implicits._

  /** Seeded reference-shaped CSV: 11 columns incl. the 4 dropped ones and
    * ~0.5% dirty rows (FIXTURES.md §1).
    */
  private lazy val csvPath: String = {
    val rnd = new scala.util.Random(42)
    val departments = Seq("produce", "beverages", "dairy eggs", "personal care",
      "snacks", "pantry", "frozen")
    val rows = (1 to 4000).map { i =>
      val dirty = rnd.nextDouble() < 0.005
      val dow = if (dirty) "NA" else rnd.nextInt(7).toString
      val hourPeak = if (rnd.nextBoolean()) 10 + rnd.nextInt(7) else rnd.nextInt(24)
      val hour = if (dirty) "" else hourPeak.toString
      val dept = 1 + rnd.nextInt(21)
      val prod = if (i % 37 == 0) "\"Chocolate, Dark (70%)\"" else s"product_$i"
      Seq(i, 1 + i / 10, dow, hour, dept, departments(dept % departments.length),
        prod, rnd.nextInt(31), 1 + rnd.nextInt(50000), 1 + rnd.nextInt(80),
        rnd.nextInt(2)).mkString(",")
    }
    val header = "order_id,user_id,order_dow,order_hour_of_day,department_id," +
      "department,product_name,days_since_prior_order,product_id,add_to_cart_order,reordered"
    val p: Path = Files.createTempFile("orders_flat", ".csv")
    Files.writeString(p, (header +: rows).mkString("\n"))
    p.toString
  }

  private lazy val preprocessed = {
    // Q1 chain, exactly the reference's steps (codeText.txt:12-41,169,179-180)
    val raw = Ingest.csv(spark, csvPath)                       // S1: all strings
    val projected = Ingest.canonicalProjection(raw)            // P1 + P2
    val recoded = Recode.withDayName(
      Recode.withDowBucket(
        Ingest.castInt(projected, "order_dow", "order_hour_of_day", "department_id"))) // P6, P3, P4
    Recode.copyColumn(recoded, "order_hour_of_day", "order_hour_of_day_updated") // P5
  }

  test("S1: CSV ingests every column as string; quoted commas survive") {
    val raw = Ingest.csv(spark, csvPath)
    assert(raw.schema.fields.forall(_.dataType.typeName == "string"))
    assert(raw.columns.length === 11)
    assert(raw.count() === 4000)
    val quoted = raw.filter(col("product_name").contains("Chocolate, Dark"))
    assert(quoted.count() > 0, "quoted comma field was split")
  }

  test("P1+P2: canonical projection keeps 7, drops 4") {
    assert(Ingest.canonicalProjection(Ingest.csv(spark, csvPath)).columns.toSeq ===
      Seq("order_id", "user_id", "order_dow", "order_hour_of_day",
        "department_id", "department", "product_name"))
  }

  test("P3/P4/P6: dirty rows cast to NULL and fall into otherwise-branches") {
    val dirty = preprocessed.filter(col("order_dow").isNull)
    assert(dirty.count() > 0, "fixture should contain dirty rows")
    val r = dirty.select("order_dow_updated", "days").distinct().collect()
    assert(r.length === 1)
    assert(r(0).getInt(0) === 2)          // otherwise bucket
    assert(r(0).getString(1) === "None")  // otherwise day name
  }

  test("O1/O2/U2: seeded sampling is deterministic and returns k rows") {
    val feats = preprocessed.filter(col("order_hour_of_day").isNotNull)
    val c1 = Sampling.initialCentroids(feats, Seq("order_hour_of_day", "order_dow"), 4, seed = 11L)
    val c2 = Sampling.initialCentroids(feats, Seq("order_hour_of_day", "order_dow"), 4, seed = 11L)
    assert(c1.length === 4)
    assert(c1.map(_.toSeq).toSeq === c2.map(_.toSeq).toSeq)
    val c3 = Sampling.initialCentroids(feats, Seq("order_hour_of_day", "order_dow"), 4, seed = 12L)
    assert(c1.map(_.toSeq).toSeq !== c3.map(_.toSeq).toSeq)
  }

  test("U2 sampling never yields a null centroid even on dirty-heavy data") {
    import spark.implicits._
    // half the rows have a NULL dimension — any sampled centroid must be clean
    val df = (1 to 200).map(i =>
      (if (i % 2 == 0) Some(i % 24) else None, i % 7)).toDF("h", "d")
    for (seed <- 1L to 20L) {
      val cents = Sampling.initialCentroids(df, Seq("h", "d"), 3, seed)
      assert(cents.length === 3)
      assert(cents.forall(c => !c.exists(_.isNaN)))
    }
  }

  test("U4 golden: report K=4 (hour, dow) init converges; centroids = means of members") {
    // BASELINE.md K=4 (A): init (9,6),(7,1),(9,3),(16,3)
    val init = Array(Array(9.0, 6.0), Array(7.0, 1.0), Array(9.0, 3.0), Array(16.0, 3.0))
    val res = KMeansMR.fit(preprocessed, Seq("order_hour_of_day", "order_dow"), init, maxIter = 10)
    assert(res.centroids.length <= 4 && res.centroids.nonEmpty)
    // hours stay in-domain and separated like the report's structure
    val hs = res.centroids.map(_.head)
    assert(hs.forall(h => h >= 0 && h <= 23))
    assert(hs.max - hs.min > 3, s"centroids collapsed: ${hs.toSeq}")
    // Lloyd's fixed point if converged
    if (res.converged) {
      val means = KMeansMR.assignClusters(
          preprocessed.filter(col("order_hour_of_day").isNotNull && col("order_dow").isNotNull),
          Seq("order_hour_of_day", "order_dow"), res.centroids)
        .groupBy("cluster").avg("order_hour_of_day", "order_dow")
        .collect().sortBy(_.getInt(0)).map(r => Array(r.getDouble(1), r.getDouble(2)))
      res.centroids.zip(means).foreach { case (c, m) =>
        assert(math.abs(c(0) - m(0)) < 1e-9 && math.abs(c(1) - m(1)) < 1e-9)
      }
    }
  }

  test("U4 golden: duplicate-init K=5 (dow, dept) drops the starved duplicate (codeText.txt:783)") {
    val init = Array(Array(6.0, 4.0), Array(5.0, 16.0), Array(6.0, 4.0),
      Array(6.0, 7.0), Array(0.0, 19.0))
    val res = KMeansMR.fit(preprocessed, Seq("order_dow", "department_id"), init, maxIter = 20)
    assert(res.centroids.length < 5, "duplicate initial centroid must starve and drop")
  }

  test("U4 golden replay: K=3 (A) report inits land on the Conclusion-table finals") {
    // Fixture shaped so Lloyd's from the report's EXACT K=3 (A) inits
    // (BASELINE.md row 1) converges to the report's final centroids: three
    // 2-point blobs whose means are the goldens, each wholly inside one
    // init's Voronoi cell (bijective capture -> one update + confirmation).
    val pts = Seq(
      (18.59, 2.78), (17.99, 2.78), // mean (18.29, 2.78)
      (13.46, 2.49), (12.86, 2.49), // mean (13.16, 2.49)
      (8.91, 2.98), (8.31, 2.98)    // mean (8.61, 2.98)
    ).toDF("hour", "dow")
    val init = Array(Array(17.0, 0.0), Array(13.0, 0.0), Array(8.0, 3.0))
    val golden = Seq((8.61, 2.98), (13.16, 2.49), (18.29, 2.78))
    val res = KMeansMR.fit(pts, Seq("hour", "dow"), init, maxIter = 10)
    assert(res.converged && res.iterations <= 10)
    val got = res.centroids.map(c => (c(0), c(1))).sortBy(_._1).toSeq
    got.zip(golden).foreach { case ((gx, gy), (ex, ey)) =>
      assert(math.abs(gx - ex) < 1e-2 && math.abs(gy - ey) < 1e-2,
        s"centroid ($gx,$gy) drifted from golden ($ex,$ey): $got")
    }
  }

  test("U4 golden replay: K=4 (A) report inits split jointly-captured mass and land on finals") {
    // Harder dynamics pinned on purpose: under the report's K=4 (A) inits
    // (BASELINE.md row 3) the (16,3) seed captures BOTH the A and D golden
    // clusters and the (9,3) seed captures only one D outrider, so
    // convergence REQUIRES the migration step (the (9,3) centroid walks
    // right and takes the D mass from (16,3) on iteration 2). Weights are
    // engineered: 10 A-points dominate the shared cell's mean so the D
    // points are closer to the migrating centroid than to it. A fixture
    // that merely plants blobs at the goldens cannot pass this test — it
    // fails if the argmin tie-break, the mean update, or the convergence
    // comparison drift from the reference contract.
    val a = Seq.fill(5)((19.26, 3.266)) ++ Seq.fill(5)((18.66, 3.266)) // mean (18.96, 3.266)
    val b = Seq((8.82, 1.12), (8.22, 1.72))                           // mean (8.52, 1.42)
    val c = Seq((11.27, 4.91), (10.67, 4.91))                         // mean (10.97, 4.91)
    val d = Seq((12.45, 1.68), (15.39, 1.68), (15.39, 1.68))          // mean (14.41, 1.68)
    val pts = (a ++ b ++ c ++ d).toDF("hour", "dow")
    val init = Array(Array(9.0, 6.0), Array(7.0, 1.0), Array(9.0, 3.0), Array(16.0, 3.0))
    val golden = Seq((8.52, 1.42), (10.97, 4.91), (14.41, 1.68), (18.96, 3.266))
    val res = KMeansMR.fit(pts, Seq("hour", "dow"), init, maxIter = 10)
    assert(res.converged, s"did not converge: ${res.centroids.map(_.toSeq).toSeq}")
    assert(res.centroids.length === 4, "no cluster may starve in this fixture")
    val got = res.centroids.map(cc => (cc(0), cc(1))).sortBy(_._1).toSeq
    got.zip(golden).foreach { case ((gx, gy), (ex, ey)) =>
      assert(math.abs(gx - ex) < 1e-2 && math.abs(gy - ey) < 1e-2,
        s"centroid ($gx,$gy) drifted from golden ($ex,$ey): $got")
    }
    // same fixture through the RDD MapReduce form must agree exactly
    val rdd = KMeansRDD.fit(pts, Seq("hour", "dow"), init, maxIter = 10)
    assert(rdd.centroids.map(_.toSeq).toSeq === res.centroids.map(_.toSeq).toSeq)
  }

  test("U5: full elbow sweep on the fixture returns k in [2,12) and WCSS==trainingCost") {
    val sweep = Elbow.sweep(preprocessed, Seq("order_hour_of_day"), ks = 2 until 12)
    sweep.foreach(p => assert(
      math.abs(p.wcss - p.trainingCost) / math.max(p.trainingCost, 1e-9) < 1e-6))
    val k = Elbow.elbowK(sweep.map(_.wcss))
    assert(k >= 2 && k < 12)
  }
}
