package graft.segmentation

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end drivers wiring the reference's three entry points together
  * (SURVEY §3): Q1 preprocessing → Q2 hand-rolled K-means → Q3 elbow sweep,
  * plus the A4 2-D histogram the notebook computes driver-side with
  * matplotlib (codeText.txt:221 etc.) — here a distributed groupBy instead.
  *
  * TESTDATA has no Instacart CSV, so [[ordersFeatures]] derives the same
  * shape — (hour-of-day, day-of-week, department-ish id) — from the `events`
  * table, whose `ts` carries real intraday times (`orders.o_orderdate` is
  * date-only, which would degenerate the hour dimension). The operators
  * exercised are identical (P3/P4/P6 recodes, O1/O2 sampling, U4 K-means).
  */
object Pipelines {

  /** Q1-shaped preprocessing over TESTDATA events: derive dow/hour, bucket
    * and decode them with the reference's recodes.
    */
  def ordersFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    val events = graft.Tables.events(spark, sfDir)
    val withDims = events
      .withColumn("order_dow", (dayofweek(col("ts")) - lit(1)).cast("int"))
      .withColumn("order_hour_of_day", hour(col("ts")).cast("int"))
      .withColumn("department_id", pmod(col("user_id"), lit(21)).cast("int") + lit(1))
    Recode.withDayName(Recode.withDowBucket(withDims))
  }

  /** Q2: the full reference K-means on (hour, dow) with seeded random init. */
  def segment(spark: SparkSession, sfDir: String, k: Int = 4, maxIter: Int = 10,
              seed: Long = 42L): KMeansResult = {
    val feats = ordersFeatures(spark, sfDir)
    KMeansMR.fitRandomInit(feats, Seq("order_hour_of_day", "order_dow"), k, maxIter, seed)
  }

  /** A4: 2-D histogram as a distributed aggregation (bins of width xw/yw). */
  def histogram2d(df: DataFrame, x: String, y: String,
                  xw: Double = 1.0, yw: Double = 1.0): DataFrame =
    df.filter(col(x).isNotNull && col(y).isNotNull)
      .groupBy(
        floor(col(x).cast("double") / xw).cast("long").as("x_bin"),
        floor(col(y).cast("double") / yw).cast("long").as("y_bin"))
      .agg(count(lit(1)).as("cnt"))

  /** CLI driver: run the whole workflow against an sf dir and print results.
    * Usage: runMain graft.segmentation.Pipelines [sfDir]
    */
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.Sessions.local("graft-pipelines")
    try {
      val feats = ordersFeatures(spark, sfDir).persist()
      println(s"[pipelines] features rows=${feats.count()} from $sfDir")
      feats.select("order_dow", "days", "order_dow_updated", "order_hour_of_day")
        .show(5, truncate = false)

      val hist = histogram2d(feats, "order_hour_of_day", "order_dow")
      println(s"[pipelines] histogram2d bins=${hist.count()}")
      hist.orderBy(desc("cnt")).show(5)

      val res = segment(spark, sfDir)
      println(s"[pipelines] kmeans k=4: converged=${res.converged} iters=${res.iterations}")
      res.centroids.foreach(c => println(f"  centroid (${c(0)}%.3f, ${c(1)}%.3f)"))

      val sweep = Elbow.sweep(feats, Seq("order_hour_of_day"), ks = 2 until 8)
      sweep.foreach(p => println(f"  k=${p.k} wcss=${p.wcss}%.2f trainingCost=${p.trainingCost}%.2f"))
      println(s"[pipelines] elbow k* = ${Elbow.elbowK(sweep.map(_.wcss))}")
      feats.unpersist()
      ()
    } finally spark.stop()
  }
}
