package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class RollingWindowSpec extends SparkSpec {
  import spark.implicits._

  private val NanosPerDay = 86400L * 1000000000L

  /** Synthetic events: deterministic, dense enough to chunk, with a part
    * that skips a whole day (chunk-id hole) and a sparse part that must
    * fall back inside the width chooser's interior rule.
    */
  private lazy val synth: DataFrame = {
    val rows = for {
      part <- Seq("a", "b", "c")
      day <- 0 until 20
      if !(part == "b" && day == 7) // hole: b has no day 7
      // c's FIRST day holds fewer than k-1 rows: its whole content is the
      // carry into day 1, exercising the short-first-chunk proof branch
      i <- 0 until (if (part == "b") 60 else if (part == "c" && day == 0) 5 else 100)
    } yield {
      val tsNs = day * NanosPerDay + i * 1000000L
      val id = (day.toLong << 20) + i +
        (if (part == "b") 1 << 19 else if (part == "c") 1 << 18 else 0)
      (part, id, tsNs, new java.sql.Timestamp(tsNs / 1000000L), (id * 37 % 1000))
    }
    rows.toDF("p", "id", "ts_ns", "ts", "v")
  }

  private def naive(df: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("p")).orderBy(col("ts"), col("id"))
      .rowsBetween(-(k - 1), 0)
    df.withColumn("n", count(lit(1)).over(w))
      .withColumn("sm", sum(col("v")).over(w))
      .withColumn("sq", sum(col("v") * col("v")).over(w))
  }

  private def collectKeyed(df: DataFrame): Map[(String, Long), (Long, Long, Long)] =
    df.select("p", "id", "n", "sm", "sq").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap

  test("chunked trailing moments are bit-identical to the single-task window") {
    val k = 50
    val got = collectKeyed(RollingWindow.trailingMoments(
      synth, "p", "ts", "id", "ts_ns", "v", k))
    val want = collectKeyed(naive(synth, k))
    assert(got.size === want.size)
    assert(got === want)
  }

  test("the split actually engages: width 1 day, rows preserved exactly once") {
    // synthetic spans 20 days at >=60 rows/day vs k-1=49: width 1 day is
    // valid, so the (part, chunk) window space is ~2x20 — far above the 2
    // single-task partitions of the naive plan. The chooser is
    // deterministic; pin its decision, and prove no row is lost or
    // duplicated by the carry/drop cycle.
    val dayCounts = synth.groupBy(col("p"), floor(col("ts_ns") / NanosPerDay).cast("long"))
      .count().collect().map(r => (r.get(0), r.getLong(1), r.getLong(2))).toSeq
    assert(RollingWindow.chooseWidthDays(dayCounts, 50) === 1L)
    val out = RollingWindow.trailingMoments(synth, "p", "ts", "id", "ts_ns", "v", 50)
    assert(out.count() === synth.count())
    assert(out.select("p", "id").distinct().count() === synth.count())
  }

  test("width chooser: sparse interior days force doubling; hopeless data falls back") {
    // part x: interior day with 3 rows at width 1 -> doubled widths merge it
    val sparse = Seq[(Any, Long, Long)](
      ("x", 0L, 100L), ("x", 1L, 3L), ("x", 2L, 100L), ("x", 3L, 100L))
    val w = RollingWindow.chooseWidthDays(sparse, 50)
    assert(w > 1L)
    // merging at width w must leave every interior chunk >= k-1
    val merged = sparse.groupBy(t => Math.floorDiv(t._2, w))
      .view.mapValues(_.map(_._3).sum).toSeq.sortBy(_._1)
    assert(merged.drop(1).dropRight(1).forall(_._2 >= 49L))
    // everything-sparse STILL splits: a 2-chunk cut is always exact (the
    // first chunk carries everything it has; nothing exists before it),
    // so the chooser converges to the width that leaves no interior chunk
    // rather than giving up
    val thin = Seq[(Any, Long, Long)](
      ("x", 0L, 2L), ("x", 1L, 2L), ("x", 2L, 2L), ("x", 3L, 2L))
    assert(RollingWindow.chooseWidthDays(thin, 50) === 2L)
    // single populated day: nothing to split -> fallback 0
    val oneDay = Seq[(Any, Long, Long)](("x", 0L, 500L))
    assert(RollingWindow.chooseWidthDays(oneDay, 50) === 0L)
  }

  test("fallback (width 0) still equals the naive window on real sparse data") {
    val ev = graft.Tables.events(spark, sf("sf0.001"))
      .select(col("event_type").as("p"), col("event_id").as("id"),
        col("ts_ns"), col("ts"),
        round(col("value") * 100).cast("long").as("v"))
    val k = 100
    val got = collectKeyed(RollingWindow.trailingMoments(
      ev, "p", "ts", "id", "ts_ns", "v", k))
    val want = collectKeyed(naive(ev, k))
    assert(got === want)
  }

  test("high-cardinality partCol fails fast at the probe, not the collect") {
    // 50k distinct partition keys x 1 day = 50k probe groups against a
    // 1000-group bound: the guard must reject BEFORE materializing the
    // unbounded (part, day) table driver-side
    val wide = spark.range(50000).selectExpr(
      "CAST(id AS STRING) AS p", "id",
      "id * 1000000L AS ts_ns",
      "CAST(timestamp_micros(id * 1000) AS TIMESTAMP) AS ts",
      "id % 7 AS v")
    val e = intercept[IllegalArgumentException] {
      RollingWindow.trailingMoments(wide, "p", "ts", "id", "ts_ns", "v",
        k = 10, maxProbeGroups = 1000)
    }
    assert(e.getMessage.contains("high-cardinality"))
  }
}
