package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import java.nio.file.Files

class EventsStreamSpec extends SparkSpec {
  import spark.implicits._

  /** Stage the batch events as a stream-source directory. Goes through
    * Tables.events (not a raw parquet read) so `ts` is staged as Long NANOS
    * regardless of which dataset generation shipped the source — readEvents
    * declares ts: LongType nanos, and a raw micros-generation file would
    * otherwise scan its micros straight into that column (1970-era windows).
    */
  private lazy val streamDir: String = {
    val dir = Files.createTempDirectory("graft_stream").toString
    graft.Tables.events(spark, sf("sf0.001"))
      .select($"event_id", $"ts_ns".as("ts"), $"user_id",
        $"event_type", $"value", $"props")
      .repartition(3) // several files → several micro-batch splits
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("windowed counts over the stream equal the batch groupBy") {
    val stream = EventsStream.readEvents(spark, streamDir)
    val q = EventsStream.runToMemory(
      EventsStream.windowedCounts(stream), "win_counts", OutputMode.Complete())
    try {
      val streamed = spark.table("win_counts")
        .select("window_start", "event_type", "n_events")
        .as[(java.sql.Timestamp, String, Long)].collect().toSet
      val batch = graft.Tables.events(spark, sf("sf0.001"))
        .groupBy(date_trunc("minute", $"ts").as("window_start"), $"event_type")
        .agg(count(lit(1)).as("n_events"))
        .as[(java.sql.Timestamp, String, Long)].collect().toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("sessionTotals maintains per-user running state across micro-batches") {
    val stream = EventsStream.readEvents(spark, streamDir)
    val q = EventsStream.runToMemory(
      EventsStream.sessionTotals(stream).toDF(), "sessions", OutputMode.Update())
    try {
      // the memory sink holds one row per (user, micro-batch) update;
      // the LAST update per user must equal the batch totals
      val batch = graft.Tables.events(spark, sf("sf0.001"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"), sum($"value").as("total_value"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      val finals = spark.table("sessions")
        .groupBy($"user_id")
        .agg(max($"n_events").as("n_events"), max($"total_value").as("tv"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(finals.keySet === batch.keySet)
      finals.foreach { case (u, (n, tv)) =>
        assert(n === batch(u)._1, s"user $u count")
        assert(math.abs(tv - batch(u)._2) < 1e-6, s"user $u total")
      }
    } finally q.stop()
  }

  test("session windows over the stream equal the batch session_window") {
    val stream = EventsStream.readEvents(spark, streamDir)
      .withWatermark("ts", "10 minutes")
    val streamedSessions = stream
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"))
    val q = EventsStream.runToMemory(streamedSessions, "sess_win", OutputMode.Complete())
    try {
      val streamed = spark.table("sess_win")
        .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long)].collect().toSet
      val batch = EventsStream.sessionWindows(
          graft.Tables.events(spark, sf("sf0.001")))
        .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long)].collect().toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("q44 multi-batch: >=5 micro-batches, late row dropped, equals batch") {
    val (df, q) = EventsStream.windowedCountsMultiBatch(spark, sf("sf0.001"))
    try {
      val streamed = df.select("window_start", "event_type", "n_events")
        .as[(java.sql.Timestamp, String, Long)].collect().toSet
      assert(!streamed.exists(_._2 == "__late"), "planted late row leaked past the watermark")
      val batch = graft.Tables.events(spark, sf("sf0.001"))
        .groupBy(date_trunc("minute", $"ts").as("window_start"), $"event_type")
        .agg(count(lit(1)).as("n_events"))
        .as[(java.sql.Timestamp, String, Long)].collect().toSet
      assert(streamed === batch)
      assert(q.lastProgress.batchId >= 4,
        s"expected >=5 micro-batches, got batchId ${q.lastProgress.batchId}")
    } finally q.stop()
  }

  test("flatMapGroupsWithState milestones: each crossing emitted exactly once, equals batch") {
    val got = EventsStream.milestoneCountsBounded(spark, sf("sf0.001"))
      .as[(Long, Long)].collect().toMap
    val batch = graft.Tables.events(spark, sf("sf0.001"))
      .groupBy($"user_id")
      .agg(floor(sum($"value".cast("decimal(18,2)")) / 100).cast("long").as("n"))
      .filter($"n" >= 1)
      .as[(Long, Long)].collect().toMap
    assert(got === batch)
  }

  test("checkpoint restart: dedup state + watermark survive; final windows equal batch") {
    // the failure-recovery half of exactly-once: incarnation 1 drains two
    // chunk files and stops at a durable checkpoint; incarnation 2 starts
    // from it after the remaining chunks (incl. the planted late + flush
    // rows) arrive. Broken state restore double-counts replayed rows; a
    // reset watermark re-admits the late row — both flip this equality.
    val df = EventsStream.dedupedWindowedCountsRestart(spark, sf("sf0.001"))
    val streamed = df.select("window_start", "event_type", "n_events", "sum_value")
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
    assert(!streamed.exists(_._2 == "__late"),
      "planted late row leaked past the restarted watermark")
    val batch = graft.Tables.events(spark, sf("sf0.001"))
      .groupBy(date_trunc("minute", $"ts").as("window_start"), $"event_type")
      .agg(count(lit(1)).as("n_events"),
        sum($"value".cast("decimal(18,2)")).cast("double").as("sum_value"))
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
    assert(streamed === batch)
  }

  test("stream-stream interval join equals the batch theta join (cross-batch state buffering)") {
    val got = EventsStream.clickPurchaseJoinBounded(spark, sf("sf0.001"))
      .as[(Long, Long)].collect().toMap
    val e = graft.Tables.events(spark, sf("sf0.001"))
    val c = e.filter($"event_type" === "click").select($"user_id", $"ts".as("cts"))
    val p = e.filter($"event_type" === "purchase")
      .select($"user_id".as("pu"), $"ts".as("pts"))
    val batch = c.join(p, $"user_id" === $"pu" &&
        $"pts" >= $"cts" && $"pts" <= $"cts" + expr("INTERVAL 6 HOURS"))
      .groupBy($"user_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(got === batch)
    assert(batch.values.sum > 0, "fixture produced no pairs — join untested")
  }

  test("left-outer stream join: null rows emit exactly for watermark-expired unmatched clicks") {
    val got = EventsStream.clickPurchaseLeftOuterBounded(spark, sf("sf0.001"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val e = graft.Tables.events(spark, sf("sf0.001"))
    val c = e.filter($"event_type" === "click")
      .select($"user_id", $"event_id".as("click_id"), $"ts".as("cts"))
    val p = e.filter($"event_type" === "purchase")
      .select($"user_id".as("pu"), $"ts".as("pts"))
    val bandCond = $"user_id" === $"pu" &&
      $"pts" >= $"cts" && $"pts" <= $"cts" + expr("INTERVAL 6 HOURS")
    val matched = c.join(p, bandCond)
      .groupBy($"user_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    // emission boundary for the null half: final watermark = flush sentinel
    // (corpus max + 2h) minus the 10min delay; a click expires once its
    // whole 6h band is below it (micros-exact timestamp arithmetic)
    val bDf = e.agg((max($"ts") + expr("INTERVAL 2 HOURS")
      - expr("INTERVAL 10 MINUTES")).as("b"))
    val expired = c.join(p, bandCond, "left_anti")
      .crossJoin(bDf)
      .filter($"cts" + expr("INTERVAL 6 HOURS") < $"b")
      .groupBy($"user_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    val users = (matched.keySet ++ expired.keySet)
    val want = users.map(u =>
      u -> (matched.getOrElse(u, 0L), expired.getOrElse(u, 0L))).toMap
    assert(got === want)
    assert(expired.values.sum > 0, "no click expired — the outer half is untested")
    assert(matched.values.sum > 0, "no pair matched — the inner half is untested")
  }

  test("upsert sink: final snapshot equals the chunking-independent per-user argmax") {
    val got = EventsStream.upsertLatestBounded(spark, sf("sf0.001"))
      .select($"user_id", $"last_event_id").as[(Long, Long)].collect().toMap
    val want = graft.Tables.events(spark, sf("sf0.001"))
      .groupBy($"user_id")
      .agg(max(struct($"ts", $"event_id")).as("m"))
      .select($"user_id", $"m.event_id").as[(Long, Long)].collect().toMap
    assert(got === want)
    assert(want.nonEmpty, "no users — upsert untested")
  }

  test("milestone GroupState survives a checkpoint restart: no re-emitted or lost crossings") {
    val got = EventsStream.milestoneCountsRestart(spark, sf("sf0.001"))
      .as[(Long, Long)].collect().toMap
    val batch = graft.Tables.events(spark, sf("sf0.001"))
      .groupBy($"user_id")
      .agg(floor(sum($"value".cast("decimal(18,2)")) / 100).cast("long").as("n"))
      .filter($"n" >= 1)
      .as[(Long, Long)].collect().toMap
    assert(got === batch)
  }

  test("late data beyond the watermark is dropped from append-mode windows") {
    // append-mode with watermark only emits finalized windows; a query on a
    // bounded file source emits nothing until watermark advances past window
    // end — assert the query runs and the sink table exists (plumbing check)
    val stream = EventsStream.readEvents(spark, streamDir)
    val q = EventsStream.runToMemory(
      EventsStream.windowedCounts(stream), "win_append", OutputMode.Append())
    try {
      assert(spark.table("win_append").columns.toSeq ===
        Seq("window_start", "window_end", "event_type", "n_events", "sum_value"))
    } finally q.stop()
  }
}
