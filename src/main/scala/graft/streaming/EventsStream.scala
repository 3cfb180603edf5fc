package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming surface over the `events` table shape: file-source
  * read, watermarked tumbling-window aggregation, and custom sessionization
  * state via mapGroupsWithState.
  *
  * The reference has no streaming (SURVEY §2.8) — this is the §7 extension
  * path. Scale notes: the windowed aggregate is keyed state bounded by the
  * watermark (late data beyond 10 minutes is dropped, state for closed
  * windows is evicted); sessionization state is per-user and O(1) per key.
  */
object EventsStream {

  /** events schema as scanned with nanosAsLong (ts arrives as Long nanos). */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream from a directory of events parquet files, with the
    * same nanos→micros conversion the batch path uses (Tables.events).
    */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(rawSchema)
      .parquet(dir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))

  /** Watermarked tumbling-window aggregation: per (1-minute window,
    * event_type) counts and value sums. The value sum goes through
    * DECIMAL(18,2) so micro-batch arrival order cannot perturb the double
    * result (same cross-engine parity rule as the batch operators).
    */
  def windowedCounts(events: DataFrame, window_ : String = "1 minute",
                     watermark: String = "10 minutes"): DataFrame =
    windowedAgg(events.withWatermark("ts", watermark), window_)

  /** The windowed aggregation alone — for inputs that already carry a
    * watermark (e.g. downstream of dropDuplicatesWithinWatermark, where
    * re-declaring one is disallowed).
    */
  def windowedAgg(events: DataFrame, window_ : String = "1 minute"): DataFrame =
    events
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Batch-stage + stream + drain: copy the sf dir's events parquet into a
    * temp stream-source directory (several files → several micro-batches),
    * run [[windowedCounts]] through a memory sink to completion, and return
    * the final result as a DataFrame. This is the bounded-input form the
    * correctness harness can oracle-check against a plain batch GROUP BY.
    */
  def windowedCountsBounded(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = stagedEventsDir(spark, sfDir)
    val name = "stream_q_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = runToMemory(windowedCounts(readEvents(spark, dir)), name,
      OutputMode.Complete())
    q.stop()
    spark.table(name)
      .orderBy(col("window_start"), col("event_type"))
  }

  /** Exactly-once streaming ingestion: every input row arrives TWICE (the
    * staged copy duplicates the events), `dropDuplicatesWithinWatermark`
    * keyed by event_id removes the replays with watermark-bounded state,
    * and the windowed aggregation downstream must equal the batch GROUP BY
    * over the original single-copy events — which is exactly how the
    * harness oracle-checks it (same SQL as the q44 windows).
    *
    * The bounded drain processes one batch (events are not time-ordered
    * across files, so a multi-batch read would hit watermark late-drops and
    * make the result depend on file order — same reason q44 drains in one
    * batch); the dedup state API and eviction contract are identical either
    * way.
    */
  def dedupedWindowedCountsBounded(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = stagedDuplicatedEventsDir(spark, sfDir)
    val deduped = readEvents(spark, dir)
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
    val name = "stream_dq_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = runToMemory(windowedAgg(deduped), name, OutputMode.Complete())
    q.stop()
    spark.table(name)
      .orderBy(col("window_start"), col("event_type"))
  }

  /** Events staged with every row duplicated (4 round-robin files).
    * Deterministic path + _SUCCESS guard like the other fixtures.
    */
  private def stagedDuplicatedEventsDir(spark: SparkSession, sfDir: String): String = {
    val key = java.lang.Integer.toHexString(sfDir.hashCode)
    val dir = java.nio.file.Paths.get(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"), s"graft_stream_dup_events_$key")
    if (!java.nio.file.Files.exists(dir.resolve("_SUCCESS"))) {
      val base = graft.Tables.events(spark, sfDir)
        .select(col("event_id"), col("ts_ns").as("ts"), col("user_id"),
          col("event_type"), col("value"), col("props"))
      base.unionByName(base)
        .repartition(4)
        .write.mode("overwrite").parquet(dir.toString)
    }
    dir.toString
  }

  /** Stage the sf dir's single-file events parquet as a 3-file stream-source
    * directory, at a DETERMINISTIC path keyed by the source dir — staged once
    * and reused by every later call (and every later JVM sharing /tmp), so
    * repeat q44 runs pay zero staging I/O and /tmp no longer accretes a fresh
    * copy per call. `_SUCCESS` marks a completed write.
    */
  private def stagedEventsDir(spark: SparkSession, sfDir: String): String = {
    val key = java.lang.Integer.toHexString(sfDir.hashCode)
    val dir = java.nio.file.Paths.get(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"), s"graft_stream_events_$key")
    if (!java.nio.file.Files.exists(dir.resolve("_SUCCESS"))) {
      graft.Tables.events(spark, sfDir)
        .select(col("event_id"), col("ts_ns").as("ts"), col("user_id"),
          col("event_type"), col("value"), col("props"))
        .repartition(3)
        .write.mode("overwrite").parquet(dir.toString)
    }
    dir.toString
  }

  /** Gap-based session windows per user — the built-in `session_window`
    * operator (the same expression drives streaming sessionization with a
    * watermark; here in batch form so the correctness harness can oracle it
    * against SQL island detection). Window end = last event + gap. One
    * shuffle keyed by (user, session), merge-sorted state per key.
    */
  def sessionWindows(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("w.start").as("session_start"),
        col("w.end").as("session_end"),
        col("n_events"))
      .orderBy(col("user_id"), col("session_start"))

  final case class SessionUpdate(user_id: Long, n_events: Long, total_value: Double)
  final case class SessionState(n: Long, total: Double)

  /** Custom stateful op: running per-user session totals via
    * mapGroupsWithState (the KeyValueGroupedDataset state API).
    */
  def sessionTotals(events: DataFrame): Dataset[SessionUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("value"))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Double)], state: GroupState[SessionState]) =>
          val prev = state.getOption.getOrElse(SessionState(0L, 0.0))
          var n = prev.n
          var tot = prev.total
          rows.foreach { case (_, v) => n += 1; tot += v }
          state.update(SessionState(n, tot))
          SessionUpdate(user, n, tot)
      }
  }

  /** Run a streaming query to a named in-memory sink and process everything
    * currently available (the synchronous local smoke path).
    */
  def runToMemory(df: DataFrame, name: String, mode: OutputMode): StreamingQuery = {
    val q = df.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(name)
      .trigger(Trigger.ProcessingTime(0))
      .start()
    q.processAllAvailable()
    q
  }
}
