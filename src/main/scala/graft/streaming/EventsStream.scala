package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
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

  /** File stream over a staged fixture dir — the shared scan recipe for
    * every bounded drain (ts stays raw Long nanos; callers convert or
    * filter as their query needs).
    *
    * `filesPerTrigger` is DRAIN MECHANICS, not chunk semantics: the staged
    * chunk files (and therefore which rows arrive together relative to the
    * late/flush sentinels) are fixed by [[stagedTimeOrderedEventsDir]];
    * this knob only sets how many of those files one micro-batch drains
    * (0 = everything available in one batch). Each micro-batch costs one
    * incremental-planning pass plus one state-store commit per stateful
    * operator per state partition, so drains whose RESULT is provably
    * batch-count-independent (complete-mode aggregates, argmax upserts,
    * interval joins whose oracle is the batch theta join, append windows
    * finalized by the final watermark) coalesce to fewer, larger batches
    * — the guide §5 driver-overhead cut. Drains whose oracle or spec PINS
    * the per-file batching (q44's >=5-batch contract, q62's same-batch
    * dedup demonstration, q111's tercile update history, the restart
    * proofs) keep 1.
    *
    * The append-mode WINDOWED drains (q44/q62/q102/q110) also keep 1, for
    * a measured reason: they leave '__late' unfiltered so the watermark
    * late-DROP is asserted end-to-end by row count, and Spark filters late
    * records with the PREVIOUS batch's watermark while evicting with the
    * current one (the SPARK-40925 two-watermark semantics) — under
    * [0,1,2],[late,flush] coalescing the late row's late-filter watermark
    * is still 1970, so it enters state and the eviction pass EMITS its
    * window (observed at sf0.01: one extra '__late' row). The late file
    * must arrive >= 2 batches after the real chunks, which per-file
    * batching provides. Sentinel-filtering drains are immune (the late
    * row never reaches their stateful op), as are the interval joins
    * (late is neither a click nor a purchase).
    */
  private def chunkedStream(spark: SparkSession, dir: String,
                            filesPerTrigger: Int = 1): DataFrame = {
    val reader = spark.readStream.schema(rawSchema)
    if (filesPerTrigger > 0) reader.option("maxFilesPerTrigger", filesPerTrigger)
    reader.parquet(dir)
  }

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

  /** Sliding-window aggregation (10-minute windows every 5 minutes): each
    * event lands in exactly two overlapping windows — the structural 2x row
    * multiplier is confined to the map side of ONE aggregation (Spark
    * expands the window memberships before the partial agg, so the shuffle
    * carries per-(window, type) partials, never duplicated events). Same
    * staged multi-batch drain, watermark eviction, and late/flush scheme as
    * [[windowedCountsMultiBatch]]; the batch oracle replays the two-window
    * membership rule row-by-row.
    */
  def slidingWindowedCountsBounded(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = stagedTimeOrderedEventsDir(spark, sfDir)
    // 1 file/trigger is PINNED here (round-17 coalescing finding): this
    // drain keeps '__late' unfiltered so the late-DROP is asserted
    // end-to-end by row count — and Spark filters late records with the
    // PREVIOUS batch's watermark while evicting with the current one (the
    // SPARK-40925 two-watermark semantics), so any coalescing that moves
    // the late file into batch <= 1 makes its late-filter watermark 1970
    // and the row leaks (measured: [0,1,2],[late,flush] emitted the late
    // window). The late row must arrive >= 2 batches after real data —
    // exactly what per-file batching provides.
    val stream = chunkedStream(spark, dir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    val agg = stream.withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n_events"), col("sum_value"))
    val name = "stream_sw_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = runToMemory(agg, name, OutputMode.Append(), statePartitions = Some(8))
    q.stop()
    spark.table(name)
      .filter(col("event_type") =!= "__flush")
      .orderBy(col("window_start"), col("event_type"))
  }

  private def rmTreeAll(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (java.nio.file.Files.exists(p)) {
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(f => java.nio.file.Files.deleteIfExists(f))
      ()
    }
  }

  /** UPDATE output mode — the third emission semantics beside append
    * (q44/q110) and complete (q89/q109): only keys whose aggregate CHANGED
    * in a micro-batch are emitted, the emission granularity a dashboard
    * sink wants. Under the fixed five-chunk staging the update history is
    * deterministic: every real event type changes in exactly the three
    * tercile batches (the late/flush batches carry no real types), so the
    * drained sink holds exactly 3 update rows per type whose MAX equals
    * the batch-exact count — both facts the oracle pins.
    */
  def updateModeCountsBounded(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = stagedTimeOrderedEventsDir(spark, sfDir)
    // 1 file/trigger is PINNED here: the oracle derives n_updates from
    // tercile-batch membership, so the per-file batching IS the semantics
    val stream = chunkedStream(spark, dir).select(col("event_type"))
    val agg = stream.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val name = "stream_upd_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = runToMemory(agg, name, OutputMode.Update(), statePartitions = Some(8))
    q.stop()
    spark.table(name)
      .filter(!col("event_type").startsWith("__"))
      .groupBy(col("event_type"))
      .agg(max(col("n")).as("n_events"), count(lit(1)).as("n_updates"))
      .orderBy(col("event_type"))
  }

  /** The production streaming sink: append-mode windowed counts written to
    * a parquet FILE sink whose `_spark_metadata` commit log is what makes
    * the sink exactly-once (a task that dies after writing a file but
    * before the commit leaves an orphan the log never references, and the
    * read side lists files FROM THE LOG, not the directory). The drained
    * read-back must equal the batch windows — same oracle as q44. The
    * output dir is deterministic per sf dir and cleared at call start, so
    * repeated bench/verify runs hold one copy on disk, never an
    * accumulation.
    */
  def windowedCountsToFileSink(spark: SparkSession, sfDir: String): DataFrame = {
    val srcDir = stagedTimeOrderedEventsDir(spark, sfDir)
    val key = graft.FixtureKey(sfDir)
    val root = java.nio.file.Paths.get(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"), s"graft_stream_fsink_$key")
    rmTreeAll(root)
    val out = root.resolve("out").toString
    val ckpt = root.resolve("ckpt").toString
    // 1 file/trigger PINNED — same reason as slidingWindowedCountsBounded:
    // '__late' is unfiltered here by design (late-drop gated end-to-end),
    // and the SPARK-40925 late-filter watermark lags one batch, so
    // coalescing the late file into batch <= 1 leaks it (measured)
    val stream = chunkedStream(spark, srcDir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    val q = startWithShufflePartitions(spark, 8) {
      windowedCounts(stream).writeStream
        .outputMode(OutputMode.Append())
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.ProcessingTime(0))
        .start()
    }
    q.processAllAvailable()
    q.stop()
    spark.read.parquet(out)
      .filter(col("event_type") =!= "__flush")
      .orderBy(col("window_start"), col("event_type"))
  }

  /** Mergeable sketch INSIDE a streaming aggregation: per-type distinct
    * users via the HLL aggregator in complete mode — the state store holds
    * the 4 KiB registers per group and merges each micro-batch into them,
    * exactly how a 100 TB stream keeps approximate cardinalities without
    * per-key distinct state. Drained estimate is gated within 5% of the
    * batch-exact count (q45's TRUE-gate, p=12 ≈ 1.6% se), alongside exact
    * event counts the oracle reproduces.
    */
  def hllDistinctUsersBounded(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = stagedTimeOrderedEventsDir(spark, sfDir)
    // complete-mode aggregate: the drained table is the final state whatever
    // the batching (HLL register merge is commutative/associative), so the
    // whole fixture drains in ONE batch — one planning pass, one commit
    val stream = chunkedStream(spark, dir, filesPerTrigger = 0)
      .filter(!col("event_type").startsWith("__"))
      .select(col("event_type"), col("user_id"))
    val agg = stream.groupBy(col("event_type"))
      .agg(graft.functions.HyperLogLog.hllDistinct(col("user_id")).as("hll_estimate"),
        count(lit(1)).as("n_events"))
    val name = "stream_hll_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = runToMemory(agg, name, OutputMode.Complete(), statePartitions = Some(8))
    q.stop()
    val exact = graft.Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact"))
    spark.table(name).join(exact, Seq("event_type"))
      .select(col("event_type"), col("n_events"),
        (abs(col("hll_estimate").cast("double") / col("exact").cast("double") - 1.0)
          <= 0.05).as("within_tolerance"))
      .orderBy(col("event_type"))
  }

  /** CDC-style keyed UPSERT sink via foreachBatch: each micro-batch MERGES
    * into a keyed parquet table — unseen users insert, seen users update to
    * the latest (ts, event_id) version — the lakehouse merge pattern built
    * from primitives (no Delta/Iceberg in this environment). Idempotence
    * under batch replay comes from versioned snapshots: batch b overwrites
    * `v<b>` derived from the latest `v<b'<b>`, so re-running a batch after
    * a failure rewrites the same snapshot instead of double-applying it
    * (the same `batch=<id>` overwrite rule as the restart sinks). The final
    * snapshot must equal the batch argmax per user over (ts, event_id) —
    * independent of how the stream was chunked into batches, which is what
    * the oracle checks. At scale the per-batch merge cost is one keyed
    * join/agg of (table ∪ batch); the table carries ONE row per key, never
    * history.
    */
  def upsertLatestBounded(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = stagedTimeOrderedEventsDir(spark, sfDir)
    // deterministic per-sf dir, cleared at call start (q110's bounded-disk
    // rule): the final snapshot stays on storage and is returned as a LAZY
    // scan — no driver materialization of the table at any size
    val key = graft.FixtureKey(sfDir)
    val work = java.nio.file.Paths.get(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"), s"graft_upsert_$key")
    rmTreeAll(work)
    val tableDir = work.resolve("table")
    java.nio.file.Files.createDirectories(tableDir)
    def versions(): Seq[Long] = {
      val fs = tableDir.toFile.listFiles()
      if (fs == null) Seq.empty
      else fs.toSeq.filter(f => f.isDirectory && f.getName.startsWith("v"))
        .map(_.getName.drop(1).toLong).sorted
    }
    val pick = max(struct(col("ts"), col("event_id"), col("event_type"),
      col("value"))).as("m")
    def latestOf(df: DataFrame): DataFrame =
      df.groupBy(col("user_id")).agg(pick)
        .select(col("user_id"), col("m.ts").as("ts"),
          col("m.event_id").as("event_id"),
          col("m.event_type").as("event_type"), col("m.value").as("value"))
    // the snapshot is the argmax per user over EVERYTHING drained —
    // chunking-independent by the oracle's own statement — so the merge
    // runs once over one coalesced batch instead of once per chunk file
    val stream = chunkedStream(spark, dir, filesPerTrigger = 0)
      .filter(!col("event_type").startsWith("__"))
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts"),
        col("value"))
    val q = stream.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", work.resolve("ckpt").toString)
      .trigger(Trigger.ProcessingTime(0))
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val prior = versions().filter(_ < id).lastOption
          .map(v => spark.read.parquet(tableDir.resolve(s"v$v").toString))
        val merged = prior match {
          case Some(p) => latestOf(p.unionByName(batch))
          case None => latestOf(batch)
        }
        merged.write.mode("overwrite")
          .parquet(tableDir.resolve(s"v$id").toString)
      }
      .start()
    q.processAllAvailable()
    q.stop()
    val last = versions().last
    // intermediate snapshots + checkpoint go; the final snapshot is kept
    // and scanned lazily
    versions().init.foreach(v => rmTreeAll(tableDir.resolve(s"v$v")))
    rmTreeAll(work.resolve("ckpt"))
    spark.read.parquet(tableDir.resolve(s"v$last").toString)
      .select(col("user_id"), col("event_id").as("last_event_id"),
        col("event_type").as("last_event_type"), col("value").as("last_value"))
      .orderBy(col("user_id"))
  }

  /** Batch-stage + stream + drain with REAL watermark semantics: the events
    * are staged time-ordered across three chunk files plus a planted LATE
    * file and a future FLUSH file (see [[stagedTimeOrderedEventsDir]]), read
    * one file per micro-batch, and aggregated in APPEND mode — so every
    * window is emitted exactly once when the watermark passes it and its
    * state is evicted, exactly the steady-state streaming contract.
    *
    *  - >= 5 micro-batches (one per file; [[windowedCountsMultiBatch]]
    *    exposes the query so tests can assert the batch count);
    *  - the '__late' row arrives two batches after its window closed and
    *    MUST be dropped by the watermark: the batch oracle doesn't contain
    *    it, so if it ever leaks through, the correctness gate fails on row
    *    count — the late-drop path is asserted end-to-end, not just unit-
    *    tested;
    *  - the '__flush' row sits far past the real data so the watermark
    *    passes every real window (its own never-finalized window is
    *    filtered out here).
    */
  def windowedCountsBounded(spark: SparkSession, sfDir: String): DataFrame = {
    val (df, q) = windowedCountsMultiBatch(spark, sfDir)
    q.stop()
    df
  }

  /** [[windowedCountsBounded]] plus the drained query handle (for tests that
    * assert the micro-batch count and progress).
    */
  def windowedCountsMultiBatch(spark: SparkSession,
                               sfDir: String): (DataFrame, StreamingQuery) = {
    val dir = stagedTimeOrderedEventsDir(spark, sfDir)
    val stream = chunkedStream(spark, dir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    val name = "stream_q_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = runToMemory(windowedCounts(stream), name, OutputMode.Append(),
      statePartitions = Some(8))
    // '__flush' never finalizes (nothing advances the watermark past it) —
    // filtered defensively. '__late' is deliberately NOT filtered: only the
    // watermark may remove it, so a broken late-drop path surfaces as an
    // extra row the batch oracle doesn't have.
    val df = spark.table(name)
      .filter(col("event_type") =!= "__flush")
      .orderBy(col("window_start"), col("event_type"))
    (df, q)
  }

  /** Exactly-once streaming ingestion: every input row arrives TWICE (the
    * staged copy duplicates the events), `dropDuplicatesWithinWatermark`
    * keyed by event_id removes the replays with watermark-bounded state,
    * and the windowed aggregation downstream must equal the batch GROUP BY
    * over the original single-copy events — which is exactly how the
    * harness oracle-checks it (same SQL as the q44 windows).
    *
    * Multi-batch like q44: the duplicated events are staged TIME-ORDERED
    * (each row and its replay land in the same chunk file, so the replay
    * arrives within the dedup state's watermark), read one file per
    * micro-batch, deduped, and aggregated in APPEND mode — replay removal,
    * watermark eviction, and window finalization all run batch-by-batch
    * with the same late/flush scheme as [[windowedCountsMultiBatch]].
    */
  def dedupedWindowedCountsBounded(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = stagedTimeOrderedEventsDir(spark, sfDir, duplicated = true)
    val stream = chunkedStream(spark, dir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    // project BEFORE the stateful ops: dedup state stores the whole row, so
    // carrying user_id/props (a fat JSON string) through it multiplies the
    // per-batch state checkpoint I/O for columns the aggregation never reads
    val deduped = stream
      .select(col("event_id"), col("ts"), col("event_type"), col("value"))
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
    val name = "stream_dq_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = runToMemory(windowedAgg(deduped), name, OutputMode.Append(),
      statePartitions = Some(8))
    q.stop()
    spark.table(name)
      .filter(col("event_type") =!= "__flush")
      .orderBy(col("window_start"), col("event_type"))
  }

  /** Exactly-once across a RESTART, not just within one run: the duplicated
    * stream runs as TWO query incarnations sharing one file checkpoint and
    * one parquet sink. Incarnation 1 sees only the first two chunk files,
    * drains, and stops — leaving committed offsets, dedup state, and the
    * watermark in the checkpoint. The remaining chunks (including the
    * planted late + flush rows) then "arrive", and incarnation 2 starts
    * from the SAME checkpoint: it must restore the dedup state store and
    * watermark, skip the already-committed batches (the parquet sink's
    * commit log makes replays idempotent), and finalize every window. The
    * final table must equal the batch oracle over single-copy events — the
    * same SQL as q44/q62 — so a broken state restore (replayed rows
    * re-aggregated, watermark reset re-admitting the late row, sink
    * double-writes) flips row counts or sums.
    *
    * Working dirs are fresh per call (the source directory GROWS between
    * incarnations, so the shared `_SUCCESS`-guarded fixture can't be used
    * as the source itself — its chunks are copied in two waves).
    */
  def dedupedWindowedCountsRestart(spark: SparkSession, sfDir: String): DataFrame = {
    val out = runAcrossRestart(spark, sfDir, duplicated = true) { (src, ckpt, outDir) =>
      val stream = chunkedStream(spark, src)
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      val deduped = stream
        .select(col("event_id"), col("ts"), col("event_type"), col("value"))
        .withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark("event_id")
      // the parquet STREAMING sink is replay-idempotent by construction:
      // its _spark_metadata commit log records which files belong to which
      // batch, so a re-executed batch replaces rather than duplicates
      windowedAgg(deduped).writeStream
        .outputMode(OutputMode.Append())
        .format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.ProcessingTime(0))
        .start()
    }
    spark.read.parquet(out)
      .filter(col("event_type") =!= "__flush")
      .orderBy(col("window_start"), col("event_type"))
  }

  /** Stream-stream event-time interval join: each purchase matched to the
    * same user's clicks in the preceding 6 hours. Both sides carry
    * watermarks and the join condition bounds event time in both
    * directions, which is what lets Spark EVICT join state once the
    * watermark passes a row's matchable band — the only form in which a
    * stream-stream join is feasible at 100 TB (unbounded-state joins are
    * rejected by the planner). Self-join of one file-source stream: both
    * scans advance in lockstep (two chunk files per micro-batch — see the
    * coalescing note at `side`), so pairs that straddle the batch boundary
    * prove the cross-batch state buffering.
    * Inner-join results emit as soon as both sides arrive (the watermark
    * governs eviction, not emission); the per-user pair counts are
    * aggregated batch-side from the drained sink and must equal the batch
    * theta join the oracle runs.
    */
  def clickPurchaseJoinBounded(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = stagedTimeOrderedEventsDir(spark, sfDir)
    // 2 files/trigger: the per-user pair counts equal the batch theta join
    // under ANY batching (inner results emit whenever both sides have
    // arrived), so the drain pays 3 micro-batches instead of 5 — while the
    // [0,1] | [2,late] boundary still runs real pairs ACROSS batches, so
    // cross-batch join-state buffering stays exercised
    def side(eventType: String, idAs: String, tsAs: String, userAs: String) =
      chunkedStream(spark, dir, filesPerTrigger = 2)
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        .filter(col("event_type") === eventType)
        .select(col("user_id").as(userAs), col("event_id").as(idAs),
          col("ts").as(tsAs))
        .withWatermark(tsAs, "10 minutes")
    val clicks = side("click", "click_id", "click_ts", "user_id")
    val purchases = side("purchase", "buy_id", "buy_ts", "p_user")
    val joined = clicks.join(purchases,
      col("user_id") === col("p_user") &&
        col("buy_ts") >= col("click_ts") &&
        col("buy_ts") <= col("click_ts") + expr("INTERVAL 6 HOURS"))
      .select(col("user_id"), col("click_id"), col("buy_id"))
    val name = "stream_ssj_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = runToMemory(joined, name, OutputMode.Append(), statePartitions = Some(8))
    q.stop()
    spark.table(name)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("user_id"))
  }

  /** Stream-stream LEFT OUTER interval join — [[clickPurchaseJoinBounded]]
    * plus the hard half of outer-join semantics: a click with NO purchase in
    * its 6-hour band emits a null-joined row only once the watermark proves
    * no future purchase can match (state eviction = emission, the
    * exactly-once form of "abandoned click" detection). Two structural
    * differences from the inner form, both load-bearing:
    *
    *  - the '__flush' sentinel (two hours past the corpus max) must reach
    *    BOTH sides' EventTimeWatermark nodes or the final watermark stays
    *    pinned at each side's own filtered maximum (declaring the watermark
    *    above the type filter is NOT enough — Catalyst pushes the filter
    *    below the watermark node, observed as 5 missing null rows at
    *    sf0.01). So each side keeps '__flush' through its filter under a
    *    side-specific NEGATIVE sentinel user id: the two sentinels can
    *    never join each other (different ids) or any real user, the
    *    click-side sentinel is never evicted (nothing passes flushTs + 6h)
    *    so it never emits a null row, and both watermark nodes advance to
    *    flushTs - delay;
    *  - clicks inside the final (flushTs - delay - 6h, corpusMax] tail are
    *    still in state when the source drains, so their null rows never
    *    emit — the DETERMINISTIC emission boundary `click_ts + 6h <
    *    maxTs + 2h - 10min` that the batch oracle mirrors exactly.
    *
    * Matched pairs emit on arrival (watermark governs eviction, not inner
    * emission), so the pair half equals the inner join's and the oracle is
    * one batch left join with the boundary predicate on the null half.
    */
  def clickPurchaseLeftOuterBounded(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = stagedTimeOrderedEventsDir(spark, sfDir)
    // 2 files/trigger (the q87 coalescing): matched pairs emit on arrival
    // and the null half is fixed by the FINAL watermark alone (flushTs -
    // delay — the deterministic emission boundary the oracle mirrors), so
    // the pair set and the expired set are batch-count-independent; the
    // eviction-emission no-data batch still runs after the flush batch
    def side(eventType: String, idAs: String, tsAs: String, userAs: String,
             sentinelUser: Long) =
      chunkedStream(spark, dir, filesPerTrigger = 2)
        .filter(col("event_type") === eventType || col("event_type") === "__flush")
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        .withColumn("uid", when(col("event_type") === "__flush", lit(sentinelUser))
          .otherwise(col("user_id")))
        .withWatermark("ts", "10 minutes")
        .select(col("uid").as(userAs), col("event_id").as(idAs),
          col("ts").as(tsAs))
    val clicks = side("click", "click_id", "click_ts", "user_id", -998L)
    val purchases = side("purchase", "buy_id", "buy_ts", "p_user", -999L)
    val joined = clicks.join(purchases,
      col("user_id") === col("p_user") &&
        col("buy_ts") >= col("click_ts") &&
        col("buy_ts") <= col("click_ts") + expr("INTERVAL 6 HOURS"),
      "left_outer")
      .select(col("user_id"), col("click_id"), col("buy_id"))
    val name = "stream_ssl_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = runToMemory(joined, name, OutputMode.Append(), statePartitions = Some(8))
    q.stop()
    spark.table(name)
      .groupBy(col("user_id"))
      .agg(count(col("buy_id")).as("n_matched"),
        sum(when(col("buy_id").isNull, 1L).otherwise(0L)).as("n_expired"))
      .orderBy(col("user_id"))
  }

  /** Stream-static enrichment join: each micro-batch of the event stream
    * joined to a STATIC dimension table (customer market segment). The
    * static side broadcasts per batch — the stream is never shuffled for
    * the join — which is the standard shape for enriching a 100 TB stream
    * against a reference table. Complete-mode aggregate over the drained
    * chunks must equal the batch join + GROUP BY exactly.
    */
  def enrichedSegmentCountsBounded(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = stagedTimeOrderedEventsDir(spark, sfDir)
    // complete-mode aggregate (the q109 batching argument): final state is
    // batching-independent, so drain everything in one micro-batch — the
    // per-batch dimension broadcast then happens once, not five times
    val stream = chunkedStream(spark, dir, filesPerTrigger = 0)
      .filter(!col("event_type").startsWith("__"))
      .select(col("user_id"), col("event_type"), col("value"))
    val dim = graft.Tables.customer(spark, sfDir)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    val agg = stream.join(broadcast(dim), Seq("user_id"))
      .groupBy(col("c_mktsegment"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
    val name = "stream_en_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = runToMemory(agg, name, OutputMode.Complete(), statePartitions = Some(8))
    q.stop()
    spark.table(name).orderBy(col("c_mktsegment"), col("event_type"))
  }

  /** Two-incarnation restart harness shared by the q75/q81 proofs: copy the
    * first two chunk files of the staged time-ordered fixture into a fresh
    * per-call source dir, run one query incarnation to a durable checkpoint
    * and stop it, let the remaining chunks (incl. the planted late + flush
    * rows) arrive with increasing mod times, and run a second incarnation
    * from the SAME checkpoint. The bulky per-call state (duplicated-events
    * source copy + state checkpoint) is deleted before returning so repeated
    * bench/verify runs don't grow /tmp; only the small sink the caller
    * reads survives. Returns the sink path.
    */
  private def runAcrossRestart(spark: SparkSession, sfDir: String,
                               duplicated: Boolean)
                              (start: (String, String, String) => StreamingQuery): String = {
    val staged = java.nio.file.Paths.get(
      stagedTimeOrderedEventsDir(spark, sfDir, duplicated))
    val work = java.nio.file.Files.createTempDirectory("graft_restart_")
    val srcDir = java.nio.file.Files.createDirectory(work.resolve("source"))
    val ckpt = work.resolve("checkpoint")
    val outDir = work.resolve("out").toString

    // chunk arrival: copy with explicitly increasing mod times so the file
    // source replays oldest-first in both incarnations
    def arrive(names: String*): Unit = names.foreach { n =>
      val target = srcDir.resolve(n)
      java.nio.file.Files.copy(staged.resolve(n), target)
      val idx = "\\d+".r.findFirstIn(n).get.toInt
      java.nio.file.Files.setLastModifiedTime(target,
        java.nio.file.attribute.FileTime.fromMillis(1600000000000L + idx * 60000L))
      ()
    }
    def rmTree(p: java.nio.file.Path): Unit = {
      import scala.jdk.CollectionConverters._
      if (java.nio.file.Files.exists(p)) {
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(f => java.nio.file.Files.deleteIfExists(f))
        ()
      }
    }

    try {
      arrive("chunk_0.parquet", "chunk_1.parquet")
      val q1 = startWithShufflePartitions(spark, 8)(
        start(srcDir.toString, ckpt.toString, outDir))
      q1.processAllAvailable()
      q1.stop() // "failure": the query dies mid-stream at a durable checkpoint
      arrive("chunk_2.parquet", "chunk_3_late.parquet", "chunk_4_flush.parquet")
      val q2 = startWithShufflePartitions(spark, 8)(
        start(srcDir.toString, ckpt.toString, outDir))
      q2.processAllAvailable()
      q2.stop()
    } finally {
      // cleanup runs on the failure path too — a throwing incarnation must
      // not leak the bulky source copy + checkpoint into /tmp
      rmTree(srcDir)
      rmTree(ckpt)
    }
    outDir
  }

  /** Stage the sf dir's events as a TIME-ORDERED stream-source directory at a
    * deterministic path (staged once, `_SUCCESS`-guarded, reused across JVMs
    * sharing /tmp):
    *
    *   chunk_0..chunk_2  the events split into three disjoint ts ranges
    *                     (tercile boundaries), oldest range first;
    *   chunk_3_late      ONE planted row ('__late', event_id -1) carrying the
    *                     corpus-minimum ts — by the time it arrives the
    *                     watermark sits near the end of chunk_2, so a correct
    *                     watermark MUST drop it;
    *   chunk_4_flush     ONE planted row ('__flush', event_id -2) two hours
    *                     past the corpus maximum — advances the watermark
    *                     over every real window so append mode finalizes all
    *                     of them.
    *
    * File modification times increase with the chunk index so the file
    * stream source (which orders by mod time) replays them oldest-first;
    * `maxFilesPerTrigger=1` then yields one micro-batch per file.
    */
  private def stagedTimeOrderedEventsDir(spark: SparkSession, sfDir: String,
                                         duplicated: Boolean = false): String = {
    val key = graft.FixtureKey(sfDir)
    val tag = if (duplicated) "orddup" else "ord" // NOT "dup": old fixture paths
    val dir = java.nio.file.Paths.get(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"), s"graft_stream_${tag}_events_$key")
    if (!java.nio.file.Files.exists(dir.resolve("_SUCCESS"))) {
      val single = graft.Tables.events(spark, sfDir)
        .select(col("event_id"), col("ts_ns").as("ts"), col("user_id"),
          col("event_type"), col("value"), col("props"))
      // exactly-once staging: every row appears TWICE in its chunk file, so
      // the replay copy lands in the same micro-batch as the original and
      // dropDuplicatesWithinWatermark's keyed state removes it
      val Row(tsMin: Long, tsMax: Long) =
        single.agg(min(col("ts")), max(col("ts"))).collect()(0)
      // Tercile assignment is EXACT count-based arithmetic over the
      // (ts, event_id) total order — `tile = ((rn-1)*3) div n` — not an
      // approxQuantile boundary: an oracle (q111 pins per-type update
      // counts to tercile membership) can replay integer row-number math
      // term for term, while an approximate boundary is engine-private.
      // Tiles are assigned on the SINGLE copy and inherited by the replay
      // copy, so a duplicated row is guaranteed to land in the same chunk
      // as its original (the q62 same-batch-dedup property). The global
      // one-task window is fixture staging, not a query path.
      val n = single.count()
      val wOrd = org.apache.spark.sql.expressions.Window
        .orderBy(col("ts"), col("event_id"))
      val tiled = single.withColumn("rn", row_number().over(wOrd))
        .withColumn("tile", expr(s"cast(((rn - 1) * 3) div $n as int)"))
        .drop("rn")
      val base = if (duplicated) tiled.unionByName(tiled) else tiled
      def tile(i: Int): DataFrame = base.filter(col("tile") === i).drop("tile")
      import spark.implicits._
      val chunks: Seq[(String, DataFrame)] = Seq(
        "chunk_0" -> tile(0),
        "chunk_1" -> tile(1),
        "chunk_2" -> tile(2),
        "chunk_3_late" -> Seq((-1L, tsMin, 0L, "__late", 1.0, "{}"))
          .toDF("event_id", "ts", "user_id", "event_type", "value", "props"),
        "chunk_4_flush" -> Seq((-2L, tsMax + 2L * 3600L * 1000000000L, 0L, "__flush", 0.0, "{}"))
          .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
      java.nio.file.Files.createDirectories(dir)
      chunks.zipWithIndex.foreach { case ((fname, df), i) =>
        val tmp = dir.resolve(s"_stage_$fname")
        df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        val part = tmp.toFile.listFiles().find(_.getName.startsWith("part-")).get
        val target = dir.resolve(s"$fname.parquet")
        java.nio.file.Files.move(part.toPath, target,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        java.nio.file.Files.setLastModifiedTime(target,
          java.nio.file.attribute.FileTime.fromMillis(1600000000000L + i * 60000L))
        tmp.toFile.listFiles().foreach(f => { f.delete(); () })
        java.nio.file.Files.deleteIfExists(tmp)
      }
      java.nio.file.Files.createFile(dir.resolve("_SUCCESS"))
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

  final case class Milestone(user_id: Long, milestone: Long)

  /** Custom MULTI-output stateful op via flatMapGroupsWithState (the 0..n-
    * rows-per-group sibling of mapGroupsWithState): emit one row every time
    * a user's running value total crosses another `stepCents` boundary.
    * Each crossing is emitted exactly once regardless of micro-batch
    * boundaries (the state is the exact running cents; milestones are the
    * integer quotients between its previous and new value).
    *
    * Cents accumulate via the same BigDecimal(HALF_UP, scale 2) conversion
    * Spark's DECIMAL(18,2) cast applies, so the totals — and therefore the
    * milestone counts — are exact and order-independent, matching a batch
    * SQL oracle over the same events.
    */
  def valueMilestones(events: DataFrame, stepCents: Long = 10000L): Dataset[Milestone] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("value")).as[(Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Double)], state: GroupState[Long]) =>
          val prev = state.getOption.getOrElse(0L)
          var tot = prev
          rows.foreach { case (_, v) =>
            tot += java.math.BigDecimal.valueOf(v)
              .setScale(2, java.math.RoundingMode.HALF_UP)
              .unscaledValue().longValueExact()
          }
          state.update(tot)
          ((prev / stepCents + 1) to (tot / stepCents)).iterator
            .map(Milestone(user, _))
      }
  }

  /** Bounded multi-batch drain of [[valueMilestones]] → per-user milestone
    * counts (users with >= 1). Sentinel fixture rows are excluded before the
    * stateful op — they are staging artifacts, not events.
    */
  def milestoneCountsBounded(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = stagedTimeOrderedEventsDir(spark, sfDir)
    // 2 files/trigger: each crossing is emitted exactly once whatever the
    // batching (state = exact running cents; milestones are the quotients
    // between previous and new state), so per-user counts are batch-count-
    // independent — and 3 batches instead of 5 still cross real batch
    // boundaries, keeping the cross-batch GroupState demonstration alive
    val stream = chunkedStream(spark, dir, filesPerTrigger = 2)
      .filter(!col("event_type").startsWith("__"))
    val name = "stream_ms_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = runToMemory(valueMilestones(stream).toDF(), name, OutputMode.Update(),
      statePartitions = Some(8))
    q.stop()
    spark.table(name)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_milestones"))
      .orderBy(col("user_id"))
  }

  /** [[valueMilestones]] across a checkpoint RESTART — the custom-state
    * (flatMapGroupsWithState) sibling of [[dedupedWindowedCountsRestart]]:
    * incarnation 1 drains the first two chunk files into a parquet sink via
    * foreachBatch and stops at a durable checkpoint; incarnation 2 restarts
    * after the rest arrive. The running-cents GroupState must RESTORE from
    * the state store: lost state would re-emit already-crossed milestones
    * (counts too high), corrupted state would skip crossings (too low) —
    * either flips the per-user counts away from the batch oracle (q72's).
    *
    * foreachBatch + graceful stop: processAllAvailable() returns only after
    * every drained batch is committed to the checkpoint, so the restart
    * never replays an appended batch (no double-append in the sink).
    */
  def milestoneCountsRestart(spark: SparkSession, sfDir: String): DataFrame = {
    val out = runAcrossRestart(spark, sfDir, duplicated = false) { (src, ckpt, outDir) =>
      val stream = chunkedStream(spark, src)
        .filter(!col("event_type").startsWith("__"))
      valueMilestones(stream).toDF()
        .writeStream
        .outputMode(OutputMode.Update())
        .foreachBatch { (batch: Dataset[Row], id: Long) =>
          // idempotent under batch REPLAY, not just graceful stops: each
          // micro-batch overwrites its own batch=<id> partition, so a batch
          // re-executed after a crash between the offsets log and the
          // commit log lands on the same path instead of appending twice
          batch.write.mode("overwrite").parquet(s"$outDir/batch=$id")
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.ProcessingTime(0))
        .start()
    }
    spark.read.parquet(out)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_milestones"))
      .orderBy(col("user_id"))
  }

  /** Run a streaming query to a named in-memory sink and process everything
    * currently available (the synchronous local smoke path).
    *
    * `statePartitions`: streaming state is partitioned by the session's
    * shuffle-partition count AT QUERY START and pinned for the query's
    * lifetime; every micro-batch then writes one state checkpoint delta per
    * partition per stateful op. Batch-oriented counts (32 here) multiply
    * that per-batch overhead for no parallelism win on watermark-bounded
    * state, so streaming drains pin a smaller count — the standard
    * cluster-side tuning, expressed locally. The session conf is restored
    * after the drain.
    */
  def runToMemory(df: DataFrame, name: String, mode: OutputMode,
                  statePartitions: Option[Int] = None): StreamingQuery = {
    val spark = df.sparkSession
    def begin(): StreamingQuery = df.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(name)
      .trigger(Trigger.ProcessingTime(0))
      .start()
    val q = statePartitions match {
      case Some(n) => startWithShufflePartitions(spark, n)(begin())
      case None => begin()
    }
    q.processAllAvailable()
    q
  }

  /** Start a streaming query under a temporarily pinned shuffle-partition
    * count. `start()` CLONES the session (conf included) into the query, so
    * the pinned value is captured for the query's whole lifetime and the
    * SESSION value is restored the moment `start` returns — a batch query
    * planned concurrently on the same session can only inherit the
    * temporary value during the start call itself, not for the duration of
    * the drain (the prior shape mutated the session conf around the entire
    * multi-batch drain).
    */
  private def startWithShufflePartitions[T](spark: SparkSession, n: Int)
                                           (startQ: => T): T = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", n)
    try startQ finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
