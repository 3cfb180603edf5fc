package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact trailing-k rolling moments with DATA-SCALABLE parallelism.
  *
  * The naive rolling window `Window.partitionBy(part).orderBy(order)
  * .rowsBetween(-(k-1), 0)` sorts each partition key's ENTIRE history in a
  * single task — parallelism is bounded by the key cardinality (~5 event
  * types here), which is fine at dashboard scale and a wall at 100 TB.
  *
  * This operator restores scalability with the standard frame-carryover
  * split: rows are chunked by a coarse time range, the trailing k−1 rows of
  * every chunk are REPLAYED into the next chunk (flagged, excluded from
  * output), and the window runs per (part, chunk) — so a frame that spans a
  * cut still sees its full history, every output row's moments are
  * bit-identical to the single-task plan, and the task count is
  * |parts| × |chunks|, growing with the data instead of the key space.
  *
  * Chunk-width selection is derived from the data, driver-side, from a
  * metadata-sized (part, day) count (|parts| × |days| rows — the same
  * "collect only k-sized state" rule as the 1-row bounds elsewhere):
  * the smallest power-of-two day width for which every INTERIOR chunk
  * (one with both a predecessor and a successor) holds ≥ k−1 rows.
  * Interior chunks are the only ones whose carry must be full: a first
  * chunk carries everything that exists before its successor, and a last
  * chunk carries into nothing. A corpus too sparse for any width falls
  * back to one chunk per part — exactly the naive plan, which is the
  * right plan for data that small.
  *
  * Exactness argument (why carry-one-chunk suffices): output row r in
  * chunk c needs the k−1 rows before it. Rows of c before r are present;
  * if the frame reaches into the past, it sees the carried suffix of
  * c−1. If c−1 is interior-or-last it holds ≥ k−1 rows, so its carried
  * k−1 suffix covers any reach. If c−1 is the FIRST chunk, its whole
  * content is carried and nothing exists before it — the frame is
  * complete either way (short frames are then short in truth, and the
  * caller's full-frame filter n = k sees the exact count).
  */
object RollingWindow {

  private val NanosPerDay = 86400L * 1000000000L

  /** Smallest power-of-two day-width whose interior chunks all hold ≥ k−1
    * rows, from collected (part, day, n) counts; 0 = no valid width
    * (fall back to one chunk per part).
    */
  private[operators] def chooseWidthDays(
      dayCounts: Seq[(Any, Long, Long)], k: Int): Long = {
    if (dayCounts.isEmpty) return 0L
    val spanDays = dayCounts.map(_._2).max - dayCounts.map(_._2).min + 1
    val byPart = dayCounts.groupBy(_._1)
    var w = 1L
    while (w < 2 * spanDays) {
      val ok = byPart.values.forall { days =>
        val chunks = days.groupBy(t => Math.floorDiv(t._2, w))
          .view.mapValues(_.map(_._3).sum).toSeq.sortBy(_._1)
        chunks.size <= 2 || // no interior chunk -> nothing to guarantee
          chunks.drop(1).dropRight(1).forall(_._2 >= k - 1L)
      }
      val multi = byPart.values.exists { days =>
        days.map(t => Math.floorDiv(t._2, w)).distinct.size > 1
      }
      if (ok) return if (multi) w else 0L // all-single-chunk == fallback
      w *= 2
    }
    0L
  }

  /** Adds exact trailing-k moments of `valueCol` (a long): `n` (frame row
    * count), `sm` (frame sum), `sq` (frame sum of squares) to every input
    * row. Frames are trailing k−1 + current within `partCol`, ordered by
    * (`tsCol`, `idCol`); `tsNsCol` (long nanos, consistent with that
    * order) drives the chunking. Original columns pass through.
    */
  def trailingMoments(events: DataFrame, partCol: String, tsCol: String,
                      idCol: String, tsNsCol: String, valueCol: String,
                      k: Int, maxProbeGroups: Int = 1 << 20): DataFrame = {
    // integer `div`, not floor(double /): ts_ns ~ 1.7e18 exceeds a double's
    // exact-integer range, and the driver-side width validation below uses
    // exact integer arithmetic — the two must agree on every boundary row
    val day = expr(s"$tsNsCol div ${NanosPerDay}L")
    // the width probe collects the (part, day) count table — metadata-sized
    // for a bounded partCol (|parts| x |days|), but UNBOUNDED if a caller
    // passes a high-cardinality partCol. The limit caps what ever reaches
    // the driver: one row past the bound is enough to prove the overflow,
    // and the job fails fast instead of materializing millions of rows
    // driver-side (r7 verdict task 5).
    val collected = events.groupBy(col(partCol).as("p"), day.as("d"))
      .agg(count(lit(1)).as("n"))
      .limit(maxProbeGroups + 1)
      .collect()
    require(collected.length <= maxProbeGroups,
      s"trailingMoments width probe exceeds $maxProbeGroups (part, day) " +
        s"groups — partCol '$partCol' is too high-cardinality for a " +
        "driver-side width choice; pre-bucket the partition column or " +
        "raise maxProbeGroups")
    val dayCounts =
      collected.map(r => (r.get(0), r.getLong(1), r.getLong(2))).toSeq
    val w = chooseWidthDays(dayCounts, k)

    val frame = Window.partitionBy(col("__part_chunk"))
      .orderBy(col(tsCol), col(idCol)).rowsBetween(-(k - 1), 0)
    // raw time chunks are DENSIFIED per part (empty days can leave holes in
    // the raw ids; carry must land in the next PRESENT chunk). The distinct
    // chunk-id set is metadata-sized, so the rank window over it and the
    // broadcast join back are both cheap at any scale.
    val rawChunk =
      if (w == 0L) lit(0L) // naive fallback: one chunk per part
      else expr(s"$tsNsCol div ${NanosPerDay * w}L")
    val chunkIds = events.select(col(partCol), rawChunk.as("__rawc")).distinct()
    val wIdx = Window.partitionBy(col(partCol)).orderBy(col("__rawc"))
    val mapping = chunkIds
      .withColumn("__chunk", row_number().over(wIdx).cast("long"))
    val chunked = events.withColumn("__rawc", rawChunk)
      .join(broadcast(mapping), Seq(partCol, "__rawc")).drop("__rawc")
    val own = chunked.withColumn("__carry", lit(false))
    // the trailing k−1 rows of each chunk replay into the next chunk
    val wDesc = Window.partitionBy(col(partCol), col("__chunk"))
      .orderBy(col(tsCol).desc, col(idCol).desc)
    val carry = chunked
      .withColumn("__rnd", row_number().over(wDesc))
      .filter(col("__rnd") <= k - 1)
      .drop("__rnd")
      .withColumn("__chunk", col("__chunk") + 1)
      .withColumn("__carry", lit(true))
    val v = col(valueCol)
    own.unionByName(carry)
      .withColumn("__part_chunk", struct(col(partCol), col("__chunk")))
      .withColumn("n", count(lit(1)).over(frame))
      .withColumn("sm", sum(v).over(frame))
      .withColumn("sq", sum(v * v).over(frame))
      .filter(!col("__carry"))
      .drop("__carry", "__chunk", "__part_chunk")
  }
}
