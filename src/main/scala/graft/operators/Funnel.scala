package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis over an event stream: how many users performed
  * step 1, then step 2 strictly after their first step 1, then step 3
  * strictly after that, and so on (the classic product-analytics
  * view → click → purchase question; reference-side analogue is the
  * event-table groupBy family, codeText.txt:214-262).
  *
  * Semantics (strict-order, first-touch): a user counts for stage i+1 iff
  * they have an event of type `steps(i+1)` with timestamp strictly greater
  * than their stage-i completion time, where the stage-i completion time is
  * the MINIMUM qualifying timestamp (first touch). This is the
  * left-to-right greedy matching every SQL funnel compiles to, so a DuckDB
  * oracle can mirror it as a chain of min-aggregates.
  *
  * Scale shape (100 TB events): one aggregate + one join per stage, ALL
  * keyed on the user column — the first stage is a partial-aggregating
  * groupBy (map-side combine reduces each partition to one row per user
  * before the exchange), and every later stage joins the filtered event
  * scan of that one step type against a strictly SHRINKING per-user
  * frontier (stage tables lose users monotonically), so AQE turns the
  * later probes into broadcast joins as the frontier falls under the
  * threshold. No windows over whole user histories, no per-user event
  * sorting, no all-event shuffle. The whole funnel is one declarative
  * plan — no driver-side actions — so Catalyst sees every stage at once.
  */
object Funnel {

  /** Per-user stage-completion frontiers, one DataFrame per stage:
    * `(userCol, t)` where `t` is the first-touch completion time.
    */
  def frontiers(events: DataFrame, steps: Seq[String],
                userCol: String = "user_id", tsCol: String = "ts",
                typeCol: String = "event_type"): Seq[DataFrame] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val first = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t"))
    steps.drop(1).scanLeft(first) { (frontier, step) =>
      events.filter(col(typeCol) === step)
        .join(frontier, Seq(userCol))
        .filter(col(tsCol) > col("t"))
        .groupBy(col(userCol)).agg(min(col(tsCol)).as("t"))
    }
  }

  /** Per-stage user counts plus conversion from the first stage.
    *
    * Output: one row per stage —
    * `(stage_idx, stage_name, n_users, conversion)` where `conversion` is
    * n_users / n_users(stage 1) as one deterministic double division
    * (exact long counts on both sides, so it hash-compares cross-engine).
    */
  def stages(events: DataFrame, steps: Seq[String],
             userCol: String = "user_id", tsCol: String = "ts",
             typeCol: String = "event_type"): DataFrame = {
    val stageCounts = frontiers(events, steps, userCol, tsCol, typeCol)
      .zip(steps).zipWithIndex.map { case ((frontier, step), i) =>
        frontier.agg(count(lit(1)).as("n_users"))
          .select(lit(i + 1).as("stage_idx"), lit(step).as("stage_name"),
            col("n_users"))
      }.reduce(_ unionByName _)
    // the window runs over exactly `steps.length` rows — cosmetic, not a
    // scale concern
    val base = max(when(col("stage_idx") === 1, col("n_users")))
      .over(Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
    stageCounts
      .withColumn("conversion",
        when(base === 0L, 0d)
          .otherwise(col("n_users").cast("double") / base.cast("double")))
      .orderBy(col("stage_idx"))
  }
}
