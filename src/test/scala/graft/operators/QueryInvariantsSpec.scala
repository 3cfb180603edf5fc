package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Mathematical invariants of the round-6 analytics queries that hold on
  * ANY input — properties the single-dataset oracle hash can't witness by
  * itself (it proves one answer, these prove the shape of all answers).
  */
class QueryInvariantsSpec extends SparkSpec {

  test("q120: week-0 retention is exactly 1.0 for every cohort") {
    // a user's signup event makes them active in their own cohort week by
    // construction, so the week_no=0 row of every cohort is 100%
    val df = graft.SparkEntry.queries("q120_cohort_retention")(spark, sf("sf0.001"))
    val w0 = df.filter(col("week_no") === 0).collect()
    assert(w0.nonEmpty)
    w0.foreach { r =>
      assert(r.getAs[Double]("retention") == 1.0, r.toString)
      assert(r.getAs[Long]("active_users") == r.getAs[Long]("cohort_users"), r.toString)
    }
  }

  test("q121: runs partition each user's events — counts add up, exactly one current run") {
    val runs = graft.SparkEntry.queries("q121_scd2_runs")(spark, sf("sf0.001"))
    val perUser = runs.groupBy(col("user_id"))
      .agg(sum(col("n_ev")).as("run_events"),
        sum(col("is_current").cast("long")).as("n_current"),
        count(lit(1)).as("n_runs"), max(col("run_seq")).as("max_seq"))
    val events = graft.Tables.events(spark, sf("sf0.001"))
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_events"))
    val joined = perUser.join(events, Seq("user_id")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getAs[Long]("run_events") == r.getAs[Long]("n_events"), r.toString)
      assert(r.getAs[Long]("n_current") == 1L, r.toString)
      // run_seq is a gapless 1..n_runs numbering
      assert(r.getAs[Long]("max_seq") == r.getAs[Long]("n_runs"), r.toString)
    }
  }

  test("q122: gap-filled series is dense and its counts sum back to the event total") {
    val df = graft.SparkEntry.queries("q122_hourly_gap_fill")(spark, sf("sf0.001"))
      .cache()
    try {
      val ev = graft.Tables.events(spark, sf("sf0.001"))
      val types = ev.select(col("event_type")).distinct().count()
      val perType = df.groupBy(col("event_type")).agg(count(lit(1)).as("n_hours"))
        .select(countDistinct(col("n_hours")).as("distinct_lengths"))
        .collect()(0).getLong(0)
      assert(perType == 1L, "every type must cover the identical dense hour grid")
      assert(df.count() % types == 0)
      val total = df.agg(sum(col("n"))).collect()(0).getLong(0)
      assert(total == ev.count(), "zero-fill must not add or lose events")
    } finally df.unpersist()
  }

  test("q125: KL terms sum to a non-negative divergence (Gibbs' inequality)") {
    // individual p*ln(p/q) terms may be negative; their sum never is —
    // and with both distributions Laplace-smoothed it is finite
    val df = graft.SparkEntry.queries("q125_lang_drift")(spark, sf("sf0.001"))
    val kl = df.agg(sum(col("kl_term"))).collect()(0).getDouble(0)
    assert(!kl.isNaN && !kl.isInfinite)
    assert(kl >= -1e-9, s"KL divergence must be non-negative, got $kl")
  }

  test("q126: the shipped TESTDATA satisfies every expectation") {
    val rows = graft.SparkEntry.queries("q126_dq_audit")(spark, sf("sf0.001")).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("pass"), s"expectation violated: $r")
      assert(r.getAs[Long]("violations") == 0L)
      assert(r.getAs[Long]("total") > 0L, s"vacuous check (empty table): $r")
    }
  }

  test("q127: incremental maintenance equals from-scratch recompute (hash, not just counts)") {
    val maintained = graft.SparkEntry.queries("q127_incremental_rollup")(spark, sf("sf0.001"))
    val scratch = graft.Tables.events(spark, sf("sf0.001"))
      .select(col("event_type"), to_date(col("ts")).as("d"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy(col("event_type"), col("d"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
    assert(maintained.exceptAll(scratch).isEmpty &&
      scratch.exceptAll(maintained).isEmpty)
  }

  test("q128: channel revenue is a partition of total purchase revenue") {
    val df = graft.SparkEntry.queries("q128_attribution")(spark, sf("sf0.001"))
    val got = df.agg(sum(col("n_purchases")).as("n"),
      sum(col("revenue_cents")).as("rev")).collect()(0)
    val p = graft.Tables.events(spark, sf("sf0.001"))
      .filter(col("event_type") === "purchase")
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("rev")).collect()(0)
    assert(got.getLong(0) == p.getLong(0), "every purchase attributed exactly once")
    assert(got.getLong(1) == p.getLong(1), "revenue conserved across channels")
  }
}
