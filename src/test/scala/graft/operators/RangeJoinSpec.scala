package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {

  private def fixture = {
    val ev = Tables.events(spark, sf("sf0.001"))
      .select(col("event_id"), col("ts"), col("user_id"))
    val iv = ev.select(date_trunc("day", col("ts")).as("w_start")).distinct()
      .withColumn("w_end", col("w_start") + expr("INTERVAL 30 HOURS"))
    (ev, iv)
  }

  test("bucketed range join equals the naive theta join, with no duplicate pairs") {
    val (ev, iv) = fixture
    val bucketed = RangeJoin.bucketed(ev, iv, "ts", "w_start", "w_end", 86400L)
      .select(col("event_id"), col("w_start"))
    val naive = ev.join(iv,
        col("ts") >= col("w_start") && col("ts") <= col("w_end"))
      .select(col("event_id"), col("w_start"))
    val b = bucketed.collect().map(r => (r.getLong(0), r.getTimestamp(1))).toSeq
    val n = naive.collect().map(r => (r.getLong(0), r.getTimestamp(1))).toSeq
    assert(b.size === b.distinct.size, "bucketed join produced duplicate pairs")
    assert(b.toSet === n.toSet)
    assert(b.size === n.size)
    // the 30h windows overlap, so some events must match TWO windows —
    // otherwise the multi-bucket interval path is untested
    assert(b.groupBy(_._1).exists(_._2.size == 2),
      "fixture never exercises an event matching two overlapping windows")
  }

  test("randomized intervals: equals naive join for zero-length and multi-bucket spans") {
    // seeded property run (scalacheck is offline-unavailable; seeded Random
    // loops are this repo's convention): arbitrary interval lengths from 0
    // seconds to several buckets wide, points scattered across the range —
    // the bucketed join must agree with the naive theta join exactly.
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val base = 1700000000000000L // µs epoch
    val points = (1 to 400).map(i =>
      (i.toLong, base + rnd.nextLong(10L * 86400L * 1000000L))) // 10-day span
    val intervals = (1 to 60).map { i =>
      val start = base + rnd.nextLong(10L * 86400L * 1000000L)
      val lenUs = rnd.nextInt(4) match {
        case 0 => 0L                                   // zero-length [t, t]
        case 1 => rnd.nextLong(3600L * 1000000L)       // sub-bucket
        case 2 => rnd.nextLong(86400L * 1000000L)      // ~one bucket
        case _ => rnd.nextLong(5L * 86400L * 1000000L) // many buckets
      }
      (i.toLong, start, start + lenUs)
    }
    val pts = points.toDF("pid", "t_us")
      .select($"pid", expr("timestamp_micros(t_us)").as("t"))
    val ivs = intervals.toDF("iid", "s_us", "e_us")
      .select($"iid", expr("timestamp_micros(s_us)").as("s"),
        expr("timestamp_micros(e_us)").as("e"))
    val bucketed = RangeJoin.bucketed(pts, ivs, "t", "s", "e", 86400L)
      .select($"pid", $"iid").as[(Long, Long)].collect().toSeq
    val naive = pts.join(ivs, $"t" >= $"s" && $"t" <= $"e")
      .select($"pid", $"iid").as[(Long, Long)].collect().toSeq
    assert(bucketed.size === bucketed.distinct.size)
    assert(bucketed.toSet === naive.toSet)
    assert(bucketed.size === naive.size)
    assert(naive.nonEmpty, "fixture produced no matches — property is vacuous")
  }

  test("bucketedAuto derives a sane width and equals the naive theta join") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val base = 1700000000000000L
    val pts = (1 to 300).map(i => (i.toLong, base + rnd.nextLong(86400L * 1000000L)))
      .toDF("pid", "t_us").select($"pid", expr("timestamp_micros(t_us)").as("t"))
    // second-scale intervals: a fixed day-scale width would be ~86400x too
    // coarse, a fixed millisecond width would trip the replication cap —
    // the auto width must land near the ~60s median instead
    val ivs = (1 to 50).map { i =>
      val s = base + rnd.nextLong(86400L * 1000000L)
      (i.toLong, s, s + (30L + rnd.nextInt(90)) * 1000000L)
    }.toDF("iid", "s_us", "e_us")
      .select($"iid", expr("timestamp_micros(s_us)").as("s"),
        expr("timestamp_micros(e_us)").as("e"))
    val auto = RangeJoin.bucketedAuto(pts, ivs, "t", "s", "e")
      .select($"pid", $"iid").as[(Long, Long)].collect().toSeq
    val naive = pts.join(ivs, $"t" >= $"s" && $"t" <= $"e")
      .select($"pid", $"iid").as[(Long, Long)].collect().toSeq
    assert(auto.size === auto.distinct.size)
    assert(auto.toSet === naive.toSet)
    assert(naive.nonEmpty, "fixture produced no matches — property is vacuous")
  }

  test("inverted intervals (end < start) are dropped, not exploded descending") {
    import spark.implicits._
    val pts = Seq((1L, 1700000000000000L))
      .toDF("pid", "t_us").select($"pid", expr("timestamp_micros(t_us)").as("t"))
    val ivs = Seq(
      (1L, 1700000000000000L - 1000000L, 1700000000000000L + 1000000L), // valid, matches
      (2L, 1700000000000000L + 5L * 86400L * 1000000L, 1700000000000000L) // inverted
    ).toDF("iid", "s_us", "e_us")
      .select($"iid", expr("timestamp_micros(s_us)").as("s"),
        expr("timestamp_micros(e_us)").as("e"))
    val got = RangeJoin.bucketed(pts, ivs, "t", "s", "e", 60L)
      .select($"iid").as[Long].collect().toSeq
    assert(got === Seq(1L))
  }

  test("a pathological span/bucket ratio fails fast instead of exploding") {
    import spark.implicits._
    val pts = Seq((1L, 1700000000000000L))
      .toDF("pid", "t_us").select($"pid", expr("timestamp_micros(t_us)").as("t"))
    // one interval spanning ~10 years against 1-second buckets: ~3e8 bucket
    // rows if materialized — the cap must stop it with a clear message
    val ivs = Seq((1L, 1700000000000000L, 1700000000000000L + 10L * 365 * 86400L * 1000000L))
      .toDF("iid", "s_us", "e_us")
      .select($"iid", expr("timestamp_micros(s_us)").as("s"),
        expr("timestamp_micros(e_us)").as("e"))
    val e = intercept[Exception] {
      RangeJoin.bucketed(pts, ivs, "t", "s", "e", 1L).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("RangeJoin.bucketed")),
      s"expected the replication-cap error, got: $e")
  }

  test("bucketed range join plans as a hash equi-join, not BroadcastNestedLoop") {
    val (ev, iv) = fixture
    val df = RangeJoin.bucketed(ev, iv, "ts", "w_start", "w_end", 86400L)
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join fell back to a nested-loop shape:\n$plan")
    // any equi-join strategy is fine (hash or sort-merge on __bucket);
    // the invariant is that it is NOT a nested-loop over all pairs
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      s"expected an equi-join on the bucket:\n$plan")
  }
}
