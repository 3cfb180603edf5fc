package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, String, String)*) =
    rows.toSeq.toDF("user_id", "ts_s", "event_type")
      .select($"user_id", $"ts_s".cast("timestamp").as("ts"), $"event_type")

  test("strict-order first-touch semantics on a hand-built log") {
    val events = ev(
      (1L, "2026-01-01 10:00:00", "view"),
      (1L, "2026-01-01 10:05:00", "click"),
      (1L, "2026-01-01 10:10:00", "purchase"), // full funnel
      (2L, "2026-01-01 10:00:00", "click"), // click BEFORE view: ignored
      (2L, "2026-01-01 10:05:00", "view"),
      (3L, "2026-01-01 10:00:00", "view"),
      (3L, "2026-01-01 10:00:00", "click"), // same instant: strict > rejects
      (4L, "2026-01-01 09:00:00", "purchase"), // purchase before funnel start
      (4L, "2026-01-01 10:00:00", "view"),
      (4L, "2026-01-01 11:00:00", "click"))
    val got = Funnel.stages(events, Seq("view", "click", "purchase"))
      .select($"stage_idx", $"stage_name", $"n_users", $"conversion")
      .as[(Int, String, Long, Double)].collect().toSeq
    assert(got === Seq(
      (1, "view", 4L, 1.0),
      (2, "click", 2L, 0.5),
      (3, "purchase", 1L, 0.25)))
  }

  test("later event of an earlier step re-qualifies a user (first-touch is per stage, not global)") {
    // user views at 10:00, clicks at 09:00 (ignored) and again at 10:30
    val events = ev(
      (1L, "2026-01-01 09:00:00", "click"),
      (1L, "2026-01-01 10:00:00", "view"),
      (1L, "2026-01-01 10:30:00", "click"))
    val got = Funnel.stages(events, Seq("view", "click"))
      .select($"n_users").as[Long].collect().toSeq
    assert(got === Seq(1L, 1L))
  }

  test("stage counts are monotonically non-increasing on real events") {
    val counts = Funnel.stages(Tables.events(spark, sf("sf0.001")),
        Seq("view", "click", "purchase"))
      .select($"n_users").as[Long].collect().toSeq
    assert(counts.length === 3)
    assert(counts === counts.sorted.reverse)
    assert(counts.head > 0)
  }
}
