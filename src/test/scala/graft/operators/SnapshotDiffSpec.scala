package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  test("diff classifies added/removed/changed/unchanged and carries attrs") {
    val v1 = Seq(
      (1L, "alpha", "en"), (2L, "beta", "de"), (3L, "gamma", "en"),
      (4L, "delta", "fr")).toDF("doc_id", "text", "lang")
    val v2 = Seq(
      (1L, "alpha", "en"),        // unchanged
      (2L, "beta EDITED", "de"),  // changed
      (4L, "delta", "es"),        // changed (non-payload? lang IS payload here)
      (9L, "new doc", "zh")       // added
    ).toDF("doc_id", "text", "lang")
    val out = SnapshotDiff.diff(v1, v2, "doc_id",
      payloadCols = Seq("text", "lang"), carryCols = Seq("lang"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(out === Array(
      (1L, "unchanged", "en"),
      (2L, "changed", "de"),
      (3L, "removed", "en"),  // carry falls back to the v1 side
      (4L, "changed", "es"),  // carry prefers the v2 side
      (9L, "added", "zh")))
  }

  test("null payload fields compare null-safely") {
    val v1 = Seq((1L, Option("x")), (2L, Option.empty[String]),
      (3L, Option("y"))).toDF("doc_id", "text")
    val v2 = Seq((1L, Option.empty[String]), (2L, Option.empty[String]),
      (3L, Option("y"))).toDF("doc_id", "text")
    val statuses = SnapshotDiff.diff(v1, v2, "doc_id", Seq("text"))
      .orderBy("doc_id").collect().map(_.getString(1))
    // NULL vs x => changed; NULL vs NULL => unchanged (never misclassified
    // as added/removed, and <=> keeps NULL = NULL rows unchanged)
    assert(statuses === Array("changed", "unchanged", "unchanged"))
  }

  test("summary rolls the classification up per group") {
    val v1 = Seq((1L, "a", "en"), (2L, "b", "en"), (3L, "c", "de"))
      .toDF("doc_id", "text", "lang")
    val v2 = Seq((1L, "a", "en"), (2L, "b2", "en"))
      .toDF("doc_id", "text", "lang")
    val got = SnapshotDiff.summary(
        SnapshotDiff.diff(v1, v2, "doc_id", Seq("text"), Seq("lang")),
        Seq("lang"))
      .orderBy("lang", "status").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got === Array(("de", "removed", 1L), ("en", "changed", 1L),
      ("en", "unchanged", 1L)))
  }

  test("the diff is one full-outer join on the key (no extra shuffles)") {
    val v1 = Seq((1L, "a")).toDF("doc_id", "text")
    val v2 = Seq((1L, "a")).toDF("doc_id", "text")
    val plan = SnapshotDiff.diff(v1, v2, "doc_id", Seq("text"))
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("FullOuter"), s"expected a full-outer join:\n$plan")
  }
}
