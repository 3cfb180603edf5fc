package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TemplateCanonSpec extends SparkSpec {
  import spark.implicits._

  test("collapse keeps the highest-score member, ties to lowest id") {
    val docs = Seq(
      // family A: same 2-token prefix, different tails
      (1L, "intro words tail one", 10L),
      (2L, "intro words another much longer tail", 99L),
      (3L, "intro words third", 99L),   // score tie with 2 -> id 2 wins
      // family B: singleton, must not appear
      (4L, "solo document here", 50L),
      // family C: same prefix, negative scores
      (5L, "common start x", -5L),
      (6L, "common start y", -9L)
    ).toDF("doc_id", "text", "score")
    val got = TemplateCanon.collapse(docs, col("score"), prefixTokens = 2)
      .orderBy("kept_id").collect()
      .map(r => (r.getLong(2), r.getLong(1), r.getLong(3), r.getLong(4)))
    assert(got === Array((2L, 3L, 99L, 2L), (5L, 2L, -5L, 1L)))
  }

  test("short docs key on their whole text; empty docs form one family") {
    val docs = Seq(
      (1L, "ab", 1L), (2L, "ab", 2L), // shorter than prefix: whole text
      (3L, "", 7L), (4L, "   ", 9L)   // empty/whitespace normalize together
    ).toDF("doc_id", "text", "score")
    val got = TemplateCanon.collapse(docs, col("score"), prefixTokens = 8)
      .orderBy("kept_id").collect()
      .map(r => (r.getLong(2), r.getLong(3)))
    assert(got === Array((2L, 2L), (4L, 9L)))
  }

  test("the argmax is a single partial-final agg (no window exchange)") {
    val docs = Seq((1L, "a b c", 1L)).toDF("doc_id", "text", "score")
    val plan = TemplateCanon.collapse(docs, col("score"))
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Window"), s"expected no window operator:\n$plan")
  }
}
