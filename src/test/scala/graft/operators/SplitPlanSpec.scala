package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SplitPlanSpec extends SparkSpec {
  import spark.implicits._

  test("byte-identical and normalization-equal texts land in one split") {
    val docs = Seq(
      (1L, "alpha beta gamma", "en"),
      (2L, "alpha beta gamma", "en"),      // exact duplicate, different id
      (3L, "  ALPHA   beta GAMMA ", "en"), // same text modulo case/spacing
      (4L, "something else entirely", "en"))
      .toDF("doc_id", "text", "lang")
    val got = SplitPlan.assign(docs, "text")
      .select(col("doc_id"), col("bucket"), col("split"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(got(1L) == got(2L), "exact duplicates must co-locate")
    assert(got(1L) == got(3L), "case/whitespace variants must co-locate")
  }

  test("split labels follow the bucket ranges exactly") {
    val docs = (1L to 400L).map(i => (i, s"doc number $i with words", "en"))
      .toDF("doc_id", "text", "lang")
    val rows = SplitPlan.assign(docs, "text", pctTrain = 70, pctVal = 20)
      .select(col("bucket"), col("split")).collect()
    rows.foreach { r =>
      val (b, s) = (r.getLong(0), r.getString(1))
      val expect = if (b < 70) "train" else if (b < 90) "val" else "test"
      assert(s == expect, s"bucket $b labeled $s")
    }
    assert(rows.map(_.getString(1)).distinct.sorted.length >= 2,
      "fixture too small to exercise more than one split")
  }

  test("the manifest is invariant under input partitioning and order") {
    val docs = (1L to 300L).map(i => (i, s"text body $i", s"l${i % 3}"))
      .toDF("doc_id", "text", "lang")
    def m(df: org.apache.spark.sql.DataFrame) =
      SplitPlan.manifest(SplitPlan.assign(df, "text"), "doc_id", "text", "lang")
        .collect().map(_.toString).toSeq
    assert(m(docs) == m(docs.repartition(17, col("lang"))))
    assert(m(docs) == m(docs.orderBy(col("doc_id").desc)))
  }

  test("manifest counts are exact on a hand corpus") {
    val docs = Seq(
      (10L, "one two three", "en"),
      (20L, "", "en")) // empty text: 0 tokens, 0 chars
      .toDF("doc_id", "text", "lang")
    val got = SplitPlan.manifest(SplitPlan.assign(docs, "text"),
        "doc_id", "text", "lang")
      .groupBy()
      .agg(sum("n_docs"), sum("n_tokens"), sum("n_chars"), sum("id_sum"))
      .collect().head
    assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3))
      == ((2L, 3L, 13L, 30L)))
  }

  test("invalid split percents are rejected") {
    val docs = Seq((1L, "x", "en")).toDF("doc_id", "text", "lang")
    intercept[IllegalArgumentException] {
      SplitPlan.assign(docs, "text", pctTrain = 90, pctVal = 10)
    }
    intercept[IllegalArgumentException] {
      SplitPlan.assign(docs, "text", pctTrain = 0, pctVal = 10)
    }
  }

  test("leakage finds shared n-grams across a hand-labeled boundary") {
    // bypass the hash assignment: leakage() only reads the split column
    val assigned = Seq(
      (1L, "a b c d e x", "en", "train"),
      (2L, "a b c d e y", "en", "val"),   // shares the 5-gram "a b c d e"
      (3L, "p q r s t u", "en", "val"),   // no overlap
      (4L, "short one", "de", "val"),     // < 5 tokens: contributes nothing
      (5L, "k l m n o p", "de", "train"))
      .toDF("doc_id", "text", "lang", "split")
    val got = SplitPlan.leakage(assigned, "doc_id", "text", "lang", n = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got === Array(
      ("de", 1L, 0L, 0L),
      ("en", 2L, 1L, 1L)))
  }

  test("leakage counts distinct grams and docs, not occurrences") {
    val assigned = Seq(
      (1L, "a b c d e a b c d e", "en", "train"), // gram appears twice
      (2L, "z a b c d e a b c d e z", "en", "val"))
      .toDF("doc_id", "text", "lang", "split")
    val got = SplitPlan.leakage(assigned, "doc_id", "text", "lang", n = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // train doc 1 has 5 DISTINCT 5-grams (the cycle rotations of
    // "a b c d e"); val doc 2 contains all of them, "a b c d e" twice —
    // each leaked gram counts once, the doc counts once
    assert(got === Array(("en", 1L, 1L, 5L)))
  }
}
