package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextExprsSpec extends SparkSpec {
  import spark.implicits._

  private val words = Seq("the", "and", "of", "to", "a")

  test("stopword_count == regexp_count(\\b(alternation)\\b) on varied text") {
    val rng = new scala.util.Random(42)
    val vocab = words ++ Seq("theory", "band", "often", "too", "ab", "x1",
      "_the", "the_", "thé", "a-b", "and.", ",of,", "", "  ", "A", "THE")
    val rows = (1 to 200).map { i =>
      (i, (1 to rng.nextInt(40)).map(_ => vocab(rng.nextInt(vocab.length)))
        .mkString(rng.nextBoolean().toString.take(1), " ", ""))
    } ++ Seq(
      (1001, "the and of to a"),
      (1002, "the,and;of(to)a"),
      (1003, "theandoftoa"),
      (1004, "the the the"),
      (1005, ""),
      (1006, "a"),
      (1007, "a_b the_ _the 9a a9"),
      (1008, "thé façade naïve the"))
    val df = rows.toDF("id", "text")
    val got = df.select($"id",
      TextExprs.stopwordCount(lower($"text"), words).as("k"),
      regexp_count(lower($"text"), lit(s"\\b(${words.mkString("|")})\\b")).as("r"))
      .collect()
    got.foreach { row =>
      assert(row.getInt(1) === row.getInt(2), s"id=${row.getInt(0)}")
    }
  }

  test("stopword_count is null-safe and rejects non-word-char words") {
    val df = Seq(Some("the end"), None).toDF("text")
    val out = df.select(TextExprs.stopwordCount(lower($"text"), words)).collect()
    assert(out(0).getInt(0) === 1)
    assert(out(1).isNullAt(0))
    intercept[IllegalArgumentException] {
      StopwordCountExpr(
        org.apache.spark.sql.graft.bridge.expression(lit("x")), Seq("a|b"))
    }
  }

  test("stopword_count == regexp_count on the real documents table") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val mismatches = docs.select(
      TextExprs.stopwordCount(lower($"text"), words).as("k"),
      regexp_count(lower($"text"), lit(s"\\b(${words.mkString("|")})\\b")).as("r"))
      .filter($"k" =!= $"r").count()
    assert(mismatches === 0)
  }

  test("langId staged and single-column forms agree on documents sample") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet").limit(200)
    val staged = TextFunctions.withLangId(docs, "text", "lang")
      .select($"doc_id", $"lang")
    val single = docs.select($"doc_id",
      TextFunctions.langId($"text").as("lang"))
    assert(staged.collect().toSeq.sortBy(_.getLong(0)) ===
      single.collect().toSeq.sortBy(_.getLong(0)))
  }
}
