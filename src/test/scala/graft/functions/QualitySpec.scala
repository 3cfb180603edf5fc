package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** The codegen kernel against an INDEPENDENT Scala reference (split +
  * sliding + fold — allocation-style, nothing shared with the kernel's
  * single-pass char walk), plus tokenization edges and the SQL route.
  */
class QualitySpec extends SparkSpec {
  import spark.implicits._

  private def ref(text: String): Long = {
    val toks = text.trim.split(" +").filter(_.nonEmpty).toSeq
    val grams = toks ++ toks.sliding(2).filter(_.size == 2).map(_.mkString(" "))
    grams.map { g =>
      val h = g.drop(1).foldLeft(g.head.toLong) { (a, c) =>
        (a * 31 + c) % 1000003L
      }
      (h % 2001L) - 1000L
    }.sum
  }

  private def kernel(text: String): Long =
    QualityKernels.qualityMargin(UTF8String.fromString(text))

  test("kernel matches the independent reference on edge cases") {
    val cases = Seq(
      "", " ", "   ", "one", "one two", "one two three",
      "  leading and trailing  ", "double  space   runs",
      "repeated repeated repeated", "a b a b a b",
      "w13758 table w7848 w4185 w24730 w8021 merge scan slow")
    for (c <- cases) assert(kernel(c) === ref(c), s"case: '$c'")
  }

  test("margin is a sum over gram occurrences, not distinct grams") {
    def w(gram: String): Long = {
      val h = gram.drop(1).foldLeft(gram.head.toLong) { (a, c) =>
        (a * 31 + c) % 1000003L
      }
      (h % 2001L) - 1000L
    }
    assert(kernel("x") === w("x"))
    assert(kernel("x x") === 2 * w("x") + w("x x"),
      "the repeated unigram must count twice")
    assert(kernel("x x x") === 3 * w("x") + 2 * w("x x"),
      "both bigram occurrences must count")
    assert(kernel("ab cd") === w("ab") + w("cd") + w("ab cd"))
  }

  test("DataFrame column + SQL registration agree on corpus docs") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text")).limit(50)
    val viaColumn = docs
      .select(col("doc_id"), QualityExprs.qualityMargin(col("text")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    docs.createOrReplaceTempView("qspec_docs")
    QualityExprs.register(spark)
    val viaSql = spark.sql(
      "SELECT doc_id, quality_margin(text) AS m FROM qspec_docs")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaColumn === viaSql)
    val local = docs.collect().map(r => r.getLong(0) -> ref(r.getString(1))).toMap
    assert(viaColumn === local, "distributed margins must equal the reference")
  }
}
