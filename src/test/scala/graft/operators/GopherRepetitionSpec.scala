package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Truth tables for the Gopher repetition battery: hand-computed
  * numerators per rule, tie-breaking, coverage-union semantics, threshold
  * strictness, and degenerate docs.
  */
class GopherRepetitionSpec extends SparkSpec {
  import spark.implicits._

  private def statsOf(text: String): Seq[Long] =
    Seq((1L, text, "en")).toDF("doc_id", "text", "lang")
      .select(GopherExprs.gopherStats(split(trim(col("text")), " +")).as("g"))
      .head.getSeq[Long](0)

  test("top-2-gram: count x joined-string chars, bytewise-min tie-break") {
    // "aa bb aa bb cc": 2-grams (aa,bb)x2, (bb,aa)x1, (bb,cc)x1
    val s = statsOf("aa bb aa bb cc")
    assert(s(0) == 10)          // 5 tokens x 2 chars
    assert(s(1) == 2 * 5)       // "aa bb" twice, len 5 with the joiner
    // all 2-grams tied at count 1: winner is the bytewise-smallest gram
    // string ("bb aa" < "cc bb"), num = 1 x len("bb aa") = 5
    val t = statsOf("cc bb aa")
    assert(t(1) == 1 * 5)
  }

  test("dup-n coverage is a position UNION, overlaps counted once") {
    // "x y x y x": dup 2-grams (x,y)x2 and (y,x)x2 cover ALL 5 positions
    val s = statsOf("x y x y x")
    assert(s(0) == 5)
    // top2 = "x y" twice, len 3
    assert(s(1) == 6)
    // no 5-gram repeats (only one 5-gram exists)
    assert(s(4) == 0)
  }

  test("dup-5 on a repeated block covers exactly the block") {
    // 5-token block repeated twice + 5 unique fillers (the q185 doc shape)
    val block = (0 until 5).map(j => s"b$j")
    val fill = (0 until 5).map(j => s"f$j")
    val s = statsOf((block ++ block ++ fill).mkString(" "))
    assert(s(0) == 30)          // 15 tokens x 2 chars
    assert(s(4) == 20)          // dup5: first 10 positions covered
    assert(s(5) == 0)           // no duplicated 6-gram
  }

  test("docs shorter than n score 0 for rule n; empty text scores 0") {
    val s = statsOf("one two three four")
    assert(s(4) == 0 && s(9) == 0) // < 5 tokens of any 5-gram
    val e = statsOf("")
    assert(e(0) == 0 && e.drop(1).forall(_ == 0L))
  }

  test("audit flags are strict (> not >=) exact-integer comparisons") {
    // doc 1: top2 num = 6 ("q q" twice, len 3), total = 3 -> flagged.
    // doc 2 (control): 60 distinct 3-char tokens, total = 180; the
    // largest single-occurrence numerator is top4 = 15 -> 1500 <= 2880,
    // no rule trips. (Short all-distinct docs DO flag top4 — one 4-gram
    // with joiners is >16% of anything under ~94 chars — so the control
    // must be long; q184's organic flags are mostly this length effect.)
    val docs = Seq(
      (1L, "q q q", "en"),
      (2L, (0 until 60).map(j => "u%02d".format(j)).mkString(" "), "en"))
      .toDF("doc_id", "text", "lang")
    val r = GopherRepetition.audit(docs).collect()
    assert(r.length == 1)
    val row = r(0)
    assert(row.getAs[Long]("n_docs") == 2)
    assert(row.getAs[Long]("n_top2") == 1)
    assert(row.getAs[Long]("n_flagged") == 1)
  }

  test("threshold boundary: num x 100 == total x pct is NOT flagged") {
    // dup5 threshold is 15%. Build total = 2000 chars with dup5 coverage
    // exactly 300 (300*100 == 2000*15): a 5-token block of 30-char tokens
    // repeated twice (coverage 10 x 30 = 300) + filler of 1700 chars.
    val block = (0 until 5).map(j => "b%d".format(j) + "x" * 28) // 30 chars
    val fill = (0 until 17).map(j => s"f%02d".format(j) + "y" * 97) // 100
    val text = (block ++ block ++ fill).mkString(" ")
    val s = statsOf(text)
    assert(s(0) == 2000 && s(4) == 300)
    val docs = Seq((1L, text, "en")).toDF("doc_id", "text", "lang")
    val row = GopherRepetition.audit(docs).collect()(0)
    assert(row.getAs[Long]("n_dup5") == 0L) // equality is below the bar
  }
}
