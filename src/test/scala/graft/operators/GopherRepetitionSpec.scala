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

  private def lineStatsOf(text: String): Seq[Long] =
    Seq((1L, text, "en")).toDF("doc_id", "text", "lang")
      .select(GopherExprs.gopherLineStats(col("text")).as("g"))
      .head.getSeq[Long](0)

  test("line kernel: counts, duplicate instances, char totals") {
    // lines: ab x2, xyz x1 -> 3 lines, 2 dup instances, chars 2+2+3=7,
    // dup chars 4. Paragraphs (no \n\n): ONE paragraph = the whole text
    // with its embedded newlines, 6 + 2 separators... para chars count
    // the raw segment: "ab\nxyz\nab" = 9 code points.
    val s = lineStatsOf("ab\nxyz\nab")
    assert(s == Seq(3L, 2L, 7L, 4L, 1L, 0L, 9L, 0L))
  }

  test("line kernel: empty segments excluded, paragraphs split on \\n\\n") {
    // "p1\n\np2\n\np1": lines [p1, p2, p1] (empties from \n\n dropped),
    // paragraphs [p1, p2, p1]
    val s = lineStatsOf("p1\n\np2\n\np1")
    assert(s == Seq(3L, 2L, 6L, 4L, 3L, 2L, 6L, 4L))
    // single-line doc (the organic TESTDATA shape): 1 line, 0 dups
    val t = lineStatsOf("just one line")
    assert(t == Seq(1L, 0L, 13L, 0L, 1L, 0L, 13L, 0L))
    // empty doc: all zeros
    assert(lineStatsOf("") == Seq.fill(8)(0L))
  }

  test("multiline-paragraph identity includes the embedded newline") {
    // paras [l1\nl2, l3, l1\nl2]: dup instances 2 of 3; para chars count
    // the embedded \n (raw segment code points: 5 each for 'ab\ncd')
    val s = lineStatsOf("ab\ncd\n\nee\n\nab\ncd")
    assert(s(4) == 3L && s(5) == 2L) // n_paras, dup_paras
    assert(s(6) == 5L + 2L + 5L && s(7) == 10L)
    assert(s(0) == 5L && s(1) == 4L) // lines ab,cd,ee,ab,cd
  }

  test("lineAudit: char rule fires where the count rule does not") {
    // planted +202 design: long line twice in 10 lines -> dup_line_frac
    // exactly 20% (NOT > 30%), dup_line_chars far above 20%
    val long = (0 until 20).map(j => s"L$j").mkString(" ")
    val text = ((0 until 8).map(j => s"s$j") ++ Seq(long, long)).mkString("\n")
    val docs = Seq((1L, text, "en")).toDF("doc_id", "text", "lang")
    val row = GopherRepetition.lineAudit(docs).collect()(0)
    assert(row.getAs[Long]("n_dup_line_frac") == 0L)
    assert(row.getAs[Long]("n_dup_line_char_frac") == 1L)
    assert(row.getAs[Long]("n_flagged") == 1L)
  }

  test("line rules match the planted q190 construction end-to-end") {
    val docs = graft.Planted.gopherMultilineDocs(spark)
    val r = GopherRepetition.lineStats(docs)
      .orderBy("doc_id").collect()
    val base = graft.Planted.gopherBase + 200
    val byId = r.map(row => row.getLong(0) -> row).toMap
    // +200: 10 lines, 4 dup instances
    assert(byId(base).getAs[Long]("n_lines") == 10L)
    assert(byId(base).getAs[Long]("dup_lines") == 4L)
    // +201: 3 paras, 2 dup
    assert(byId(base + 1).getAs[Long]("n_paras") == 3L)
    assert(byId(base + 1).getAs[Long]("dup_paras") == 2L)
    // +204 control: zero dup numerators everywhere
    val c = byId(base + 4)
    assert(c.getAs[Long]("dup_lines") == 0L && c.getAs[Long]("dup_paras") == 0L
      && c.getAs[Long]("dup_line_chars") == 0L
      && c.getAs[Long]("dup_para_chars") == 0L)
  }
}
