package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** The Gopher repetition-filter battery (Rae et al., "Scaling Language
  * Models: Methods, Analysis & Insights from Training Gopher",
  * arXiv 2112.11446, Table A1) — the standard pre-training gate against
  * boilerplate/self-repeating documents. Same THRESHOLDS as MassiveText/
  * RefinedWeb; the character fractions use a pinned in-house convention
  * (see below) that differs from those pipelines at the margins — the
  * denominator here excludes inter-token separators while the top-n
  * numerator includes the joiner spaces, so fractions can exceed 100%
  * and short all-distinct docs can trip top-n where the paper's would
  * not. The convention is internally consistent, documented, and what
  * the oracle replays; it is not a bit-compatible reimplementation of
  * any published pipeline.
  *
  * Nine rules per document, each an exact integer numerator over one
  * denominator (total token characters):
  *
  *   - top-n-gram character fraction (n = 2, 3, 4): characters inside ALL
  *     occurrences of the single most frequent word n-gram —
  *     `count x chars(gram)`, ties broken toward the bytewise-smallest
  *     gram so both engines pick the same winner. Flag above 20/18/16 %.
  *   - duplicated-n-gram character fraction (n = 5..10): characters of
  *     tokens covered by at least one occurrence of any n-gram appearing
  *     >= 2 times — POSITION-UNION coverage (overlaps counted once), the
  *     interval-union semantics of the original. Flag above
  *     15/14/13/12/11/10 %.
  *
  * The paper's duplicate-line/paragraph rules (Table A1's other half)
  * are [[lineStats]]/[[lineAudit]] (round 13): the TESTDATA corpus is
  * single-line, so their gate runs over the planted multiline corpus
  * ([[graft.Planted.gopherMultilineRows]], the q185 pattern) — on
  * organic docs the kernel legitimately reports one line, zero dups.
  *
  * Character conventions, pinned so both engines measure the same
  * quantity: the denominator and the dup-n numerators count TOKEN
  * characters (separators excluded — coverage is a token-position set);
  * the top-n numerator is `count x len(joined gram)` with the (n-1)
  * single-space joiners included, the same string both engines build.
  * A doc shorter than n tokens scores 0 for that rule. All comparisons
  * are exact integers (`num x 100 > total x pct`), never a float.
  *
  * 100 TB shape: ONE codegen kernel call per document (all nine
  * numerators in a single pass over the token array — per-doc state is a
  * gram hashmap bounded by document length, never corpus vocabulary),
  * then one lang-keyed aggregate with map-side partials. No explode, no
  * join, no shuffle before the report — the kernel cost IS the operator,
  * exactly the [[PiiScrub]] scan shape.
  */
object GopherRepetition {

  /** (rule name, index into the kernel's numerator array, flag threshold
    * in integer percent). Order matches [[GopherKernels.stats]] layout.
    */
  val Rules: Seq[(String, Int, Int)] = Seq(
    ("top2", 1, 20), ("top3", 2, 18), ("top4", 3, 16),
    ("dup5", 4, 15), ("dup6", 5, 14), ("dup7", 6, 13),
    ("dup8", 7, 12), ("dup9", 8, 11), ("dup10", 9, 10))

  /** Per-document exact stats: id, lang, `total_chars` and one numerator
    * column per rule (`top2_chars` ... `dup10_chars`).
    */
  def stats(docs: DataFrame, textCol: String = "text",
            idCol: String = "doc_id", langCol: String = "lang"): DataFrame = {
    val st = GopherExprs.gopherStats(split(trim(col(textCol)), " +"))
    val withArr = docs.select(col(idCol), col(langCol), st.as("g"))
    val ruleCols = Rules.map { case (name, idx, _) =>
      element_at(col("g"), idx + 1).as(s"${name}_chars")
    }
    withArr.select(
      (Seq(col(idCol), col(langCol), element_at(col("g"), 1).as("total_chars"))
        ++ ruleCols): _*)
  }

  /** The line/paragraph half of Rae et al. Table A1 (round 13 — the
    * rules the single-line TESTDATA contract had made untestable until
    * the planted multiline corpus, [[graft.Planted.gopherMultilineRows]]):
    *
    *   - duplicate line / paragraph fraction: instances whose content
    *     occurs >= 2 times in the doc, over total instances — flag
    *     above 30 %;
    *   - duplicate line / paragraph CHARACTER fraction: characters of
    *     those duplicated instances over total segment characters —
    *     flag above 20 %.
    *
    * Pinned conventions (both engines): lines split on literal '\n',
    * paragraphs on literal '\n\n'; empty segments are excluded, all
    * others kept verbatim (no trim); characters are the segment's code
    * points, separators excluded (the [[GopherKernels]] denominator
    * discipline). All comparisons exact integers. One kernel call per
    * document, per-doc segment map — same scan shape as [[stats]].
    *
    * Layout of [[lineStats]]: (doc_id, lang, n_lines, dup_lines,
    * line_chars, dup_line_chars, n_paras, dup_paras, para_chars,
    * dup_para_chars).
    */
  def lineStats(docs: DataFrame, textCol: String = "text",
                idCol: String = "doc_id", langCol: String = "lang"): DataFrame = {
    val names = Seq("n_lines", "dup_lines", "line_chars", "dup_line_chars",
      "n_paras", "dup_paras", "para_chars", "dup_para_chars")
    val g = GopherExprs.gopherLineStats(col(textCol))
    docs.select(
      (Seq(col(idCol), col(langCol)) ++ names.zipWithIndex.map {
        case (n, i) => element_at(g, i + 1).as(n)
      }): _*)
  }

  /** (rule, numerator col, denominator col, flag threshold %). */
  val LineRules: Seq[(String, String, String, Int)] = Seq(
    ("dup_line_frac", "dup_lines", "n_lines", 30),
    ("dup_para_frac", "dup_paras", "n_paras", 30),
    ("dup_line_char_frac", "dup_line_chars", "line_chars", 20),
    ("dup_para_char_frac", "dup_para_chars", "para_chars", 20))

  /** Per-language audit over the line/paragraph rules — the [[audit]]
    * shape with per-rule denominators.
    */
  def lineAudit(docs: DataFrame, textCol: String = "text",
                idCol: String = "doc_id", langCol: String = "lang"): DataFrame = {
    val s = lineStats(docs, textCol, idCol, langCol)
    def flagged(num: String, den: String, pct: Int): Column =
      col(num) * 100 > col(den) * pct
    val perRule = LineRules.map { case (n, num, den, p) =>
      sum(when(flagged(num, den, p), 1L).otherwise(0L)).as(s"n_$n")
    }
    val anyFlag = LineRules.map { case (_, num, den, p) =>
      flagged(num, den, p) }.reduce(_ || _)
    s.groupBy(col(langCol))
      .agg(count(lit(1)).as("n_docs"),
        (perRule :+ sum(when(anyFlag, 1L).otherwise(0L)).as("n_flagged")): _*)
      .orderBy(col(langCol))
  }

  /** Per-language audit: document count, per-rule flagged counts, and the
    * count flagged by ANY rule — the battery's keep/drop decision mass.
    */
  def audit(docs: DataFrame, textCol: String = "text",
            idCol: String = "doc_id", langCol: String = "lang"): DataFrame = {
    val s = stats(docs, textCol, idCol, langCol)
    def flagged(name: String, pct: Int): Column =
      col(s"${name}_chars") * 100 > col("total_chars") * pct
    val anyFlag = Rules.map { case (n, _, p) => flagged(n, p) }
      .reduce(_ || _)
    val perRule = Rules.map { case (n, _, p) =>
      sum(when(flagged(n, p), 1L).otherwise(0L)).as(s"n_$n")
    }
    s.groupBy(col(langCol))
      .agg(count(lit(1)).as("n_docs"),
        (perRule :+ sum(when(anyFlag, 1L).otherwise(0L)).as("n_flagged")): _*)
      .orderBy(col(langCol))
  }
}

/** Single-pass kernel for [[GopherRepetition]]: all nine numerators plus
  * the denominator from one token array.
  */
object GopherKernels {

  /** Layout: [total_chars, top2, top3, top4, dup5, dup6, dup7, dup8,
    * dup9, dup10] — all exact longs. NULL tokens count as empty strings
    * (Spark's `split` never produces them; defensive only).
    */
  def stats(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    val words = new Array[String](n)
    val chars = new Array[Int](n)
    var total = 0L
    var i = 0
    while (i < n) {
      val w = if (toks.isNullAt(i)) "" else toks.getUTF8String(i).toString
      words(i) = w
      chars(i) = w.codePointCount(0, w.length)
      total += chars(i)
      i += 1
    }
    val out = new Array[Long](10)
    out(0) = total
    var r = 1
    var g = 2
    while (g <= 4) { out(r) = topGramChars(words, chars, g); r += 1; g += 1 }
    g = 5
    while (g <= 10) { out(r) = dupCoverageChars(words, chars, g); r += 1; g += 1 }
    new GenericArrayData(out)
  }

  /** count(top gram) x chars(top gram); ties toward the UTF-8-bytewise
    * smallest gram (matching SQL `ORDER BY cnt DESC, g ASC` under binary
    * collation). chars(gram) includes the (g-1) single-space joiners —
    * the gram STRING's length, the same quantity `len(g)` measures on the
    * oracle side.
    */
  private def topGramChars(words: Array[String], chars: Array[Int],
                           g: Int): Long = {
    val n = words.length
    if (n < g) return 0L
    val counts = new java.util.HashMap[String, Long]()
    var i = 0
    while (i + g <= n) {
      counts.merge(join(words, i, g), 1L, (a, b) => a + b)
      i += 1
    }
    var bestCnt = 0L
    var bestGram: String = null
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue
      if (c > bestCnt || (c == bestCnt && bytewiseLess(e.getKey, bestGram))) {
        bestCnt = c
        bestGram = e.getKey
      }
    }
    bestCnt * bestGram.codePointCount(0, bestGram.length)
  }

  /** Token characters covered by the union of all occurrences of every
    * duplicated (count >= 2) g-gram.
    */
  private def dupCoverageChars(words: Array[String], chars: Array[Int],
                               g: Int): Long = {
    val n = words.length
    if (n < g) return 0L
    val counts = new java.util.HashMap[String, Long]()
    var i = 0
    while (i + g <= n) {
      counts.merge(join(words, i, g), 1L, (a, b) => a + b)
      i += 1
    }
    val covered = new Array[Boolean](n)
    i = 0
    while (i + g <= n) {
      if (counts.get(join(words, i, g)) >= 2L) {
        var p = i
        while (p < i + g) { covered(p) = true; p += 1 }
      }
      i += 1
    }
    var sum = 0L
    i = 0
    while (i < n) { if (covered(i)) sum += chars(i); i += 1 }
    sum
  }

  private def join(words: Array[String], from: Int, g: Int): String = {
    val sb = new java.lang.StringBuilder
    var j = from
    while (j < from + g) {
      if (j > from) sb.append(' ')
      sb.append(words(j))
      j += 1
    }
    sb.toString
  }

  /** UTF-8 bytewise a < b (b == null counts as +infinity). */
  private def bytewiseLess(a: String, b: String): Boolean = {
    if (b == null) return true
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val m = math.min(x.length, y.length)
    var i = 0
    while (i < m) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }
}

/** `gopher_stats(tokens) → array<bigint>` (see [[GopherKernels.stats]]). */
case class GopherStatsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gopher_stats"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(org.apache.spark.sql.types.StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs array<string> tokens, got ${other.simpleString}")
    }
  override protected def nullSafeEval(a: Any): Any =
    GopherKernels.stats(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.operators.GopherKernels.stats($a)")
  override protected def withNewChildInternal(newChild: Expression): GopherStatsExpr =
    copy(child = newChild)
}

/** Single-pass kernel for the line/paragraph rules: all eight exact-long
  * numerators/denominators from one pass over the raw text. Layout:
  * [n_lines, dup_lines, line_chars, dup_line_chars, n_paras, dup_paras,
  * para_chars, dup_para_chars]. Splits are LITERAL ('\n' / '\n\n'),
  * empty segments excluded, no trim — the same segment set
  * `string_split(text, chr(10))` yields on the oracle side.
  */
object GopherLineKernels {

  def stats(text: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    val s = if (text == null) "" else text.toString
    val out = new Array[Long](8)
    segStats(s.split("\n", -1), out, 0)
    segStats(s.split("\n\n", -1), out, 4)
    new GenericArrayData(out)
  }

  private def segStats(segs: Array[String], out: Array[Long],
                       off: Int): Unit = {
    val counts = new java.util.HashMap[String, Long]()
    var i = 0
    while (i < segs.length) {
      if (segs(i).length > 0) counts.merge(segs(i), 1L, (a, b) => a + b)
      i += 1
    }
    var n = 0L; var dupN = 0L; var chars = 0L; var dupChars = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue
      val len = e.getKey.codePointCount(0, e.getKey.length).toLong
      n += c; chars += c * len
      if (c >= 2L) { dupN += c; dupChars += c * len }
    }
    out(off) = n; out(off + 1) = dupN
    out(off + 2) = chars; out(off + 3) = dupChars
  }
}

/** `gopher_line_stats(text) → array<bigint>` (see [[GopherLineKernels]]). */
case class GopherLineStatsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gopher_line_stats"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs a string document, got ${other.simpleString}")
    }
  override protected def nullSafeEval(a: Any): Any =
    GopherLineKernels.stats(
      a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.operators.GopherLineKernels.stats($a)")
  override protected def withNewChildInternal(newChild: Expression)
      : GopherLineStatsExpr = copy(child = newChild)
}

object GopherExprs {
  import org.apache.spark.sql.graft.bridge.{column, expression}

  def gopherStats(toks: Column): Column =
    column(GopherStatsExpr(expression(toks)))

  def gopherLineStats(text: Column): Column =
    column(GopherLineStatsExpr(expression(text)))
}
