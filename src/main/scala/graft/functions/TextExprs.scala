package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** JVM kernels for text-analysis expressions, kept as static methods so
  * generated code calls them directly (same whole-stage-codegen technique as
  * [[HashKernels]]).
  */
object TextKernels {

  /** ASCII word character, matching the default (non-UNICODE_CHARACTER_CLASS)
    * `\w` of both java.util.regex and RE2 — the classes that define `\b` in
    * Spark's regexp_count and DuckDB's regexp_extract_all respectively.
    */
  @inline def isWordChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '_'

  /** Count of maximal ASCII-word-character runs in `s` that exactly equal one
    * of `words`. Equivalent to `regexp_count(s, "\\b(w1|...|wn)\\b")` for
    * literal single-word alternatives: a `\b`-delimited match must start at a
    * word-run start and extend to the run's end, so matches are exactly the
    * whole tokens — but this is a single allocation-free scan instead of a
    * backtracking alternation that materializes every match.
    */
  def stopwordCount(s: UTF8String, words: Array[String]): Int = {
    val str = s.toString
    val n = str.length
    var i = 0
    var count = 0
    while (i < n) {
      if (isWordChar(str.charAt(i))) {
        val start = i
        while (i < n && isWordChar(str.charAt(i))) i += 1
        val len = i - start
        var w = 0
        while (w < words.length) {
          val word = words(w)
          if (word.length == len && str.regionMatches(start, word, 0, len)) {
            count += 1
            w = words.length
          } else w += 1
        }
      } else i += 1
    }
    count
  }
}

/** `stopword_count(text)` for a fixed word list → int: codegen'd count-only
  * replacement for `regexp_count(text, "\\b(w1|...)\\b")` (the language-ID
  * hot path — regexp_count plans as size(regexp_extract_all(...)), which
  * materializes every match as a UTF8String just to count it).
  */
case class StopwordCountExpr(child: Expression, words: Seq[String])
    extends UnaryExpression {
  require(words.nonEmpty && words.forall(_.forall(TextKernels.isWordChar)),
    "stopword_count needs non-empty words made of ASCII word characters")

  @transient private lazy val wordArr: Array[String] = words.toArray

  override def dataType: DataType = IntegerType
  override def prettyName: String = "stopword_count"
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.stopwordCount(input.asInstanceOf[UTF8String], wordArr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val arr = ctx.addReferenceObj("stopwords", wordArr, "java.lang.String[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.stopwordCount($c, $arr)")
  }
  override protected def withNewChildInternal(newChild: Expression): StopwordCountExpr =
    copy(child = newChild)
}

/** Column-API front door. */
object TextExprs {
  import org.apache.spark.sql.graft.bridge.{column, expression}

  def stopwordCount(c: Column, words: Seq[String]): Column =
    column(StopwordCountExpr(expression(c), words))
}
