package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** fastText-style hashed-n-gram quality scoring — the standard
  * linear-classifier filter stage of an LLM data pipeline (Joulin et al.,
  * "Bag of Tricks for Efficient Text Classification", EACL 2017): a
  * document's features are its word unigrams and bigrams under the hashing
  * trick, the score is a linear margin over per-feature weights, and the
  * keep decision is sigmoid(margin) > 0.5 ⟺ margin > 0 (sigmoid is
  * monotone, so the decision — and the gate — needs no transcendental).
  *
  * Everything stays in EXACT integer arithmetic so the margin is
  * replayable cross-engine (q98's micro-unit discipline):
  *
  *   - gram hash: rolling-31 polynomial over the gram's char codes modulo
  *     the prime 1000003, seeded with the first char code — exactly
  *     DuckDB's `list_reduce([ascii(..)], (a,b) -> (a*31+b) % 1000003)`;
  *   - weight: `(hash mod 2001) - 1000` — an integer in [-1000, 1000],
  *     the "pretrained" hashed projection (deterministic in the feature
  *     hash, the shape a real classifier ships after training);
  *   - margin: the plain integer sum of weights over all unigram and
  *     bigram occurrences (bigram = "tok1 tok2", single-space joined).
  *
  * Tokens are runs of non-space characters (the corpus-wide `' +'` split
  * contract); empty/whitespace-only text has no grams and margin 0.
  * Intermediates stay below 2^40 (P² < 2^40, corpus docs are < 2^20
  * grams), so the sum never wraps.
  *
  * Scale shape: ONE codegen'd static call per row — no explode, no
  * shuffle, no UDF; the per-lang/per-decision aggregation above it is a
  * plain partial→final agg. At 100 TB this is a map-only scan.
  */
object QualityKernels {
  val P = 1000003L // prime modulus of the rolling feature hash
  val NW = 2001L   // weight table size: weights span [-1000, 1000]

  private def step(h: Long, c: Char): Long = (h * 31 + c) % P

  /** Fold chars [from, until) into `h`; a negative `h` means "unseeded"
    * (the first char code becomes the seed — list_reduce semantics).
    */
  private def hashRange(str: String, from: Int, until: Int, init: Long): Long = {
    var h = init
    var i = from
    while (i < until) {
      val c = str.charAt(i)
      h = if (h < 0) c.toLong else step(h, c)
      i += 1
    }
    h
  }

  private def weightOf(h: Long): Long = (h % NW) - 1000L

  /** All hashed gram ids, ONE PER OCCURRENCE (unigrams then, interleaved,
    * the bigram ending at each token) — the training-side view of exactly
    * the feature space [[qualityMargin]] scores:
    * `qualityMargin(t) == qualityFeatures(t).map(weightOf).sum` by
    * construction (same tokenizer loop, same rolling hash). The trainer
    * ([[graft.operators.QualityTrainer]]) aggregates these ids into
    * (feature, count) rows; inference under TRAINED weights joins the
    * same ids against the weight table.
    */
  def qualityFeatures(s: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val str = s.toString
    val n = str.length
    val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
    var prevStart = -1
    var prevEnd = -1
    var i = 0
    while (i < n) {
      while (i < n && str.charAt(i) == ' ') i += 1
      val start = i
      while (i < n && str.charAt(i) != ' ') i += 1
      if (i > start) {
        buf += hashRange(str, start, i, -1L)
        if (prevStart >= 0) {
          var h = hashRange(str, prevStart, prevEnd, -1L)
          h = step(h, ' ')
          buf += hashRange(str, start, i, h)
        }
        prevStart = start
        prevEnd = i
      }
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(buf.toArray)
  }

  /** Integer margin of the hashed unigram+bigram linear scorer. */
  def qualityMargin(s: UTF8String): Long = {
    val str = s.toString
    val n = str.length
    var total = 0L
    var prevStart = -1
    var prevEnd = -1
    var i = 0
    while (i < n) {
      while (i < n && str.charAt(i) == ' ') i += 1
      val start = i
      while (i < n && str.charAt(i) != ' ') i += 1
      if (i > start) {
        total += weightOf(hashRange(str, start, i, -1L))
        if (prevStart >= 0) {
          var h = hashRange(str, prevStart, prevEnd, -1L)
          h = step(h, ' ')
          h = hashRange(str, start, i, h)
          total += weightOf(h)
        }
        prevStart = start
        prevEnd = i
      }
    }
    total
  }
}

/** `quality_margin(text) → bigint`: codegen'd Catalyst expression. */
case class QualityMarginExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "quality_margin"
  override protected def nullSafeEval(input: Any): Any =
    QualityKernels.qualityMargin(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.QualityKernels.qualityMargin($c)")
  override protected def withNewChildInternal(newChild: Expression): QualityMarginExpr =
    copy(child = newChild)
}

/** `quality_features(text) → array<bigint>`: codegen'd gram-id extractor. */
case class QualityFeaturesExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "quality_features"
  override protected def nullSafeEval(input: Any): Any =
    QualityKernels.qualityFeatures(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.QualityKernels.qualityFeatures($c)")
  override protected def withNewChildInternal(newChild: Expression): QualityFeaturesExpr =
    copy(child = newChild)
}

object QualityExprs {
  import org.apache.spark.sql.graft.bridge.{column, expression}

  def qualityMargin(c: Column): Column = column(QualityMarginExpr(expression(c)))

  def qualityFeatures(c: Column): Column = column(QualityFeaturesExpr(expression(c)))

  /** Register `quality_margin` for spark.sql(...) use. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    org.apache.spark.sql.graft.bridge.registerFunction(spark, "quality_margin",
      exprs => QualityMarginExpr(exprs.head))
}
