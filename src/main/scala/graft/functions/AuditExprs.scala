package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Embedding-audit kernels: single codegen'd static calls over the vector
  * (the [[VecKernels]] technique — higher-order folds interpret per
  * element; these stay inside whole-stage codegen).
  *
  * Cross-engine contract: `quantSqNormFloor` quantizes each element with
  * FLOOR(x · scale) — floor of a double is engine-exact (the q159 rule; no
  * round-half tie to disagree on) — and sums the squared BIGINT quants, an
  * order-independent integer. Non-finite elements are excluded from the
  * norm and counted by `nonFiniteCount`; the two together make a vector's
  * audit verdict a pure integer fact both engines derive identically.
  */
object AuditKernels {

  /** Count of NaN/±Inf elements (array<double>). */
  def nonFiniteCount(a: ArrayData): Long = {
    val n = a.numElements()
    var c = 0L
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) c += 1L
      i += 1
    }
    c
  }

  /** Σ floor(xᵢ·scale)² over FINITE elements, exact BIGINT. */
  def quantSqNormFloor(a: ArrayData, scale: Double): Long = {
    val n = a.numElements()
    var s = 0L
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      if (!java.lang.Double.isNaN(x) && !java.lang.Double.isInfinite(x)) {
        val q = math.floor(x * scale).toLong
        s += q * q
      }
      i += 1
    }
    s
  }
}

/** `non_finite_count(a) → bigint` (a: array<double>). */
case class NonFiniteCountExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "non_finite_count"
  override protected def nullSafeEval(a: Any): Any =
    AuditKernels.nonFiniteCount(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.AuditKernels.nonFiniteCount($a)")
  override protected def withNewChildInternal(newChild: Expression): NonFiniteCountExpr =
    copy(child = newChild)
}

/** `quant_sq_norm(a) → bigint`: Σ floor(xᵢ·scale)² over finite elements. */
case class QuantSqNormExpr(child: Expression, scale: Double) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "quant_sq_norm"
  override protected def nullSafeEval(a: Any): Any =
    AuditKernels.quantSqNormFloor(a.asInstanceOf[ArrayData], scale)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.AuditKernels.quantSqNormFloor($a, ${scale}D)")
  override protected def withNewChildInternal(newChild: Expression): QuantSqNormExpr =
    copy(child = newChild)
}

object AuditExprs {
  import org.apache.spark.sql.graft.bridge.{column, expression}

  /** Count of NaN/±Inf elements of an array<double> column. */
  def nonFiniteCount(vec: Column): Column =
    column(NonFiniteCountExpr(expression(vec)))

  /** Exact integer quantized squared norm: Σ floor(xᵢ·scale)². */
  def quantSqNorm(vec: Column, scale: Double): Column =
    column(QuantSqNormExpr(expression(vec), scale))
}
