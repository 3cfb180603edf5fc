package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType}

/** Static vector kernels + codegen'd Catalyst expressions for the hot vector
  * math (dot, norm, squared distance / argmin against constant centroids).
  *
  * WHY: Spark's higher-order folds (`aggregate(zip_with(...))`) interpret
  * their lambda per array element (~µs each) — they dominated the array
  * K-means assignment and the sign-LSH signatures. Expanding to flat
  * per-element expression trees is worse (hundreds of nodes per row blow
  * past codegen method limits and fall back to per-node interpretation).
  * A single codegen'd STATIC CALL over the ArrayData — the same technique
  * as [[HashKernels]] — keeps the whole loop in one JIT-compiled method and
  * stays inside whole-stage codegen.
  *
  * Fold order matches the `aggregate(..., 0.0, _ + _)` forms term-for-term
  * (index-ascending, accumulator starts at 0.0), so results are
  * BIT-IDENTICAL to the built-in versions they replace — no oracle or
  * golden-test drift.
  */
object VecKernels {
  // PRECONDITION for every kernel: array ELEMENTS are non-null (a null
  // ARRAY is handled by the expressions' null-safe wrappers). All engine
  // call sites cast from parquet float vectors and filter null arrays; a
  // null element would read as an unspecified primitive here, where the
  // old fold propagated null. Don't feed these expressions arrays with
  // null elements.

  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }

  def norm(a: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val x = a.getDouble(i); s += x * x; i += 1 }
    math.sqrt(s)
  }

  /** Σ (vᵢ - cᵢ)² against a constant centroid. */
  def sqDist(a: ArrayData, c: Array[Double]): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val d = a.getDouble(i) - c(i); s += d * d; i += 1 }
    s
  }

  /** First-index-wins argmin over k centroids flattened row-major into
    * `flat` (k·d doubles) — same tie-break contract as the segmentation
    * K-means (a later centroid wins only with a strictly smaller distance).
    */
  def argmin(a: ArrayData, flat: Array[Double], k: Int): Int = {
    val d = flat.length / k
    var best = 0
    var bestDist = Double.MaxValue
    var j = 0
    while (j < k) {
      var s = 0.0
      var i = 0
      val off = j * d
      while (i < d) { val x = a.getDouble(i) - flat(off + i); s += x * x; i += 1 }
      if (s < bestDist) { bestDist = s; best = j }
      j += 1
    }
    best
  }

  /** The argmin loop's DISTANCE: min over k centroids of Σ (vᵢ − cᵢ)² —
    * the per-subspace quantization distortion an assignment incurs
    * (AnnIndex.driftAudit's kernel). Same loop, same first-strictly-
    * smaller semantics; only the returned quantity differs.
    */
  def minDist(a: ArrayData, flat: Array[Double], k: Int): Double = {
    val d = flat.length / k
    var bestDist = Double.MaxValue
    var j = 0
    while (j < k) {
      var s = 0.0
      var i = 0
      val off = j * d
      while (i < d) { val x = a.getDouble(i) - flat(off + i); s += x * x; i += 1 }
      if (s < bestDist) bestDist = s
      j += 1
    }
    bestDist
  }
}

/** `vec_dot(a, b) → double` (both sides array<double>). */
case class DotVecExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecKernels.dot($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotVecExpr =
    copy(left = l, right = r)
}

/** `vec_norm(a) → double`. */
case class NormVecExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_norm"
  override protected def nullSafeEval(a: Any): Any =
    VecKernels.norm(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VecKernels.norm($a)")
  override protected def withNewChildInternal(newChild: Expression): NormVecExpr =
    copy(child = newChild)
}

/** Squared L2 distance to a constant centroid (centroid rides in the plan,
  * shipped to executors as a referenced object — no per-row construction).
  */
case class SqDistConstExpr(child: Expression, centroid: Array[Double])
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_sqdist"
  override protected def nullSafeEval(a: Any): Any =
    VecKernels.sqDist(a.asInstanceOf[ArrayData], centroid)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroid", centroid, "double[]")
    defineCodeGen(ctx, ev, a => s"graft.functions.VecKernels.sqDist($a, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): SqDistConstExpr =
    copy(child = newChild)
}

/** Nearest-centroid index over a constant centroid set, fused into one loop
  * (first-index-wins ties).
  */
case class ArgminConstExpr(child: Expression, flat: Array[Double], k: Int)
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "vec_argmin"
  override protected def nullSafeEval(a: Any): Any =
    VecKernels.argmin(a.asInstanceOf[ArrayData], flat, k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("flatCentroids", flat, "double[]")
    defineCodeGen(ctx, ev, a => s"graft.functions.VecKernels.argmin($a, $ref, $k)")
  }
  override protected def withNewChildInternal(newChild: Expression): ArgminConstExpr =
    copy(child = newChild)
}

/** Min squared distance over a constant centroid set — the quantization
  * distortion of assigning the vector to its nearest centroid.
  */
case class MinDistConstExpr(child: Expression, flat: Array[Double], k: Int)
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_mindist"
  override protected def nullSafeEval(a: Any): Any =
    VecKernels.minDist(a.asInstanceOf[ArrayData], flat, k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("flatCentroids", flat, "double[]")
    defineCodeGen(ctx, ev, a => s"graft.functions.VecKernels.minDist($a, $ref, $k)")
  }
  override protected def withNewChildInternal(newChild: Expression): MinDistConstExpr =
    copy(child = newChild)
}

/** Column-API front door. */
object VectorExprs {
  import org.apache.spark.sql.graft.bridge.{column, expression}

  def dotVec(a: Column, b: Column): Column =
    column(DotVecExpr(expression(a), expression(b)))
  def normVec(a: Column): Column = column(NormVecExpr(expression(a)))
  def sqDistConst(a: Column, c: Array[Double]): Column =
    column(SqDistConstExpr(expression(a), c))
  def argminConst(a: Column, centroids: Array[Array[Double]]): Column =
    column(ArgminConstExpr(expression(a), centroids.flatten, centroids.length))
  def minDistConst(a: Column, centroids: Array[Array[Double]]): Column =
    column(MinDistConstExpr(expression(a), centroids.flatten, centroids.length))

  /** Register `vec_dot` / `vec_norm` for spark.sql(...) use (the
    * constant-centroid forms have no SQL-literal spelling and stay
    * Column-API-only).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    org.apache.spark.sql.graft.bridge.registerFunction(spark, "vec_dot",
      exprs => DotVecExpr(exprs(0), exprs(1)))
    org.apache.spark.sql.graft.bridge.registerFunction(spark, "vec_norm",
      exprs => NormVecExpr(exprs.head))
  }
}
