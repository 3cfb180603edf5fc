package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** Codegen'd sorted-set kernels.
  *
  * `array_intersect` is the general tool: it builds a hash set from one side
  * PER ROW (allocation + hashing for every call) because it cannot assume
  * order. A join that intersects adjacency/posting lists millions of times
  * per stage can afford to sort each list ONCE at build time (inside its
  * `collect_list` aggregation) and replace the per-row hash set with a
  * linear merge — zero hashing, zero per-row scratch state, one output
  * allocation. [[VdeltaKernels]] is the flagship consumer — since the
  * round-12 packed-adjacency overhaul, [[graft.operators.Triangles]]'s
  * probe join intersects varint-delta-packed lists via `vdelta_intersect`
  * (12M calls at sf1); `sorted_intersect` remains the unpacked-form SQL
  * surface for ad-hoc queries over plain `array<bigint>` columns.
  */
object SetKernels {

  private val EMPTY = new GenericArrayData(Array.emptyLongArray)

  /** Intersection of two ASCENDING-sorted, duplicate-free long arrays
    * (ascending output). Precondition is the caller's: on unsorted input
    * the result is undefined (it stays a subset of the true intersection
    * but may miss elements). O(|a|+|b|), no per-row scratch allocation
    * beyond the result.
    */
  def sortedIntersect(a: ArrayData, b: ArrayData): ArrayData = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 || nb == 0) return EMPTY
    val out = new Array[Long](if (na < nb) na else nb)
    var i = 0; var j = 0; var k = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else { out(k) = x; k += 1; i += 1; j += 1 }
    }
    if (k == 0) EMPTY
    else if (k == out.length) new GenericArrayData(out)
    else new GenericArrayData(java.util.Arrays.copyOf(out, k))
  }
}

/** `sorted_intersect(a, b) → array<bigint>` — both sides ascending-sorted,
  * duplicate-free `array<bigint>` (e.g. `sort_array(collect_list(...))` of
  * distinct keys). Null-in = null-out; elements must be non-null.
  */
case class SortedIntersectExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sorted_intersect"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs two array<bigint> inputs, got " +
          s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }
  override protected def nullSafeEval(a: Any, b: Any): Any =
    SetKernels.sortedIntersect(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.SetKernels.sortedIntersect($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : SortedIntersectExpr = copy(left = l, right = r)
}

/** Varint-delta codec for sorted long sets — adjacency/posting-list
  * compression for the wire. A sorted, duplicate-free `array<long>`
  * becomes `binary`: first value then successive deltas, each ULEB128
  * (7 bits/byte, high bit = continuation). Neighbor lists whose ids span
  * a dense range pack to ~3 B/element against Tungsten's 8 B + header —
  * the difference IS the exchange volume of an array-carrying join (the
  * [[graft.operators.Triangles]] probe join shuffles one such payload per
  * edge; at sf10 the unpacked form is the suite's one memory wall).
  * Intersection decodes both streams in lockstep — packed lists never
  * materialize as arrays on the probe side.
  */
object VdeltaKernels {

  private val EMPTY = new GenericArrayData(Array.emptyLongArray)

  /** Pack an ASCENDING-sorted, duplicate-free, non-negative long array. */
  def pack(a: ArrayData): Array[Byte] = {
    val n = a.numElements()
    val buf = new Array[Byte](n * 10 + 1)
    var pos = 0
    var prev = 0L
    var i = 0
    while (i < n) {
      val v = a.getLong(i)
      var d = v - prev
      prev = v
      while ((d & ~0x7fL) != 0L) {
        buf(pos) = ((d & 0x7f) | 0x80).toByte; pos += 1; d >>>= 7
      }
      buf(pos) = d.toByte; pos += 1
      i += 1
    }
    java.util.Arrays.copyOf(buf, pos)
  }

  /** Inverse of [[pack]]. */
  def unpack(b: Array[Byte]): ArrayData = {
    val n = b.length
    if (n == 0) return EMPTY
    // count elements (one terminator byte without the high bit per value)
    var cnt = 0
    var i = 0
    while (i < n) { if ((b(i) & 0x80) == 0) cnt += 1; i += 1 }
    val out = new Array[Long](cnt)
    var pos = 0
    var prev = 0L
    var k = 0
    while (k < cnt) {
      var d = 0L
      var shift = 0
      var more = true
      while (more) {
        val x = b(pos); pos += 1
        d |= (x & 0x7fL) << shift
        shift += 7
        more = (x & 0x80) != 0
      }
      prev += d
      out(k) = prev
      k += 1
    }
    new GenericArrayData(out)
  }

  /** Intersection of two packed sets, decoded in lockstep — returns the
    * common elements as `array<long>` (ascending). No array for either
    * input ever materializes.
    */
  def intersect(a: Array[Byte], b: Array[Byte]): ArrayData = {
    val na = a.length
    val nb = b.length
    if (na == 0 || nb == 0) return EMPTY
    val out = new Array[Long](math.min(na, nb)) // >= min element count
    var ia = 0; var ib = 0
    var va = 0L; var vb = 0L
    var k = 0
    var haveA = false; var haveB = false
    while ((haveA || ia < na) && (haveB || ib < nb)) {
      if (!haveA) {
        var d = 0L; var shift = 0; var more = true
        while (more) {
          val x = a(ia); ia += 1
          d |= (x & 0x7fL) << shift; shift += 7; more = (x & 0x80) != 0
        }
        va += d; haveA = true
      }
      if (!haveB) {
        var d = 0L; var shift = 0; var more = true
        while (more) {
          val x = b(ib); ib += 1
          d |= (x & 0x7fL) << shift; shift += 7; more = (x & 0x80) != 0
        }
        vb += d; haveB = true
      }
      if (va < vb) haveA = false
      else if (va > vb) haveB = false
      else { out(k) = va; k += 1; haveA = false; haveB = false }
    }
    if (k == 0) EMPTY
    else new GenericArrayData(java.util.Arrays.copyOf(out, k))
  }
}

/** `vdelta_pack(array<bigint>) → binary` (sorted ascending, duplicate-free,
  * non-negative input — the caller's precondition, same as
  * [[SortedIntersectExpr]]).
  */
case class VdeltaPackExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "vdelta_pack"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    SetExprs.requireType(prettyName, child.dataType) {
      case ArrayType(LongType, _) => true
    }
  override protected def nullSafeEval(a: Any): Any =
    VdeltaKernels.pack(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VdeltaKernels.pack($a)")
  override protected def withNewChildInternal(newChild: Expression): VdeltaPackExpr =
    copy(child = newChild)
}

/** `vdelta_unpack(binary) → array<bigint>`. */
case class VdeltaUnpackExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "vdelta_unpack"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    SetExprs.requireType(prettyName, child.dataType) {
      case BinaryType => true
    }
  override protected def nullSafeEval(a: Any): Any =
    VdeltaKernels.unpack(a.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VdeltaKernels.unpack($a)")
  override protected def withNewChildInternal(newChild: Expression): VdeltaUnpackExpr =
    copy(child = newChild)
}

/** `vdelta_intersect(binary, binary) → array<bigint>` — lockstep decode,
  * no input array ever materializes.
  */
case class VdeltaIntersectExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "vdelta_intersect"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val l = SetExprs.requireType(prettyName, left.dataType) {
      case BinaryType => true
    }
    if (l.isFailure) l
    else SetExprs.requireType(prettyName, right.dataType) {
      case BinaryType => true
    }
  }
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VdeltaKernels.intersect(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.VdeltaKernels.intersect($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : VdeltaIntersectExpr = copy(left = l, right = r)
}

object SetExprs {
  import org.apache.spark.sql.graft.bridge.{column, expression}

  /** Shared analysis-time input check (the [[SortedIntersectExpr]]
    * discipline): these kernels read raw bytes / `getLong` slots, so a
    * mistyped input (e.g. `array<int>`) must fail analysis, not silently
    * decode garbage.
    */
  private[graft] def requireType(name: String, t: DataType)(
      ok: PartialFunction[DataType, Boolean])
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (ok.applyOrElse(t, (_: DataType) => false))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$name cannot accept ${t.simpleString} input")

  /** Column wrapper for [[SortedIntersectExpr]]. */
  def sortedIntersect(a: Column, b: Column): Column =
    column(SortedIntersectExpr(expression(a), expression(b)))

  def vdeltaPack(a: Column): Column = column(VdeltaPackExpr(expression(a)))
  def vdeltaUnpack(a: Column): Column = column(VdeltaUnpackExpr(expression(a)))
  def vdeltaIntersect(a: Column, b: Column): Column =
    column(VdeltaIntersectExpr(expression(a), expression(b)))
}
