package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd sorted-set kernels.
  *
  * `array_intersect` is the general tool: it builds a hash set from one side
  * PER ROW (allocation + hashing for every call) because it cannot assume
  * order. A join that intersects adjacency/posting lists millions of times
  * per stage can afford to sort each list ONCE at build time (inside its
  * `collect_list` aggregation) and replace the per-row hash set with a
  * linear merge — zero hashing, zero per-row scratch state, one output
  * allocation. [[graft.operators.Triangles]] is the flagship consumer: its
  * probe join calls this 12M times at sf1 with ~60-element lists.
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

object SetExprs {
  import org.apache.spark.sql.graft.bridge.{column, expression}

  /** Column wrapper for [[SortedIntersectExpr]]. */
  def sortedIntersect(a: Column, b: Column): Column =
    column(SortedIntersectExpr(expression(a), expression(b)))
}
