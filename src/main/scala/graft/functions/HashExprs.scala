package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** JVM kernels for the custom hash expressions. Kept as static methods so
  * generated code can call them directly — the expressions stay inside
  * whole-stage codegen (a codegen'd static call, not a CodegenFallback
  * interpreter hop).
  */
object HashKernels {

  /** 64-bit FNV-1a over the UTF-8 bytes of whitespace-normalized, lowercased
    * text — a deterministic document fingerprint that is invariant to
    * whitespace layout and case.
    */
  def fingerprint(s: UTF8String): Long = {
    val str = s.toString
    var h = 0xcbf29ce484222325L
    var i = 0
    var pendingSpace = false
    var emitted = false
    val n = str.length
    while (i < n) {
      val c0 = str.charAt(i)
      if (Character.isWhitespace(c0)) {
        pendingSpace = emitted
      } else {
        if (pendingSpace) {
          h ^= ' '.toLong; h *= 0x100000001b3L
          pendingSpace = false
        }
        val c = Character.toLowerCase(c0)
        // mix the UTF-16 unit (documents here are BMP; full surrogate
        // handling would fold pairs identically on every engine run)
        h ^= (c & 0xffL); h *= 0x100000001b3L
        h ^= ((c >> 8) & 0xffL); h *= 0x100000001b3L
        emitted = true
      }
      i += 1
    }
    h
  }

  /** Per-token 64-bit hash (FNV-1a). */
  private def tokenHash(str: String, from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < until) {
      val c = str.charAt(i)
      h ^= (c & 0xffL); h *= 0x100000001b3L
      h ^= ((c >> 8) & 0xffL); h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** 64-bit SimHash over whitespace tokens: bit b of the result is 1 iff the
    * sum over tokens of sign(bit b of tokenHash) is positive. Near-identical
    * token multisets → small Hamming distance.
    */
  def simhash(s: UTF8String): Long = {
    val str = s.toString
    val counts = new Array[Int](64)
    val n = str.length
    var i = 0
    while (i < n) {
      while (i < n && Character.isWhitespace(str.charAt(i))) i += 1
      val start = i
      while (i < n && !Character.isWhitespace(str.charAt(i))) i += 1
      if (i > start) {
        val h = tokenHash(str, start, i)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** `fingerprint(text) → bigint`: codegen'd Catalyst expression (SURVEY §7.3
  * names the custom-Expression route for functions Spark lacks).
  */
case class FingerprintExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "fingerprint"
  override protected def nullSafeEval(input: Any): Any =
    HashKernels.fingerprint(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.fingerprint($c)")
  override protected def withNewChildInternal(newChild: Expression): FingerprintExpr =
    copy(child = newChild)
}

/** `simhash64(text) → bigint`: codegen'd 64-bit SimHash. */
case class SimHashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override protected def nullSafeEval(input: Any): Any =
    HashKernels.simhash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.simhash($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)
}

/** Column-API + SQL-registration front door for the custom expressions. */
object HashExprs {
  import org.apache.spark.sql.graft.bridge.{column, expression}

  def fingerprint(c: Column): Column = column(FingerprintExpr(expression(c)))
  def simhash64(c: Column): Column = column(SimHashExpr(expression(c)))

  /** Register `fingerprint` / `simhash64` for spark.sql(...) use. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    org.apache.spark.sql.graft.bridge.registerFunction(spark, "fingerprint",
      exprs => FingerprintExpr(exprs.head))
    org.apache.spark.sql.graft.bridge.registerFunction(spark, "simhash64",
      exprs => SimHashExpr(exprs.head))
  }
}
