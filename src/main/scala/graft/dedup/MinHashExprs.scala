package graft.dedup

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels + codegen'd expressions for the MinHash hot path.
  *
  * The previous column-level pipeline (`transform` to build shingle strings,
  * `transform` to hash them, `numHashes` × `array_min(transform(...))` for
  * the signature) ran every lambda through the per-element interpreter —
  * the same trap the vector math hit ([[graft.functions.VecKernels]]).
  * Each stage is now ONE codegen'd static call.
  *
  * Parity notes:
  *  - shingle hashing calls Spark's own XxHash64 (seed 42) over exactly the
  *    bytes `concat_ws(" ", tokens)` would produce, so hashes equal the old
  *    `xxhash64(shingle_string)` values bit-for-bit;
  *  - dedup is by hash with first-occurrence order — identical to
  *    `array_distinct` on the strings absent 64-bit collisions (the same
  *    equivalence [[NgramJaccard]] relies on, oracle-verified there);
  *  - the signature's per-seed affine constants and min-fold order are
  *    unchanged, so signatures (and therefore candidate buckets) are
  *    bit-identical to the previous implementation.
  */
object MinHashKernels {

  /** Word n-gram shingle hashes from a token array: distinct xxhash64(seed
    * 42) of each " "-joined n-gram, first-occurrence order; documents
    * shorter than one shingle contribute the joined whole as one shingle.
    */
  def shingleHashes(toks: ArrayData, n: Int): ArrayData = {
    val cnt = toks.numElements()
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    if (cnt >= n) {
      var i = 0
      while (i + n <= cnt) {
        out.add(hash(joined(toks, i, i + n)))
        i += 1
      }
    } else {
      out.add(hash(joined(toks, 0, cnt)))
    }
    val arr = new Array[Long](out.size())
    val it = out.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }

  /** " "-join of tokens [from, until) with concat_ws semantics: NULL tokens
    * are skipped entirely (no separator emitted for them).
    */
  private[dedup] def joined(toks: ArrayData, from: Int, until: Int): String = {
    val sb = new java.lang.StringBuilder
    var emitted = false
    var j = from
    while (j < until) {
      if (!toks.isNullAt(j)) {
        if (emitted) sb.append(' ')
        sb.append(toks.getUTF8String(j).toString)
        emitted = true
      }
      j += 1
    }
    sb.toString
  }

  private[dedup] def hash(s: String): Long =
    XxHash64Function.hash(UTF8String.fromString(s), StringType, 42L)

  /** MinHash signature: element s = min over shingle hashes of the s-th
    * affine rehash (odd multiplier ⇒ bijective mod 2^64), signed-min fold
    * in index order — bit-identical to `array_min(transform(...))`.
    */
  def signature(hashes: ArrayData, k: Int): ArrayData = {
    val n = hashes.numElements()
    val out = new Array[Long](k)
    var s = 0
    while (s < k) {
      val a = 0x9E3779B97F4A7C15L * (2 * s + 1)
      val b = 0xC2B2AE3D27D4EB4FL * s.toLong
      var m = Long.MaxValue
      var i = 0
      while (i < n) {
        val v = hashes.getLong(i) * a + b
        if (v < m) m = v
        i += 1
      }
      out(s) = m
      s += 1
    }
    new GenericArrayData(out)
  }
}

/** `shingle_hashes(tokens, n) → array<bigint>`. */
case class ShingleHashExpr(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"
  override protected def nullSafeEval(input: Any): Any =
    MinHashKernels.shingleHashes(input.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.dedup.MinHashKernels.shingleHashes($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): ShingleHashExpr =
    copy(child = newChild)
}

/** `minhash_sig(hashes, k) → array<bigint>`. */
case class MinHashSigExpr(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"
  override protected def nullSafeEval(input: Any): Any =
    MinHashKernels.signature(input.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.dedup.MinHashKernels.signature($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

/** Column-API front door. */
object MinHashExprs {
  import org.apache.spark.sql.graft.bridge.{column, expression}

  def shingleHashes(toks: Column, n: Int): Column =
    column(ShingleHashExpr(expression(toks), n))
  def minhashSig(hashes: Column, k: Int): Column =
    column(MinHashSigExpr(expression(hashes), k))
}
