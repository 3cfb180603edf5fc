package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.types.{BooleanType, DataType}

/** Bloom-filter membership index as a typed Aggregator plus a codegen'd
  * membership Expression — the index-shipping half of incremental dedup at
  * 100 TB scale.
  *
  * [[graft.SparkEntry]] q85 ships the ingested corpus's md5 column (16
  * bytes/doc) to anti-join each new batch. This module shrinks that index a
  * further ~13x: at 10 bits/key a billion-document corpus is a ~1.2 GB
  * broadcastable bitset instead of a 16 GB hash relation, and membership is
  * a per-row codegen'd probe with NO shuffle at all. Bloom filters admit
  * false POSITIVES only, so the exact anti-join still runs — but only over
  * the rows the filter flags (true dups + the fpp sliver), which at typical
  * daily-increment dup rates is a few percent of the batch instead of all
  * of it. The definitely-new rows (filter says absent) skip the join
  * entirely; correctness is unchanged (q90 hash-matches q85's oracle).
  *
  * State is a flat byte-array bitset: algebraic (merge = bitwise OR), so it
  * is safe under partial aggregation and AQE re-planning, and a stored
  * filter can be OR-merged with tomorrow's increment filter without
  * rescanning — the same pre-aggregation pattern as
  * [[graft.functions.HyperLogLog]] sketches.
  *
  * Probe positions use Kirsch–Mitzenmacher double hashing over the caller's
  * 64-bit key hash: pos_i = (h1 + i·h2) mod m with h1 = high 32 bits and
  * h2 = (low 32 bits | 1). Two independent-enough halves of one good 64-bit
  * hash give the standard k-hash FPP bound without k hash passes per row.
  */
object BloomOps {
  /** `numBits` rounded up to a whole number of bytes; bitset is byte-packed
    * (BinaryType buffers serialize with zero conversion, and a BinaryType
    * LITERAL codegens to one object-reference load per row — no per-row
    * array copy, which ArrayType(LongType) literals would pay via ArrayData
    * conversion).
    */
  def emptyBits(numBits: Int): Array[Byte] = {
    require(numBits > 0, "numBits must be positive")
    new Array[Byte]((numBits + 7) / 8)
  }

  @inline private def pos(bytes: Array[Byte], hash: Long, i: Int): Int = {
    val h1 = (hash >>> 32).toInt
    val h2 = hash.toInt | 1 // odd => cycles through all positions
    val m = bytes.length * 8
    // floorMod keeps the position non-negative for any hash sign
    java.lang.Math.floorMod(h1 + i * h2, m)
  }

  /** Set the k probe bits for `hash` (mutates and returns `bytes`). */
  def add(bytes: Array[Byte], hash: Long, numHashes: Int): Array[Byte] = {
    var i = 0
    while (i < numHashes) {
      val p = pos(bytes, hash, i)
      bytes(p >>> 3) = (bytes(p >>> 3) | (1 << (p & 7))).toByte
      i += 1
    }
    bytes
  }

  /** True iff every probe bit for `hash` is set — no false negatives;
    * false positives at the standard (1 - e^(-kn/m))^k rate. Static kernel
    * so generated code calls it directly (stays inside whole-stage codegen).
    */
  def mightContain(bytes: Array[Byte], hash: Long, numHashes: Int): Boolean = {
    var i = 0
    while (i < numHashes) {
      val p = pos(bytes, hash, i)
      if ((bytes(p >>> 3) & (1 << (p & 7))) == 0) return false
      i += 1
    }
    true
  }

  /** Bitwise-OR merge of `b` into `a` (mutates and returns `a`). */
  def mergeInto(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    require(a.length == b.length, s"bloom width mismatch: ${a.length} vs ${b.length}")
    var i = 0
    while (i < a.length) { a(i) = (a(i) | b(i)).toByte; i += 1 }
    a
  }
}

/** Builds the bitset over a column of 64-bit key hashes. Buffer and result
  * are the raw bytes — storable, broadcastable, OR-mergeable.
  */
class BloomAggregator(numBits: Int, numHashes: Int)
    extends Aggregator[Long, Array[Byte], Array[Byte]] {
  require(numHashes > 0, "numHashes must be positive")

  override def zero: Array[Byte] = BloomOps.emptyBits(numBits)
  override def reduce(bytes: Array[Byte], hash: Long): Array[Byte] =
    BloomOps.add(bytes, hash, numHashes)
  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    BloomOps.mergeInto(a, b)
  override def finish(bytes: Array[Byte]): Array[Byte] = bytes
  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

/** `bloom_might_contain(bitset, hash)` — codegen'd probe. `bitset` is
  * normally a Literal (the collected/stored filter), evaluated once to an
  * object reference; the per-row cost is `numHashes` bit tests.
  */
case class BloomMightContainExpr(left: Expression, right: Expression, numHashes: Int)
    extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"
  override protected def nullSafeEval(bits: Any, hash: Any): Any =
    BloomOps.mightContain(bits.asInstanceOf[Array[Byte]],
      hash.asInstanceOf[Long], numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, h) =>
      s"graft.functions.BloomOps.mightContain($b, $h, $numHashes)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContainExpr =
    copy(left = newLeft, right = newRight)
}

object BloomFilter {
  import org.apache.spark.sql.graft.bridge.{column, expression}

  /** Sizing rule of thumb: ~10 bits/key + k=7 gives FPP ≈ 0.8%. */
  def suggestedNumBits(expectedKeys: Long, bitsPerKey: Int = 10): Int =
    math.min(expectedKeys * bitsPerKey, Int.MaxValue.toLong - 8).toInt.max(64)

  /** Aggregate a 64-bit hash column into a bitset (one binary row). */
  def bloomAgg(hash: Column, numBits: Int, numHashes: Int = 7): Column =
    udaf(new BloomAggregator(numBits, numHashes)).apply(hash)

  /** Per-row membership probe against a built filter. */
  def mightContain(bitset: Column, hash: Column, numHashes: Int = 7): Column =
    column(BloomMightContainExpr(expression(bitset), expression(hash), numHashes))
}
