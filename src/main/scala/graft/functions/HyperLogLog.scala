package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{udaf, xxhash64}

/** HyperLogLog distinct-count sketch as a typed Aggregator — the "novel
  * sketch" custom-aggregate path (SURVEY §7.3 names sketches as the
  * custom-aggregate extension surface; Spark's own approx_count_distinct is
  * HLL++ — this is the from-scratch form with explicit, mergeable state).
  *
  * State is 2^p byte registers (p=12 → 4 KiB, ~1.6% standard error). The
  * buffer is a flat byte array: O(1)-size per group regardless of input
  * cardinality, merged by element-wise max — the algebraic shape that makes
  * it safe under partial aggregation, AQE re-planning, and skew, and the
  * reason a 100 TB distinct-count costs 4 KiB per group on the wire instead
  * of a shuffled value set.
  */
class HllAggregator(p: Int = 12) extends Aggregator[Long, Array[Byte], Long] {
  require(p >= 4 && p <= 16, "p in [4,16]")
  private val m = 1 << p

  override def zero: Array[Byte] = new Array[Byte](m)

  override def reduce(regs: Array[Byte], hash: Long): Array[Byte] = {
    val idx = (hash >>> (64 - p)).toInt
    val w = hash << p
    // rank = position of the leftmost 1-bit in the remaining 64-p bits
    val rank = (if (w == 0L) 64 - p else java.lang.Long.numberOfLeadingZeros(w)) + 1
    if (rank > regs(idx)) regs(idx) = rank.toByte
    regs
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(regs: Array[Byte]): Long = HllOps.estimate(regs)

  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

/** Register-array operations shared by the aggregators and the sketch
  * column functions.
  */
object HllOps {
  /** Standard HLL estimate with the small-range linear-counting correction. */
  def estimate(regs: Array[Byte]): Long = {
    val m = regs.length
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1 + 1.079 / m)
    }
    var invSum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      invSum += 1.0 / (1L << regs(i))
      if (regs(i) == 0) zeros += 1
      i += 1
    }
    val raw = alpha * m * m / invSum
    val est =
      if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) // linear counting
      else raw
    math.round(est)
  }

  /** Element-wise max merge of `b` into `a` (mutates and returns `a`). */
  def mergeInto(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    require(a.length == b.length, s"sketch width mismatch: ${a.length} vs ${b.length}")
    var i = 0
    while (i < a.length) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }
}

/** Like [[HllAggregator]] but FINISHES with the raw registers — a reusable
  * binary SKETCH column instead of a number. This is the pre-aggregation
  * pattern that matters at 100 TB: sketch each partition/day/group once,
  * store 4 KiB per group, and answer any later distinct-count rollup by
  * merging sketches ([[HllMergeAggregator]]) without rescanning the data.
  */
class HllSketchAggregator(p: Int = 12) extends Aggregator[Long, Array[Byte], Array[Byte]] {
  private val inner = new HllAggregator(p)
  override def zero: Array[Byte] = inner.zero
  override def reduce(regs: Array[Byte], hash: Long): Array[Byte] = inner.reduce(regs, hash)
  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = HllOps.mergeInto(a, b)
  override def finish(regs: Array[Byte]): Array[Byte] = regs
  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

/** Merges already-built sketches (a binary column of equal-width register
  * arrays) and estimates the distinct count of their union. Merging is the
  * same element-wise max as in-flight partial aggregation, so rolling up
  * stored sketches gives BIT-IDENTICAL registers to a single pass over the
  * union of the raw data.
  */
class HllMergeAggregator extends Aggregator[Array[Byte], Array[Byte], Long] {
  override def zero: Array[Byte] = Array.emptyByteArray
  override def reduce(acc: Array[Byte], sketch: Array[Byte]): Array[Byte] =
    if (acc.isEmpty) sketch.clone() else HllOps.mergeInto(acc, sketch)
  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    if (a.isEmpty) b else if (b.isEmpty) a else HllOps.mergeInto(a, b)
  override def finish(regs: Array[Byte]): Long =
    if (regs.isEmpty) 0L else HllOps.estimate(regs)
  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

object HyperLogLog {
  /** `hll_distinct(col)`: approximate distinct count of any column (hashed
    * with xxhash64 first, so any input type works).
    */
  def hllDistinct(c: Column, p: Int = 12): Column =
    udaf(new HllAggregator(p)).apply(xxhash64(c))

  /** `hll_sketch(col)`: mergeable binary sketch of the column's distinct set. */
  def hllSketch(c: Column, p: Int = 12): Column =
    udaf(new HllSketchAggregator(p)).apply(xxhash64(c))

  /** `hll_merge_estimate(sketchCol)`: distinct count of the UNION of the
    * sets behind the given sketches.
    */
  def hllMergeEstimate(sketches: Column): Column =
    udaf(new HllMergeAggregator).apply(sketches)
}
