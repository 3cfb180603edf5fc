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

  override def finish(regs: Array[Byte]): Long = {
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

  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

object HyperLogLog {
  /** `hll_distinct(col)`: approximate distinct count of any column (hashed
    * with xxhash64 first, so any input type works).
    */
  def hllDistinct(c: Column, p: Int = 12): Column =
    udaf(new HllAggregator(p)).apply(xxhash64(c))
}
