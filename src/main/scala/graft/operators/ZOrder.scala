package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout: interleave the bits of two integer
  * dimensions so that sorting by the resulting z-value co-locates rows that
  * are close in BOTH dimensions, then range-partition + sort the table by
  * that key before writing. A 2-D box predicate over the written layout then
  * touches only the few files whose z-range intersects the box, instead of
  * every file — the multi-dimensional generalization of sorting by a single
  * column, and the standard clustering story for min/max-pruned lakehouse
  * scans at the 100 TB scale (a file/row-group whose z-interval misses the
  * box can be skipped from its footer stats alone).
  *
  * The interleave is pure 64-bit column arithmetic (shift/AND/OR spreads —
  * the classic "Interleave bits by Binary Magic Numbers" construction), so
  * it stays inside whole-stage codegen and is expressible 1:1 in ANSI SQL
  * for the oracle; no UDF, no custom Expression needed.
  *
  * Scale shape: `cluster` is exactly one range-repartition exchange (the
  * same cost any global sort pays) + an in-partition sort; file count scales
  * with the chosen partition count, and the write is embarrassingly
  * parallel. Nothing is collected.
  */
object ZOrder {

  /** Spread the low 16 bits of `x` to the even bit positions of a 32-bit
    * lane: ...b2 b1 b0 -> ...0 b2 0 b1 0 b0. Each step doubles the gap
    * between live bit groups; masks keep the lanes disjoint.
    */
  private def spread16(x: Column): Column = {
    val a = x.bitwiseAND(lit(0xFFFFL))
    val b = (a.bitwiseOR(shiftleft(a, 8))).bitwiseAND(lit(0x00FF00FFL))
    val c = (b.bitwiseOR(shiftleft(b, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val d = (c.bitwiseOR(shiftleft(c, 2))).bitwiseAND(lit(0x33333333L))
    d.bitwiseOR(shiftleft(d, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Morton z-value of two dimensions, each truncated to its low 16 bits:
    * bit i of `a` lands at position 2i, bit i of `b` at position 2i+1.
    * Inputs must be pre-scaled into [0, 2^16) by the caller (quantize a
    * wider domain by dividing first — locality, not exactness, is the
    * contract of the layout key).
    */
  def zvalue(a: Column, b: Column): Column =
    spread16(a.cast("long")).bitwiseOR(shiftleft(spread16(b.cast("long")), 1))

  /** Range-partition by z-value into `numFiles` partitions and sort within
    * each — ready to `.write.parquet(...)`: every output file covers a
    * disjoint z-interval, so both dimensions' min/max footer stats are
    * tight per file.
    */
  def cluster(df: DataFrame, dimA: Column, dimB: Column,
              numFiles: Int): DataFrame =
    df.withColumn("zval", zvalue(dimA, dimB))
      .repartitionByRange(numFiles, col("zval"))
      .sortWithinPartitions(col("zval"))
}
