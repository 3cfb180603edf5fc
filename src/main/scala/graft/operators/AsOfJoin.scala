package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DateType, TimestampType}

/** As-of join: for each left row, the single right row with the greatest
  * right-time <= left-time within the same key (the standard time-series
  * "latest state as of" operator; Spark has no native form).
  *
  * Implementation is a MERGE-SCAN expressed with built-ins, not a join:
  * both sides are unioned into one keyed stream (right rows tagged to sort
  * before left rows at equal times), shuffled ONCE by key, sorted by time
  * within partitions, and swept with a running `last(right_payload,
  * ignoreNulls)` window — each left row picks up the latest right row at or
  * before it in a single forward pass.
  *
  * Scale notes: the pre-window row count is exactly |left| + |right| — the
  * previous equi+range join form paired every left row with ALL earlier
  * right rows of its key before pruning (per-key quadratic; fatal with hot
  * keys at 100 TB). The running-frame window keeps O(1) state per row, so
  * cost is one shuffle + one sort, independent of time-range density. Skewed
  * keys fall under the same AQE/salting remedies as any keyed window.
  */
object AsOfJoin {

  /** Widening for the time/key columns when the two sides disagree (e.g.
    * DATE right vs TIMESTAMP left in the events-orders query) — mirrors the
    * comparison coercion the old join predicate got from Catalyst.
    */
  private def widen(a: DataType, b: DataType): DataType =
    if (a == b) a
    else if (Set(a, b) == Set[DataType](DateType, TimestampType)) TimestampType
    else a // comparison coercion elsewhere is identity for our table shapes

  /** Left columns survive; right columns arrive with `rightPrefix`.
    * Determinism: ties on right-time break by the largest `rightTieBreak`.
    * Inner semantics: left rows with no right row at-or-before are dropped.
    *
    * No broadcast variant: the merge-scan shuffles |L| + |R| rows exactly
    * once, which beats the broadcast-join form even for small right sides
    * (that form still had to shuffle every surviving joined row into the
    * dedup window).
    */
  def asof(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTime: String, rightTime: String,
           rightTieBreak: String,
           rightPrefix: String = "asof_"): DataFrame = {
    val kType = widen(left.schema(leftKey).dataType, right.schema(rightKey).dataType)
    val tType = widen(left.schema(leftTime).dataType, right.schema(rightTime).dataType)
    val tbType = right.schema(rightTieBreak).dataType

    val lStruct = struct(left.columns.map(col).toIndexedSeq: _*)
    val rStruct = struct(
      right.columns.map(c => col(c).as(rightPrefix + c)).toIndexedSeq: _*)
    val lNull = lit(null).cast(left.schema) // typed null payloads for the union
    val rNull = lit(null).cast(
      org.apache.spark.sql.types.StructType(right.schema.fields.map(f =>
        f.copy(name = rightPrefix + f.name))))

    val rSide = right.select(
      col(rightKey).cast(kType).as("__k"),
      col(rightTime).cast(tType).as("__t"),
      lit(0).as("__side"),
      col(rightTieBreak).cast(tbType).as("__tb"),
      lNull.as("__l"),
      rStruct.as("__r"))
    val lSide = left.select(
      col(leftKey).cast(kType).as("__k"),
      col(leftTime).cast(tType).as("__t"),
      lit(1).as("__side"),
      lit(null).cast(tbType).as("__tb"),
      lStruct.as("__l"),
      rNull.as("__r"))

    // Right rows sort before left rows at equal time (inclusive <=); among
    // tied right rows the largest tie-break sorts last, so the running last()
    // is the deterministic winner.
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc, col("__tb").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val outCols =
      left.columns.map(c => col("__l").getField(c).as(c)) ++
        right.columns.map(c =>
          col("__m").getField(rightPrefix + c).as(rightPrefix + c))

    rSide.unionByName(lSide)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1 && col("__m").isNotNull)
      .select(outCols.toIndexedSeq: _*)
  }
}
