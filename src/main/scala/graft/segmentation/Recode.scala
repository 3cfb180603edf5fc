package graft.segmentation

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, lit, when}

/** Conditional recoding — CASE WHEN + IN-list expressions.
  *
  * All pure Catalyst `CaseWhen`/`In` trees: constant-folded, codegen'd, and
  * pushdown-transparent, so these scale to any input size with zero shuffle.
  */
object Recode {

  /** P3: bucket day-of-week into {0,1,2} (reference: codeText.txt:26-29). */
  def dowBucket(dow: Column): Column =
    when(dow.isin(0, 1), 0)
      .when(dow.isin(2, 3, 4), 1)
      .otherwise(2)

  def withDowBucket(df: DataFrame, src: String = "order_dow",
                    dst: String = "order_dow_updated"): DataFrame =
    df.withColumn(dst, dowBucket(col(src)))

  /** P4: 7-way decode dow → day name (reference: codeText.txt:32-41).
    * NB: the reference's 0→Monday mapping is nonstandard vs Instacart's
    * 0=Sunday; the code is the spec, so it is replicated verbatim
    * (SURVEY §7.4.3).
    */
  def dayName(dow: Column): Column =
    when(dow.isin(0), "Monday")
      .when(dow.isin(1), "Tuesday")
      .when(dow.isin(2), "Wednesday")
      .when(dow.isin(3), "Thursday")
      .when(dow.isin(4), "Friday")
      .when(dow.isin(5), "Saturday")
      .when(dow.isin(6), "Sunday")
      .otherwise(lit("None"))

  def withDayName(df: DataFrame, src: String = "order_dow",
                  dst: String = "days"): DataFrame =
    df.withColumn(dst, dayName(col(src)))

  /** P5: column copy / alias (reference: codeText.txt:169). */
  def copyColumn(df: DataFrame, src: String, dst: String): DataFrame =
    df.withColumn(dst, col(src))
}
