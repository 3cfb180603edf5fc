package graft.segmentation

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.IntegerType

/** Source ingestion with the reference's dynamic-schema semantics.
  *
  * The reference reads CSV with a header and NO inferSchema, so every column
  * arrives as StringType and is narrowed later with explicit casts
  * (reference: codeText.txt:12, casts at codeText.txt:130,179-180,189,197-198).
  * Cast failures yield NULL (ANSI off) — that permissiveness is part of the
  * contract, so [[castInt]] asserts ANSI is off rather than silently changing
  * semantics.
  */
object Ingest {

  /** S1: CSV scan, header on, all columns StringType (codeText.txt:12). */
  def csv(spark: SparkSession, path: String): DataFrame =
    spark.read.format("csv").option("header", "true").load(path)

  /** Parquet scan for the TESTDATA harness (engine extension, not a
    * reference capability — SURVEY §2.1).
    */
  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** P6: string→int narrowing casts; non-numeric strings become NULL under
    * ANSI-off semantics, which the reference relies on (SURVEY §1.2).
    */
  def castInt(df: DataFrame, cols: String*): DataFrame =
    cols.foldLeft(df)((d, c) => d.withColumn(c, col(c).cast(IntegerType)))

  /** P1+P2: the reference's canonical projection — keep the seven analysis
    * columns, then drop the four unused ones (codeText.txt:15,20; the drop is
    * a no-op after the select but is kept for surface parity).
    */
  def canonicalProjection(df: DataFrame): DataFrame =
    df.select("order_id", "user_id", "order_dow", "order_hour_of_day",
        "department_id", "department", "product_name")
      .drop("days_since_prior_order", "product_id", "add_to_cart_order", "reordered")
}
