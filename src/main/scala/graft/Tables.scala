package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the TPC-H-ish TESTDATA star schema (see TESTDATA.md).
  *
  * All tables are plain parquet; Catalyst handles column pruning and filter
  * pushdown into the scans, so callers should select/filter as early as
  * possible and let the optimizer narrow `ReadSchema`.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame =
    spark.read.parquet(s"$sfDir/$table.parquet")

  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  /** The driver's `events.ts` is parquet TIMESTAMP(NANOS); with
    * `spark.sql.legacy.parquet.nanosAsLong=true` it scans as LongType
    * nanos-since-epoch. Exposed here both ways: `ts_ns` (exact long) and
    * `ts` (micros-truncated timestamp — Spark's native precision). Integer
    * `div` avoids the double-rounding a float division would introduce on
    * ~1.7e18 nanosecond values. The `ScaleUp`-generated sf1 dataset stores
    * `ts` as native TIMESTAMP(MICROS) (Spark cannot write nanos); there
    * `ts_ns` is derived as micros*1000 so both dataset generations present
    * the same two-column contract.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts_ns", col("ts"))
          .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ =>
        // native TIMESTAMP generation — arrives as LTZ (our generators'
        // output) or NTZ (current driver data). Session tz is pinned UTC,
        // so the NTZ->LTZ cast is wall-value-exact; normalizing keeps one
        // canonical ts type (TIMESTAMP) for every downstream comparison.
        raw.withColumn("ts", col("ts").cast("timestamp"))
          .withColumn("ts_ns", expr("unix_micros(ts) * 1000"))
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
