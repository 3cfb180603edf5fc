package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed tables for co-located joins: both sides written with the same
  * bucket count on the join key hash-place matching keys in matching
  * buckets, so a subsequent equi-join needs NO exchange on either side —
  * the scan layout IS the join partitioning.
  *
  * This is the 100 TB answer to repeated fact-fact joins: pay one
  * write-time shuffle, then every downstream join of the bucketed tables
  * skips both exchanges. Works with Spark's in-memory catalog (bucketing is
  * a Spark feature, not Hive).
  */
object Bucketing {

  /** Write `df` as a bucketed managed table (replacing any existing one). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    nBuckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // a crashed earlier run can leave the managed location behind; a managed
    // CREATE refuses to reuse it, so clear it explicitly
    val loc = new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath, table)
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(loc)
    }
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two same-bucketed tables on their bucket key — plans with zero
    * shuffle exchanges when bucket counts match.
    */
  def joinBucketed(spark: SparkSession, leftTable: String, rightTable: String,
                   key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
