package graft

import org.apache.spark.sql.DataFrame

/** Rebalance unsplittable inputs. TESTDATA parquet files are written as ONE
  * row group, so a FileSourceScan yields one task no matter the core count —
  * every scan-side computation (decimal aggregation, regex scoring, minhash
  * signatures) runs single-threaded locally. At 100 TB inputs arrive as many
  * files/row groups and this is a no-op (partitions >= target); for
  * one-row-group files it trades one round-robin shuffle for full-core
  * parallelism of the downstream compute.
  *
  * Used explicitly by compute-heavy operators, never inside Tables.load —
  * cheap scans (top-k, pushdown filters) should NOT pay a shuffle.
  */
object Parallelize {

  def ensure(df: DataFrame, minPartitions: Int = 0): DataFrame = {
    val target =
      if (minPartitions > 0) minPartitions
      else df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
