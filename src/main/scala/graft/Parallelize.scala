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
    // Decide from the FILE layout (public inputFiles API, no job, no
    // physical planning — the old df.rdd probe forced plan materialization):
    // fewer files than cores means the scan cannot reach full parallelism
    // for one-row-group files, so rebalance. Non-file sources (inputFiles
    // empty) are left alone — local relations already slice to parallelism.
    val nFiles = df.inputFiles.length
    if (nFiles > 0 && nFiles < target) df.repartition(target) else df
  }
}
