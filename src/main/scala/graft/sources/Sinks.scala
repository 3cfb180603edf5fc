package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Materialization sinks. The reference's only "sinks" are display/collect
  * (SURVEY §2.1 S2/S3); these are the engine extensions a real pipeline
  * needs: partitioned columnar output and CSV export.
  *
  * Scale notes: `partitionBy` yields one directory per key value — callers
  * must pick low-cardinality partition columns (a high-cardinality
  * partitionBy is a small-files explosion at 100 TB). `maxRecordsPerFile`
  * caps file size drift; writers never repartition implicitly (callers own
  * the layout — `df.repartition(col)` before write for one file per key).
  */
object Sinks {

  def parquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil,
              maxRecordsPerFile: Long = 5_000_000L): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(path)
  }

  def csv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("header", header.toString)
      .csv(path)
}
