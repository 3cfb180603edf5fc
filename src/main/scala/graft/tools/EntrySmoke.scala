package graft.tools

import org.apache.spark.sql.SparkSession

/** Simulates the driver's flagship smoke test: a BARE session (none of our
  * ANSI/nanos/shuffle configs) calling SparkEntry.entry — guards against the
  * entry query depending on session configuration the driver won't set.
  */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("entry-smoke-bare")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val df = graft.SparkEntry.entry(spark)
      val n = df.count()
      println(s"[entry-smoke] rows=$n schema=${df.columns.mkString(",")}")
      assert(n > 0, "entry() returned no rows under a bare session")
    } finally spark.stop()
  }
}
