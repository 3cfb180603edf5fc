package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's canonical local-mode configuration.
  *
  * Scale notes: `shuffle.partitions` is pinned to the local core count (the
  * 200 default over-partitions local mode); on a real cluster this would be
  * sized to ~2-3x total cores or driven by AQE coalescing, which is enabled
  * here and does the right thing at any scale.
  */
object Sessions {
  def local(appName: String = "graft", cores: Int = defaultCores): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // The reference relies on permissive (ANSI-off) cast semantics:
      // string→int of dirty values yields NULL, not an error (SURVEY §1.2).
      .config("spark.sql.ansi.enabled", "false")
      // TESTDATA events.ts is parquet TIMESTAMP(NANOS), which the vectorized
      // reader rejects; read as long and convert in Tables.events.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      // keep managed tables (bucketing) out of the repo tree
      .config("spark.sql.warehouse.dir",
        sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft-warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  def defaultCores: Int =
    sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(
      math.min(Runtime.getRuntime.availableProcessors(), 32))
}
