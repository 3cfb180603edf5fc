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

  /** Cluster-mode profile: the same engine semantics (ANSI off, UTC,
    * nanos-parquet) with the knobs re-derived for a many-executor deployment
    * reading ~100 TB. Master/deploy-mode/executor sizing stay with the
    * submitter (spark-submit / k8s operator); this sets what the ENGINE
    * owns:
    *
    *  - `shuffle.partitions` ≈ 2 × total executor cores, floored at 2000 for
    *    a 100 TB input so a post-shuffle partition targets O(100 MB) and AQE
    *    coalescing (enabled) merges the small ones — partition count is a
    *    ceiling for AQE, not a fixed width.
    *  - `files.maxPartitionBytes` 256 MB: scan tasks sized so a full row
    *    group + decode buffers fit executor memory with room for the
    *    downstream operator.
    *  - `autoBroadcastJoinThreshold` 64 MB: region/nation/supplier-class
    *    dims broadcast; fact-fact joins shuffle. AQE upgrades plans at
    *    runtime when a side turns out small.
    *  - skew-join handling on (salting in `operators.Skew` remains for keys
    *    AQE cannot split, e.g. pre-aggregation hot keys).
    *  - extensions registered via [[GraftExtensions]] so SQL users get the
    *    custom expressions without touching code.
    */
  def clusterBuilder(appName: String = "graft",
                     totalCores: Int = 2000): SparkSession.Builder =
    SparkSession.builder()
      .appName(appName)
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .config("spark.sql.shuffle.partitions", math.max(2 * totalCores, 2000).toString)
      .config("spark.sql.files.maxPartitionBytes", (256L * 1024 * 1024).toString)
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
}
