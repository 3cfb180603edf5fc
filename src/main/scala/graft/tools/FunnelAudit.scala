package graft.tools

import graft.{SparkEntry, Tables}
import org.apache.spark.sql.SparkSession

/** One-off blocking-funnel adjudication across scale dirs — the numbers
  * behind THREESCALE.md's q136/q133 growth analysis (the round-11 verdict's
  * "no silent caps" order: candidate-pair and survivor counts per scale,
  * measured, not argued from scaladoc).
  *
  * Usage: `runMain graft.tools.FunnelAudit <sfDir> [<sfDir> ...]` — prints
  * one JSON line per (dir, operator) with the [[graft.dedup
  * .EditDistanceJoin.blockingStats]] and [[graft.dedup.PrefixFilterJoin
  * .blockingStats]] rows plus wall seconds for the stats pass itself.
  */
object FunnelAudit {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: FunnelAudit <sfDir> [<sfDir> ...]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries // touch the registry so Tables caches warm the same way
    args.foreach { dir =>
      val t0 = System.nanoTime()
      val ed = graft.dedup.EditDistanceJoin
        .blockingStats(Tables.customer(spark, dir), "c_custkey", "c_name")
        .head()
      val tEd = (System.nanoTime() - t0) / 1e9
      println(s"""{"dir":"$dir","op":"editdist","n_strings":${ed.getLong(0)},""" +
        s""""n_variant_rows":${ed.getLong(1)},"n_candidates":${ed.getLong(2)},""" +
        s""""n_verified":${ed.getLong(3)},"n_pairs":${ed.getLong(4)},""" +
        f""""sec":$tEd%.1f}""")
      val t1 = System.nanoTime()
      val pf = graft.dedup.PrefixFilterJoin
        .blockingStats(Tables.documents(spark, dir), num = 4, den = 5,
          shingleWords = 5)
        .head()
      val tPf = (System.nanoTime() - t1) / 1e9
      println(s"""{"dir":"$dir","op":"prefix","n_docs":${pf.getLong(0)},""" +
        s""""n_prefix_rows":${pf.getLong(1)},"n_candidate_slots":${pf.getLong(2)},""" +
        s""""n_candidate_pairs":${pf.getLong(3)},"n_result_pairs":${pf.getLong(4)},""" +
        f""""sec":$tPf%.1f}""")
    }
    spark.stop()
  }
}
