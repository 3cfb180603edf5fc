package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL front door: register the TESTDATA tables as temp views and the
  * engine's custom functions, so the whole surface is reachable from
  * `spark.sql(...)` — e.g.
  * {{{
  *   Sql.register(spark, "/root/testdata/sf0.01")
  *   spark.sql("SELECT fingerprint(text) FROM documents LIMIT 5")
  * }}}
  */
object Sql {

  def register(spark: SparkSession, sfDir: String): Unit = {
    Tables.names.foreach { t =>
      Tables.load(spark, sfDir, t).createOrReplaceTempView(t)
    }
    // events view with the ns→µs conversion applied (matches Tables.events)
    Tables.events(spark, sfDir).createOrReplaceTempView("events")
    GraftExtensions.functions.foreach { case (name, builder) =>
      org.apache.spark.sql.graft.bridge.registerFunction(spark, name, builder)
    }
  }

  def sql(spark: SparkSession, sfDir: String, query: String): DataFrame = {
    register(spark, sfDir)
    spark.sql(query)
  }

  /** CLI: `runMain graft.Sql <sfDir> <query>` — run any SQL against the
    * registered views + custom functions and print the result.
    */
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: graft.Sql <sfDir> <query>")
    val spark = Sessions.local("graft-sql")
    try sql(spark, args(0), args(1)).show(50, truncate = false)
    finally spark.stop()
  }
}
