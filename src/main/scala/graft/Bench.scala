package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`.
  * The same line is also written to `BENCH.json` in the working directory so
  * the driver never has to scrape it out of sbt log noise, and per-query
  * timings are listed to stderr sorted by cost descending.
  *
  * Optional args are substring filters on query names (e.g. `q17`) — handy
  * for timing one query while iterating without paying for the whole suite.
  *
  * Each query is fully materialized through the `noop` sink (every row is
  * produced and discarded executor-side — nothing collected, no count()
  * shortcuts that could skip projection work). A small warm-up action runs
  * first so JVM/codegen startup is not billed to the first query.
  *
  * Every query runs SPARK_GRAFT_BENCH_RUNS times (default 5) and the
  * reported number is the per-query MEDIAN: single runs at this scale swing
  * 2-4x on identical plans (round-3 finding), so medians are the only
  * timings worth comparing across rounds. `value` is the sum of medians.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft-warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    spark.range(1000).selectExpr("sum(id)").collect() // JVM/codegen warm-up

    val selected = SparkEntry.queries.toSeq.sortBy(_._1).filter { case (name, _) =>
      args.isEmpty || args.exists(name.contains)
    }
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "5").toInt.max(1)
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    // Environment fingerprint: round-4's driver-vs-builder 193s/42s clash was
    // undiagnosable from the artifact alone because BENCH.json said nothing
    // about the host it ran on. Stamp enough to tell two runs apart.
    val benchStartedAt = java.time.Instant.now().toString
    // hostname / os.name are environment-chosen strings: escape them so one
    // odd character can't break the driver's JSON parse of BENCH.json
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    def envJson: String = {
      val host = try java.net.InetAddress.getLocalHost.getHostName catch { case _: Exception => "unknown" }
      val os = sys.props.getOrElse("os.name", "?") + " " + sys.props.getOrElse("os.version", "?")
      s""""env":{"master":"local[$cpus]","availableProcessors":${Runtime.getRuntime.availableProcessors},""" +
        s""""maxMemMB":${Runtime.getRuntime.maxMemory / (1024 * 1024)},"host":${jstr(host)},""" +
        s""""os":${jstr(os)},"java":${jstr(sys.props.getOrElse("java.version", "?"))},"startedAt":"$benchStartedAt"}"""
    }
    def jsonLine(results: Seq[(String, Double)]): String = {
      val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
        .mkString("{", ",", "}")
      val total = results.map(_._2).sum
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","runs":$runs,"stat":"median","queries":$qs,"sf":"$sfDir",$envJson%s}"""
    }
    // BENCH.json is rewritten after EVERY query so a killed run still leaves
    // the medians measured so far (the driver's parser reads this file).
    def writeFile(line: String): Unit = {
      java.nio.file.Files.write(java.nio.file.Paths.get("BENCH.json"),
        (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      ()
    }
    val results = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    selected.foreach { case (name, fn) =>
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      results += (name -> median(times))
      writeFile(jsonLine(results.toSeq))
    }
    results.sortBy(-_._2).foreach { case (k, v) =>
      System.err.println(f"[bench] $v%8.3f s  $k")
    }
    println(jsonLine(results.toSeq))
    spark.stop()
  }
}
