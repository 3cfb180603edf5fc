package graft.tools

import java.nio.file.{Files, Paths}

/** Dumps `explain("formatted")` for NAMED queries into per-query files —
  * the optimization-round evidence artifact (`plans/rNN/<query>_<tag>.txt`).
  *
  * Usage: runMain graft.tools.PlanDump <sfDir> <outDir> <tag> <q1,q2,...>
  *
  * Unlike [[ExplainDump]] (one curated PLANS.md per plan shape), this tool
  * writes one file per query so a before/after pair can be diffed. Planning
  * only — no query executes; eager fixture staging inside a query builder
  * (file-staged adjacency tables etc.) does run, exactly as it would before
  * the real plan is produced.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length == 4, "usage: PlanDump <sfDir> <outDir> <tag> <q1,q2,...>")
    val Array(sfDir, outDir, tag, qlist) = args
    val names = qlist.split(",").map(_.trim).filter(_.nonEmpty)
    Files.createDirectories(Paths.get(outDir))
    val spark = graft.Sessions.local("plan-dump")
    try {
      names.foreach { name =>
        graft.SparkEntry.queries.get(name) match {
          case None => System.err.println(s"[plandump] unknown query: $name")
          case Some(fn) =>
            try {
              val df = fn(spark, sfDir)
              val w = new java.io.ByteArrayOutputStream()
              Console.withOut(w) { df.explain("formatted") }
              val f = Paths.get(outDir, s"${name}_$tag.txt")
              Files.writeString(f, w.toString)
              println(s"[plandump] wrote $f")
            } catch { case e: Throwable =>
              System.err.println(s"[plandump] $name failed: ${e.getMessage}")
            }
        }
      }
    } finally spark.stop()
  }
}
