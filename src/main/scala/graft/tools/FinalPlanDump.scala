package graft.tools

/** Dumps the FINAL adaptive plan (after execution) for named queries —
  * the only plan form in which AQE's runtime exchange/stage reuse is
  * visible (the initial `explain` plan shows duplicated subtrees that
  * AQE dedups at runtime). Usage:
  *   runMain graft.tools.FinalPlanDump <sfDir> <outDir> <tag> <q1,q2,...>
  */
object FinalPlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length == 4, "usage: FinalPlanDump <sfDir> <outDir> <tag> <q1,...>")
    val Array(sfDir, outDir, tag, qlist) = args
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val spark = graft.Sessions.local("final-plan-dump")
    try {
      qlist.split(",").map(_.trim).filter(_.nonEmpty).foreach { name =>
        graft.SparkEntry.queries.get(name) match {
          case None => System.err.println(s"[finalplan] unknown query: $name")
          case Some(fn) =>
            try {
              val plans = scala.collection.mutable.ArrayBuffer.empty[String]
              val listener = new org.apache.spark.sql.util.QueryExecutionListener {
                override def onSuccess(funcName: String,
                    qe: org.apache.spark.sql.execution.QueryExecution,
                    durationNs: Long): Unit = {
                  plans += qe.executedPlan.toString; ()
                }
                override def onFailure(funcName: String,
                    qe: org.apache.spark.sql.execution.QueryExecution,
                    exception: Exception): Unit = ()
              }
              spark.listenerManager.register(listener)
              try {
                fn(spark, sfDir).write.mode("overwrite").format("noop").save()
                Thread.sleep(1500) // listener bus drain
              } finally spark.listenerManager.unregister(listener)
              val f = java.nio.file.Paths.get(outDir, s"${name}_$tag.txt")
              java.nio.file.Files.writeString(f,
                plans.zipWithIndex.map { case (p, i) =>
                  s"=== execution $i ===\n$p" }.mkString("\n"))
              println(s"[finalplan] wrote $f (${plans.size} executions)")
            } catch { case e: Throwable =>
              System.err.println(s"[finalplan] $name failed: ${e.getMessage}")
            }
        }
      }
    } finally spark.stop()
  }
}
