package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Plan + lifecycle audit for the MinHash near-dup pipeline: the signature
  * subtree must be computed ONCE (exchange/stage reuse across its three
  * consumers), and no persisted state may outlive a call.
  */
class MinHashPlanSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = {
    val base = (1 to 40).map(i => s"w$i")
    Seq(
      (1L, base.mkString(" ")),
      (2L, base.mkString(" ")),
      (3L, base.updated(20, "changed").mkString(" ")),
      (4L, (1 to 40).map(i => s"x$i").mkString(" "))
    ).toDF("doc_id", "text")
  }

  test("nearDuplicates leaves no persisted RDDs behind") {
    val out = MinHashLSH.nearDuplicates(corpus, threshold = 0.5)
    out.collect()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      s"leaked caches: ${spark.sparkContext.getPersistentRDDs}")
  }

  test("signature exchange is reused across all three consumers") {
    val out = MinHashLSH.nearDuplicates(corpus, threshold = 0.5)
    out.collect() // drive AQE to the final plan
    val plan = out.queryExecution.executedPlan.toString
    info(plan.linesIterator.take(40).mkString("\n"))
    val scans = plan.linesIterator.count(_.contains("LocalTableScan"))
    assert(plan.contains("ReusedExchange") || scans <= 1,
      s"signature subtree not reused (LocalTableScan x$scans):\n$plan")
  }
}
