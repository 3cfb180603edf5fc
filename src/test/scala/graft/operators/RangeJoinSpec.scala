package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {

  private def fixture = {
    val ev = Tables.events(spark, sf("sf0.001"))
      .select(col("event_id"), col("ts"), col("user_id"))
    val iv = ev.select(date_trunc("day", col("ts")).as("w_start")).distinct()
      .withColumn("w_end", col("w_start") + expr("INTERVAL 30 HOURS"))
    (ev, iv)
  }

  test("bucketed range join equals the naive theta join, with no duplicate pairs") {
    val (ev, iv) = fixture
    val bucketed = RangeJoin.bucketed(ev, iv, "ts", "w_start", "w_end", 86400L)
      .select(col("event_id"), col("w_start"))
    val naive = ev.join(iv,
        col("ts") >= col("w_start") && col("ts") <= col("w_end"))
      .select(col("event_id"), col("w_start"))
    val b = bucketed.collect().map(r => (r.getLong(0), r.getTimestamp(1))).toSeq
    val n = naive.collect().map(r => (r.getLong(0), r.getTimestamp(1))).toSeq
    assert(b.size === b.distinct.size, "bucketed join produced duplicate pairs")
    assert(b.toSet === n.toSet)
    assert(b.size === n.size)
    // the 30h windows overlap, so some events must match TWO windows —
    // otherwise the multi-bucket interval path is untested
    assert(b.groupBy(_._1).exists(_._2.size == 2),
      "fixture never exercises an event matching two overlapping windows")
  }

  test("bucketed range join plans as a hash equi-join, not BroadcastNestedLoop") {
    val (ev, iv) = fixture
    val df = RangeJoin.bucketed(ev, iv, "ts", "w_start", "w_end", 86400L)
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join fell back to a nested-loop shape:\n$plan")
    assert(plan.contains("HashJoin"), s"expected a hash equi-join:\n$plan")
  }
}
