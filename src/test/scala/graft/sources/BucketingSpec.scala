package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed fact-fact join plans with ZERO shuffle exchanges") {
    val dir = sf("sf0.001")
    Bucketing.writeBucketed(Tables.lineitem(spark, dir), "li_b", "l_orderkey", 4)
    Bucketing.writeBucketed(
      Tables.orders(spark, dir).withColumnRenamed("o_orderkey", "l_orderkey"),
      "ord_b", "l_orderkey", 4)
    // small inputs would otherwise take the broadcast path and never
    // exercise bucketing; at fact-fact scale broadcast is off the table
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val joined = Bucketing.joinBucketed(spark, "li_b", "ord_b", "l_orderkey")
    try joined.collect()
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    val plan = joined.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
    val shuffles = plan.linesIterator.count(l =>
      l.contains("Exchange") && !l.contains("Broadcast"))
    assert(shuffles === 0, s"bucketed join still shuffles:\n$plan")
    // and it is a sort-merge or shuffle-free hash join, not broadcast-only luck
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
  }

  test("bucketed join returns the same rows as the plain join") {
    val dir = sf("sf0.001")
    val plain = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), $"l_orderkey" === $"o_orderkey")
      .count()
    val bucketed = Bucketing.joinBucketed(spark, "li_b", "ord_b", "l_orderkey").count()
    assert(bucketed === plain)
  }
}
