package graft.operators

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.scalatest.funsuite.AnyFunSuite

/** Proves the AQE skew-join claim in Sessions: a join with one hot key is
  * re-planned at runtime with the skewed partition split. Thresholds are
  * lowered so local-scale data triggers the same machinery a 100 TB hot key
  * would. Configs are restored afterwards (the test session is shared).
  */
class AqeSkewSpec extends AnyFunSuite {

  test("AQE splits the skewed join partition at runtime") {
    val spark = graft.Sessions.local("aqe-skew-test", cores = 4)
    import spark.implicits._
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.autoBroadcastJoinThreshold"
    ).map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

      // 95% of the left rows share key 1; right side is uniform
      val rnd = new scala.util.Random(3)
      val left = (1 to 60000)
        .map(i => (if (rnd.nextDouble() < 0.95) 1 else 1 + rnd.nextInt(40),
          s"payload_left_$i" * 4))
        .toDF("k", "lv")
      val right = (1 to 40).map(k => (k, s"dim_$k")).toDF("k", "rv")
      val joined = left.join(right, "k")
      // execute THIS Dataset's own QueryExecution so AQE finalizes its plan
      assert(joined.collect().length === 60000)
      val plan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case p => p.toString
      }
      // the finalized plan must carry the skew-split runtime reader — a
      // generic "skew" substring match could be satisfied by unrelated
      // text, so pin the two concrete markers: the AQEShuffleRead node and
      // its skewed/skew=true annotation on the hot-key side
      assert(plan.contains("AQEShuffleRead"),
        s"no AQEShuffleRead in the finalized plan:\n$plan")
      assert(plan.contains("isSkew=true") || plan.contains("skewed") ||
          plan.contains("skew=true"),
        s"AQE skew split did not engage:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
