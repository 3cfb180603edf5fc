package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The Bloom runtime-filter join: result equality with the plain join
  * (no false negatives, false positives removed by the join), actual
  * probe-side pruning, and the plan shape — the bloom probe must sit
  * BELOW the join so the exchange carries pruned rows only.
  */
class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  test("pruned join result is bit-identical to the plain join") {
    val probe = (1L to 1000L).map(i => (i % 97, i)).toDF("k", "payload")
    val build = Seq((3L, "a"), (11L, "b"), (42L, "c")).toDF("bk", "tag")
    val pruned = BloomJoin.prunedInnerJoin(probe, "k", build, "bk")
      .select(col("k"), col("payload"), col("tag"))
    val plain = probe.join(build, col("k") === col("bk"))
      .select(col("k"), col("payload"), col("tag"))
    assert(pruned.collect().toSet == plain.collect().toSet)
    assert(pruned.count() == plain.count())
  }

  test("the filter prunes: probe rows with absent keys rarely survive") {
    val probe = (1L to 10000L).toDF("k")
    val build = Seq(5L, 500L, 5000L).toDF("bk")
    val bytes = BloomJoin.keyFilter(build, "bk")
    val kept = probe.filter(
      graft.functions.BloomFilter.mightContain(lit(bytes), xxhash64(col("k"))))
      .count()
    // 3 true keys + the fpp sliver (~0.8% of 10k at 10 bits/key = ~80
    // worst case; in practice far fewer) — the point is 10000 -> O(tens)
    assert(kept >= 3 && kept < 500, s"kept $kept of 10000")
  }

  test("q130 shape: probe filter is planted below the join, on the scan side") {
    val dir = sf("sf0.001")
    val urgent = spark.read.parquet(s"$dir/orders.parquet")
      .filter(col("o_orderpriority") === "1-URGENT"
        && year(col("o_orderdate")) === 1995)
      .select(col("o_orderkey"))
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_quantity"))
    val joined = BloomJoin.prunedInnerJoin(li, "l_orderkey", urgent, "o_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain"),
      s"bloom probe missing from plan:\n$plan")
    // the probe must appear below (after, in toString order) the join node
    val joinIdx = plan.indexOf("Join")
    val probeIdx = plan.indexOf("bloom_might_contain")
    assert(joinIdx >= 0 && probeIdx > joinIdx,
      "bloom probe should sit under the join in the plan tree")
    // and the result still matches the plain join
    val plain = li.join(urgent, col("l_orderkey") === col("o_orderkey"))
    assert(joined.count() == plain.count())
  }

  test("empty build side yields an empty join, not a crash") {
    val probe = (1L to 100L).toDF("k")
    val build = Seq.empty[Long].toDF("bk")
    assert(BloomJoin.prunedInnerJoin(probe, "k", build, "bk").count() == 0)
  }
}
