package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ShardPlanSpec extends SparkSpec {
  import spark.implicits._

  test("DistRank ranks 1..n under the total order across many partitions") {
    val df = spark.range(0, 1000).select(
      col("id"), pmod(col("id") * 37, lit(1000)).as("size"))
      .repartition(13) // deliberately unaligned input partitioning
    val ranked = DistRank.byRange(df, Seq(col("size").desc, col("id").asc))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(ranked.length == 1000)
    val byRank = ranked.sortBy(_._3)
    assert(byRank.map(_._3).toSeq == (1L to 1000L))
    // rank order IS (size desc, id asc)
    val resorted = ranked.sortBy(t => (-t._2, t._1)).map(_._3).toSeq
    assert(resorted == (1L to 1000L))
  }

  test("DistRank on an empty input yields an empty frame with the rank column") {
    // zero-row guard: repartitionByRange on empty input, every partition
    // count 0, offsets all 1 — no index-out-of-bounds, schema still grows
    val df = spark.range(0, 100).select(col("id"), (col("id") % 7).as("size"))
      .filter(lit(false))
    val ranked = DistRank.byRange(df, Seq(col("size").desc, col("id").asc))
    assert(ranked.columns.toSeq == Seq("id", "size", "rank"))
    assert(ranked.count() == 0)
  }

  test("DistRank leaves nothing persisted (IterState discipline)") {
    // compare against the pre-call snapshot: other suites sharing this
    // session may legitimately hold cached RDDs of their own
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val df = spark.range(0, 100).select(col("id"), (col("id") % 7).as("size"))
    DistRank.byRange(df, Seq(col("size").desc, col("id").asc)).count()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"DistRank persisted RDDs: $leaked")
  }

  test("serpentine fold balances distinct sizes exactly on full rounds") {
    // sizes 12..1 over 3 shards: each shard gets one item per half-round
    // and totals come out identical (the LPT-snake textbook case)
    val docs = (1L to 12L).map(i => (i, 13L - i)).toDF("doc_id", "sz")
    val assigned = ShardPlan.assign(docs, "doc_id", col("sz"), nShards = 3)
    val got = ShardPlan.summary(assigned)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(got === Array((0, 4L, 26L), (1, 4L, 26L), (2, 4L, 26L)))
  }

  test("shard sequence snakes: 0,1,2,2,1,0 over the first two rounds") {
    val docs = (1L to 6L).map(i => (i, 7L - i)).toDF("doc_id", "sz")
    val shardByRank = ShardPlan.assign(docs, "doc_id", col("sz"), nShards = 3)
      .collect().map(r => r.getLong(2) -> r.getInt(3)).sortBy(_._1).map(_._2)
    assert(shardByRank.toSeq == Seq(0, 1, 2, 2, 1, 0))
  }

  test("ties in size break by id: the rank is a total order") {
    val docs = Seq((5L, 10L), (1L, 10L), (3L, 10L)).toDF("doc_id", "sz")
    val ranked = ShardPlan.assign(docs, "doc_id", col("sz"), nShards = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2))).sortBy(_._2)
    assert(ranked === Array((1L, 1L), (3L, 2L), (5L, 3L)))
  }

  test("no single-partition ranking window anywhere in the plan") {
    val docs = (1L to 50L).map(i => (i, i * 3 % 17)).toDF("doc_id", "sz")
    val plan = ShardPlan.summary(
      ShardPlan.assign(docs, "doc_id", col("sz"), nShards = 4))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"rank must come from DistRank:\n$plan")
  }

  test("nShards must be positive") {
    val docs = Seq((1L, 1L)).toDF("doc_id", "sz")
    intercept[IllegalArgumentException] {
      ShardPlan.assign(docs, "doc_id", col("sz"), nShards = 0)
    }
  }
}
