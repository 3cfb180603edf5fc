package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class HyperLogLogSpec extends SparkSpec {
  import spark.implicits._

  test("HLL estimate within 5% of exact on real data (grouped)") {
    val li = Tables.lineitem(spark, sf("sf0.01"))
    val got = li.groupBy("l_returnflag")
      .agg(countDistinct($"l_partkey").as("exact"),
        HyperLogLog.hllDistinct($"l_partkey").as("est"))
      .collect()
    got.foreach { r =>
      val exact = r.getLong(1).toDouble
      val est = r.getLong(2).toDouble
      assert(math.abs(est - exact) / exact < 0.05,
        s"${r.getString(0)}: exact=$exact est=$est")
    }
  }

  test("HLL kernel: merge is associative-ish and order-independent") {
    val a = new HllAggregator(10)
    val rnd = new scala.util.Random(5)
    val hashes = Seq.fill(5000)(rnd.nextLong())
    val whole = hashes.foldLeft(a.zero)(a.reduce)
    val (l, r) = hashes.splitAt(1234)
    val merged = a.merge(l.foldLeft(a.zero)(a.reduce), r.foldLeft(a.zero)(a.reduce))
    assert(a.finish(merged) === a.finish(whole))
    // shuffled order → identical registers
    val shuffled = rnd.shuffle(hashes).foldLeft(a.zero)(a.reduce)
    assert(a.finish(shuffled) === a.finish(whole))
  }

  test("sketch rollup: merged per-group sketches == direct single-pass sketch") {
    val li = Tables.lineitem(spark, sf("sf0.01"))
    val rolled = li.groupBy("l_returnflag")
      .agg(HyperLogLog.hllSketch($"l_partkey").as("sk"))
      .agg(HyperLogLog.hllMergeEstimate($"sk").as("est"))
      .collect()(0).getLong(0)
    val direct = li.agg(HyperLogLog.hllDistinct($"l_partkey").as("est"))
      .collect()(0).getLong(0)
    val exact = li.agg(countDistinct($"l_partkey")).collect()(0).getLong(0)
    assert(rolled === direct, "rollup of stored sketches must be bit-identical")
    assert(math.abs(rolled.toDouble - exact) / exact < 0.05)
  }

  test("merging disjoint-set sketches estimates the union") {
    val a = Seq.range(0L, 3000L).toDF("v")
      .agg(HyperLogLog.hllSketch($"v").as("sk")).collect()(0).getAs[Array[Byte]](0)
    val b = Seq.range(2000L, 5000L).toDF("v")
      .agg(HyperLogLog.hllSketch($"v").as("sk")).collect()(0).getAs[Array[Byte]](0)
    val unionEst = Seq(a, b).toDF("sk")
      .agg(HyperLogLog.hllMergeEstimate($"sk")).collect()(0).getLong(0)
    assert(math.abs(unionEst - 5000.0) / 5000.0 < 0.05, s"unionEst=$unionEst")
  }

  test("HLL small-range linear counting is near-exact for tiny cardinalities") {
    val a = new HllAggregator(12)
    val regs = (1L to 50L).map(i => scala.util.hashing.byteswap64(i))
      .foldLeft(a.zero)(a.reduce)
    val est = a.finish(regs)
    assert(math.abs(est - 50L) <= 2, s"est=$est")
  }
}
