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

  test("HLL small-range linear counting is near-exact for tiny cardinalities") {
    val a = new HllAggregator(12)
    val regs = (1L to 50L).map(i => scala.util.hashing.byteswap64(i))
      .foldLeft(a.zero)(a.reduce)
    val est = a.finish(regs)
    assert(math.abs(est - 50L) <= 2, s"est=$est")
  }
}
