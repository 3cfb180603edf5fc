package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomFilterSpec extends SparkSpec {
  import spark.implicits._

  test("kernel: no false negatives, FPP near the theoretical rate") {
    val m = 1 << 14 // 16384 bits
    val k = 7
    val n = 1000
    val rnd = new scala.util.Random(7)
    val inserted = Array.fill(n)(rnd.nextLong())
    val bits = inserted.foldLeft(BloomOps.emptyBits(m))(BloomOps.add(_, _, k))
    inserted.foreach { h =>
      assert(BloomOps.mightContain(bits, h, k), "false negative")
    }
    val insertedSet = inserted.toSet
    val probes = Iterator.continually(rnd.nextLong())
      .filterNot(insertedSet).take(20000).toArray
    val fp = probes.count(BloomOps.mightContain(bits, _, k))
    val theoretical = math.pow(1 - math.exp(-k.toDouble * n / m), k)
    assert(fp.toDouble / probes.length < theoretical * 2 + 0.01,
      s"fpp=${fp.toDouble / probes.length} theoretical=$theoretical")
  }

  test("kernel: merge (OR) of split builds == single build, bit-identical") {
    val m = 1 << 12
    val k = 5
    val rnd = new scala.util.Random(11)
    val hashes = Seq.fill(500)(rnd.nextLong())
    val whole = hashes.foldLeft(BloomOps.emptyBits(m))(BloomOps.add(_, _, k))
    val (l, r) = hashes.splitAt(123)
    val merged = BloomOps.mergeInto(
      l.foldLeft(BloomOps.emptyBits(m))(BloomOps.add(_, _, k)),
      r.foldLeft(BloomOps.emptyBits(m))(BloomOps.add(_, _, k)))
    assert(java.util.Arrays.equals(whole, merged))
  }

  test("aggregator over partitions == kernel build; probe expression agrees") {
    val m = 1 << 13
    val keys = (1L to 2000L).toDF("key").repartition(8)
    val bits = keys.agg(BloomFilter.bloomAgg(xxhash64($"key"), m).as("bf"))
      .collect()(0).getAs[Array[Byte]](0)
    // distributed build must equal the local fold over the same hashes
    val localHashes = keys.select(xxhash64($"key")).as[Long].collect()
    val local = localHashes.foldLeft(BloomOps.emptyBits(m))(BloomOps.add(_, _, 7))
    assert(java.util.Arrays.equals(bits, local))
    // every inserted key probes true through the codegen'd expression
    val hits = keys
      .filter(BloomFilter.mightContain(lit(bits), xxhash64($"key")))
      .count()
    assert(hits === 2000L)
  }

  test("probe expression stays inside whole-stage codegen") {
    val bits = BloomOps.add(BloomOps.emptyBits(256), 42L, 7)
    val df = spark.range(100)
      .filter(BloomFilter.mightContain(lit(bits), xxhash64($"id")))
    // the `*(n)` prefix marks operators fused into a WholeStageCodegen stage
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Filter bloom_might_contain"), plan)
  }
}
