package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class KmvSpec extends SparkSpec {
  import spark.implicits._

  private def bruteMinima(k: Int, xs: Seq[Long]): Array[Long] =
    xs.distinct.sorted.take(k).toArray

  test("kernel matches the BigInt fold model and the Knuth spread") {
    for (s <- Seq("", "a", "key agg row", "slow fast table value part")) {
      val model =
        if (s.isEmpty) 0L
        else s.map(_.toLong).reduceLeft((a, b) => (a * 31 + b) % KmvKernels.P)
      assert(KmvKernels.rollHash(UTF8String.fromString(s)) === model)
      assert(KmvKernels.kmvKey(UTF8String.fromString(s)) ===
        (BigInt(model) * KmvKernels.A).mod(BigInt(KmvKernels.M)).toLong)
    }
  }

  test("aggregator reduce/merge equal brute-force bottom-k on any split") {
    val agg = new KmvAggregator(8)
    val rng = new scala.util.Random(7)
    val xs = Seq.fill(200)(rng.nextInt(50).toLong) // heavy duplication
    val whole = xs.foldLeft(agg.zero)(agg.reduce)
    assert(whole.toSeq === bruteMinima(8, xs).toSeq)
    // arbitrary partition splits must merge to the same sketch
    for (cut <- Seq(0, 1, 37, 100, 199, 200)) {
      val (l, r) = xs.splitAt(cut)
      val m = agg.merge(l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce))
      assert(m.toSeq === whole.toSeq, s"split at $cut diverged")
    }
  }

  test("estimate is exact below k and the unbiased form at k") {
    assert(KmvSketch.estimate(8, Array(1L, 5L, 9L)) === 3L)
    val minima = Array(10L, 20L, 30L, 40L, 50L, 60L, 70L, 80L)
    assert(KmvSketch.estimate(8, minima) === 7L * KmvKernels.M / 80L)
  }

  test("union + jaccard match brute force on overlapping sets") {
    val k = 16
    val a = bruteMinima(k, (1L to 40L).map(_ * 3))
    val b = bruteMinima(k, (1L to 40L).map(_ * 2))
    val u = KmvSketch.union(k, a, b)
    assert(u.toSeq === bruteMinima(k, (a ++ b).toSeq).toSeq)
    val (common, ppm) = KmvSketch.jaccardPpm(k, a, b)
    val expect = u.count(v => a.contains(v) && b.contains(v)).toLong
    assert(common === expect)
    assert(ppm === 1000000L * expect / u.length)
  }

  test("distributed sketch equals the driver-side fold of all keys") {
    val keys = (1L to 500L).map(i => (i * KmvKernels.A) % KmvKernels.M)
    val viaSpark = keys.toDF("h").repartition(7)
      .agg(KmvSketch.sketch(32)(col("h")).as("sk"))
      .collect()(0).getSeq[Long](0).toArray
    assert(viaSpark.toSeq === bruteMinima(32, keys).toSeq)
  }
}
