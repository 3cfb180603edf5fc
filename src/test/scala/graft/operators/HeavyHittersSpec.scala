package graft.operators

import scala.collection.mutable

import graft.SparkSpec

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("reduce: increment / insert / global-decrement keeps <= k counters") {
    val mg = new MisraGries(2)
    var m = mg.zero
    m = mg.reduce(m, "a"); m = mg.reduce(m, "a"); m = mg.reduce(m, "b")
    assert(m.toMap === Map("a" -> 2L, "b" -> 1L))
    // full summary + untracked item: every counter decrements, b exhausts
    m = mg.reduce(m, "c")
    assert(m.toMap === Map("a" -> 1L))
    assert(m.size <= 2)
  }

  test("reduce mutates the live buffer in place instead of reallocating") {
    val mg = new MisraGries(4)
    val m0 = mg.zero
    val m1 = mg.reduce(m0, "a")
    assert(m1 eq m0, "hot path must update the mutable buffer in place")
  }

  test("merge is the PODS'12 combine and accepts deserialized immutable maps") {
    val mg = new MisraGries(2)
    // both sides immutable, as they arrive from an Encoder round-trip
    val a: collection.Map[String, Long] = Map("x" -> 5L, "y" -> 2L)
    val b: collection.Map[String, Long] = Map("z" -> 4L, "w" -> 1L)
    val merged = mg.merge(a, b).toMap
    // combined [5,4,2,1]; cut = 3rd largest = 2; survivors shift down by 2
    assert(merged === Map("x" -> 3L, "z" -> 2L))
  }

  test("MG guarantee: candidates cover every item with freq > n/(k+1)") {
    val k = 4
    val mg = new MisraGries(k)
    // adversarial-ish stream: two heavy items drowned in singletons
    val stream = (Seq.fill(40)("hot") ++ Seq.fill(30)("warm") ++
      (1 to 60).map(i => s"noise$i")).sorted // sorted = worst interleave for MG
    val n = stream.size
    var m = mg.zero
    stream.foreach(x => m = mg.reduce(m, x))
    val cands = mg.finish(m).toSet
    val truth = stream.groupBy(identity).view.mapValues(_.size).toMap
    val mustKeep = truth.collect { case (t, c) if c.toLong * (k + 1) > n => t }
    assert(mustKeep.forall(cands.contains),
      s"lost a guaranteed-heavy item: mustKeep=$mustKeep cands=$cands")
  }

  test("exact heavy hitters: exact counts, exact threshold, two scans") {
    val tokens = (Seq.fill(40)("a") ++ Seq.fill(30)("b") ++ Seq.fill(20)("c") ++
      (1 to 10).map(i => s"s$i")).toDF("token")
    // threshold 1/4 of n=100: a (40%) and b (30%) qualify, c (20%) does not
    val got = HeavyHitters.exactHeavyHitters(tokens, "token", k = 8, num = 1L, denom = 4L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got === Array(("a", 40L, 100L), ("b", 30L, 100L)))
  }

  test("boundary is strict: frequency exactly at the threshold is excluded") {
    val tokens = (Seq.fill(25)("edge") ++ Seq.fill(75)("bulk")).toDF("token")
    val got = HeavyHitters.exactHeavyHitters(tokens, "token", k = 8, num = 1L, denom = 4L)
      .collect().map(_.getString(0))
    assert(got === Array("bulk")) // edge = exactly 25% = 1/4, not > 1/4
  }

  test("empty input yields an empty report, not a failure") {
    val tokens = Seq.empty[String].toDF("token")
    assert(HeavyHitters.exactHeavyHitters(tokens, "token", k = 8,
      num = 1L, denom = 4L).count() == 0L)
  }

  test("a threshold below the MG guarantee is rejected") {
    val tokens = Seq("a").toDF("token")
    intercept[IllegalArgumentException] {
      // 1/10 <= 1/(5+1): a 10%-heavy item could evade a 5-counter summary
      HeavyHitters.exactHeavyHitters(tokens, "token", k = 5, num = 1L, denom = 10L)
    }
  }

  test("the recount never shuffles the vocabulary: candidates push to the scan as an In filter") {
    // a parquet source (not a LocalRelation, where Catalyst would fold the
    // filter away at optimize time) so the plan shows what a 100 TB scan
    // would see: the <=k candidate set as a pushed-down In predicate
    val dir = java.nio.file.Files.createTempDirectory("graft_hh_plan").toString
    // two heavy tokens, so the candidate filter stays a genuine In set
    // (a single candidate legitimately collapses to EqualTo)
    (Seq.fill(30)("a") ++ Seq.fill(25)("b") ++ (1 to 20).map(i => s"v$i"))
      .toDF("token").write.mode("overwrite").parquet(dir)
    val df = HeavyHitters.exactHeavyHitters(spark.read.parquet(dir), "token",
      k = 6, num = 1L, denom = 4L)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"pass 2 must be a set filter, not a join:\n$plan")
    assert(plan.contains("In(token") || plan.contains(" IN (") ||
      plan.toUpperCase.contains("INSET"),
      s"candidates must prune via a pushed In/InSet:\n$plan")
  }

  private def roundTrip(m: collection.Map[String, Long]): collection.Map[String, Long] = {
    // simulate the Encoder boundary: the buffer leaves as an immutable map
    val frozen: collection.Map[String, Long] = m.toMap
    frozen
  }

  test("mutable buffers survive a freeze/merge cycle (executor partials)") {
    val mg = new MisraGries(3)
    var p1 = mg.zero; Seq("a", "a", "b").foreach(x => p1 = mg.reduce(p1, x))
    var p2 = mg.zero; Seq("a", "c", "c").foreach(x => p2 = mg.reduce(p2, x))
    val merged = mg.merge(roundTrip(p1), roundTrip(p2))
    assert(merged.toMap === Map("a" -> 3L, "b" -> 1L, "c" -> 2L))
    assert(mg.finish(merged).toSeq == Seq("a", "b", "c"))
    // merge re-admits frozen maps into the mutable working representation
    assert(merged.isInstanceOf[mutable.HashMap[_, _]])
  }
}
