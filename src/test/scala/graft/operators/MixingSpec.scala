package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MixingSpec extends SparkSpec {
  import spark.implicits._

  private def gateKeeps(id: Long, rate: Double): Boolean =
    java.lang.Math.floorMod(id * Mixing.A, Mixing.M) < (rate * Mixing.M).toLong

  test("keepGate matches the reference arithmetic row for row") {
    val df = (0L until 4096L).map(i => (i, "s")).toDF("doc_id", "lang")
    val kept = Mixing.sampleStrata(df, "lang", Map("s" -> 0.25))
      .select("doc_id").as[Long].collect().toSet
    (0L until 4096L).foreach { i =>
      assert(kept.contains(i) === gateKeeps(i, 0.25), s"id $i")
    }
  }

  test("kept fraction approximates the rate; disjoint strata use their own rates") {
    val df = (0L until 20000L).map(i => (i, if (i % 2 == 0) "a" else "b"))
      .toDF("doc_id", "lang")
    val kept = Mixing.sampleStrata(df, "lang", Map("a" -> 0.5, "b" -> 0.125))
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(kept("a") / 10000.0 - 0.5) < 0.05, s"a=${kept("a")}")
    assert(math.abs(kept("b") / 10000.0 - 0.125) < 0.05, s"b=${kept("b")}")
  }

  test("knuthHash matches the BigInt model at 2^31 +- eps, 2^62, and random longs") {
    // the naive id*A overflows a signed long past id ~ 2^31.8; the split
    // formula must agree with exact arithmetic everywhere a 100 TB id
    // space can reach
    val rnd = new scala.util.Random(7)
    val ids = Seq(0L, 1L, 65535L, 65536L,
        (1L << 31) - 2, (1L << 31) - 1, 1L << 31, (1L << 31) + 1, (1L << 31) + 2,
        (1L << 32) - 1, 1L << 32, (1L << 32) + 1,
        (1L << 62) - 1, 1L << 62, (1L << 62) + 1, Long.MaxValue) ++
      Seq.fill(200)(rnd.nextLong() & Long.MaxValue)
    val got = ids.toDF("id")
      .select($"id", Mixing.knuthHash($"id").as("hv"))
      .as[(Long, Long)].collect().toMap
    ids.foreach { id =>
      val want = ((BigInt(id) * Mixing.A) mod BigInt(Mixing.M)).toLong
      assert(got(id) === want, s"id=$id")
    }
  }

  test("deterministic across runs; rate 1.0 keeps everything, 0.0 nothing") {
    val df = (0L until 1000L).map(i => (i, "x")).toDF("doc_id", "lang")
    val a = Mixing.sampleStrata(df, "lang", Map.empty, defaultRate = 1.0).count()
    val b = Mixing.sampleStrata(df, "lang", Map("x" -> 0.0)).count()
    val c1 = Mixing.sampleStrata(df, "lang", Map("x" -> 0.25)).select("doc_id").as[Long].collect().sorted
    val c2 = Mixing.sampleStrata(df, "lang", Map("x" -> 0.25)).select("doc_id").as[Long].collect().sorted
    assert(a === 1000L && b === 0L && (c1 sameElements c2))
  }

  test("budgetGreedySelect keeps the quality-ordered prefix, hard cut") {
    import org.apache.spark.sql.functions.col
    // (id, lang, score, tokens): en ordered by score desc is 1(50),2(40),
    // 3(30),4(20) with budget 70 -> keep 1,2 (90 would overflow at 3, and
    // the LATER smaller doc 4 must NOT sneak in: prefix, not knapsack)
    val df = Seq(
      (1L, "en", 900L, 50L), (2L, "en", 800L, 40L),
      (3L, "en", 700L, 45L), (4L, "en", 600L, 5L),
      (5L, "de", 100L, 60L), (6L, "de", 100L, 60L) // tie: doc_id order
    ).toDF("doc_id", "lang", "score", "nt")
    val got = Mixing.budgetGreedySelect(df, "lang", col("score"), col("nt"),
        budgetTokens = 90L).select("lang", "doc_id").as[(String, Long)]
      .collect().toSet
    // en: 50+40=90 fits, +45 overflows, 5 must not re-enter
    // de: tie broken by doc_id -> 5 enters (60), 6 overflows (120)
    assert(got === Set(("en", 1L), ("en", 2L), ("de", 5L)))
  }

  test("epochExpand materializes floor(f) + gated extra copies") {
    import org.apache.spark.sql.functions.col
    val df = (0L until 400L).map(i => (i, if (i < 200) "hi" else "lo"))
      .toDF("doc_id", "lang")
    val out = Mixing.epochExpand(df, "lang",
        Map("hi" -> 2.25), defaultFactor = 0.5)
      .select("doc_id", "lang", "epoch").as[(Long, String, Long)].collect()
    val byDoc = out.groupBy(_._1).view.mapValues(_.map(_._3).sorted.toSeq).toMap
    for (id <- 0L until 400L) {
      val extra = if (gateKeeps(id, if (id < 200) 0.25 else 0.5)) 1 else 0
      val want = (if (id < 200) 2 else 0) + extra
      val got = byDoc.getOrElse(id, Seq.empty)
      assert(got === (1 to want).map(_.toLong),
        s"doc $id: got $got want 1..$want")
    }
    // f=2.25 emits between 2x and 3x of the stratum; gated share near 1/4
    val hi = out.count(_._2 == "hi")
    assert(hi >= 400 && hi <= 600)
  }
}
