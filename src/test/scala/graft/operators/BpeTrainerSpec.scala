package graft.operators

import graft.SparkSpec

class BpeTrainerSpec extends SparkSpec {
  import spark.implicits._

  private def merges(texts: Seq[String], n: Int): Seq[(Int, String, String, Long)] =
    BpeTrainer.learnMerges(texts.toDF("text"), nMerges = n)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq

  test("hand-verifiable corpus learns the classic merges in order") {
    // "low" x3, "lower" x2: pairs lo:5, ow:5, we:2, er:2 -> (l,o) wins the
    // lexicographic tie with (o,w); then (lo,w):5; then (low,e... wait:
    // after lo: low x3 = [lo,w], lower x2 = [lo,w,e,r]; pairs (lo,w):5,
    // (w,e):2, (e,r):2 -> (lo,w); then low=[low], lower=[low,e,r]:
    // (low,e):2, (e,r):2 -> (e,r) < (low,e)? binary: 'e' < 'low' -> (e,r)
    val got = merges(Seq("low low low lower lower"), 4)
    assert(got(0) === ((1, "l", "o", 5L)))
    assert(got(1) === ((2, "lo", "w", 5L)))
    assert(got(2) === ((3, "e", "r", 2L)))
    assert(got(3) === ((4, "low", "er", 2L)))
  }

  test("greedy left-to-right merge: repeated symbols pair non-overlapping") {
    // "aaaa" x2, "aaa" x1: round 1 counts (a,a) = 2*3 + 1*2 = 8; after
    // merging, aaaa=[aa,aa], aaa=[aa,a]: round 2 (aa,aa):2 vs (aa,a):1
    val got = merges(Seq("aaaa aaaa aaa"), 2)
    assert(got(0) === ((1, "a", "a", 8L)))
    assert(got(1) === ((2, "aa", "aa", 2L)))
  }

  test("frequency weighting uses corpus counts, not distinct words") {
    // "ab" x10 vs "cd" x1: (a,b) at 10 beats (c,d) at 1
    val got = merges(Seq(Seq.fill(10)("ab").mkString(" ") + " cd"), 1)
    assert(got(0) === ((1, "a", "b", 10L)))
  }

  test("delimiter-bearing tokens are dropped; no persisted state remains") {
    val df = Seq("xy xy a<b c>d").toDF("text")
    val got = BpeTrainer.learnMerges(df, nMerges = 1).collect()
    assert(got.length === 1)
    assert(got(0).getString(1) === "x" && got(0).getString(2) === "y")
    val leaked = spark.sparkContext.getPersistentRDDs
    assert(leaked.isEmpty, s"BpeTrainer leaked: $leaked")
  }

  test("subwordCounts applies the merge chain per distinct token") {
    val docs = Seq((1L, "low lower low"), (2L, "lower")).toDF("doc_id", "text")
    // merges (l,o) then (lo,w): low -> [low] 1 subword; lower -> [low,e,r] 3
    val got = BpeTrainer.subwordCounts(docs, Seq(("l", "o"), ("lo", "w")))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1L) === ((3L, 5L))) // 2x low + 1x lower = 1+1+3
    assert(got(2L) === ((1L, 3L)))
  }

  test("batched selection is bit-identical to one-merge-per-round") {
    // a messy corpus with interacting top pairs, exact count ties and
    // single-symbol words — everything the batching dominance proof has
    // to survive. batchLimit=1 IS the sequential algorithm (the batch
    // degenerates to the argmax), so equality at 32 merges is a direct
    // sequential-vs-batched bit check including round numbering.
    val texts = Seq(
      "the cat sat on the mat the cat ran to the hat",
      "a banana and an apple in a cabana", "zz zz zzz z",
      "low lower lowest slow slower glow", "the theme there then these",
      "xyxyxy xyxy xy x y", "mississippi missive dismiss",
      "aa ab ba bb aab abb baa bba")
    val df = texts.toDF("text")
    def run(limit: Int) = BpeTrainer.learnMerges(df, nMerges = 32, batchLimit = limit)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val sequential = run(1)
    assert(sequential.size === 32, "corpus must sustain 32 merges")
    assert(run(64) === sequential)
    assert(run(5) === sequential) // mid-size batches hit the truncation path
  }

  test("organic corpus: batched == sequential deep into the flat-count tail") {
    // the q192 planted gate proves 1023 closed-form merges; THIS is the
    // organic-interaction half — real sf0.001 text run far past the point
    // where counts flatten into ties (the regime where the dominance
    // prefix shrinks toward 1), batchLimit=1024 vs the batchLimit=1
    // sequential algorithm, bit-equal including round numbering.
    // sf0.001's ~30-word vocabulary exhausts its pair table at 89
    // merges — run both trainers to exhaustion and compare the FULL
    // sequence, tail ties and all
    val docs = graft.Tables.documents(spark, sf("sf0.001"))
    def run(limit: Int) = BpeTrainer
      .learnMerges(docs, nMerges = 200, batchLimit = limit)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val sequential = run(1)
    assert(sequential.size >= 80, s"expected exhaustion near 89 merges, got ${sequential.size}")
    assert(run(1024) === sequential)
  }

  test("planted 1k schedule: one driver trip per wave, 31 accepted each") {
    val trips = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    val merges = BpeTrainer.learnMerges(graft.Planted.bpe1kDocs(spark),
      nMerges = 1023, batchLimit = 1024, onBatch = (t, n) => trips += ((t, n)))
      .collect()
    assert(merges.length === 1023)
    assert(trips.toSeq === (1 to 33).map(t => (t, 31)))
    // counts descend in waves of 31, from 100 down to 36
    val counts = merges.map(_.getLong(3))
    assert(counts.grouped(31).zipWithIndex.forall {
      case (g, w) => g.forall(_ == 100L - 2 * w) })
  }

  test("distilled trainer is bit-identical to the cluster loop (chains, runs, ties)") {
    // the per-word-recompute driver loop must survive exactly the corner
    // cases analytic count deltas get wrong: same-symbol runs (zzz),
    // alternating chains (xyxyxy), exact ties, single-symbol words
    val texts = Seq(
      "the cat sat on the mat the cat ran to the hat",
      "a banana and an apple in a cabana", "zz zz zzz z",
      "low lower lowest slow slower glow", "the theme there then these",
      "xyxyxy xyxy xy x y", "mississippi missive dismiss",
      "aa ab ba bb aab abb baa bba")
    val df = texts.toDF("text")
    def seqRun = BpeTrainer.learnMerges(df, nMerges = 32, batchLimit = 1)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    def distRun = BpeTrainer.learnMergesDistilled(df, nMerges = 32)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(distRun === seqRun)
  }

  test("distilled trainer matches the cluster loop to exhaustion on organic text") {
    val docs = graft.Tables.documents(spark, sf("sf0.001"))
    val sequential = BpeTrainer.learnMerges(docs, nMerges = 200, batchLimit = 1024)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val distilled = BpeTrainer.learnMergesDistilled(docs, nMerges = 200)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(distilled === sequential)
  }

  test("encodeWithTable is bit-identical to subwordCounts' chained replaces") {
    // the rank-priority mapPartitions encoder vs the literal-replace fold,
    // on the chain/run/tie adversarial corpus AND organic text, under a
    // merge table deep enough that merged symbols re-enter later merges
    val texts = Seq(
      "the cat sat on the mat the cat ran to the hat",
      "a banana and an apple in a cabana", "zz zz zzz z",
      "low lower lowest slow slower glow", "the theme there then these",
      "xyxyxy xyxy xy x y", "mississippi missive dismiss",
      "aa ab ba bb aab abb baa bba")
    val adversarial = texts.zipWithIndex.map { case (t, j) => (j.toLong, t) }
      .toDF("doc_id", "text")
    val organic = graft.Tables.documents(spark, sf("sf0.001"))
    for (docs <- Seq(adversarial, organic)) {
      val merges = BpeTrainer.learnMergesDistilled(docs, nMerges = 24)
        .orderBy($"round").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      def rows(df: org.apache.spark.sql.DataFrame) = df
        .orderBy($"doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(rows(BpeTrainer.encodeWithTable(docs, merges)) ===
        rows(BpeTrainer.subwordCounts(docs, merges)))
    }
  }

  test("distilled trainer fails fast above the driver-memory word guard") {
    val docs = Seq("alpha beta gamma delta").toDF("text")
    val e = intercept[IllegalArgumentException] {
      BpeTrainer.learnMergesDistilled(docs, nMerges = 4, maxDistinctWords = 2)
    }
    assert(e.getMessage.contains("maxDistinctWords"))
  }
}
