package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Truth tables + a brute-force recall proof for the deletion-neighborhood
  * edit-distance join: the blocking theorem (lev <= 1 ⟹ shared deletion
  * variant) must hold on every edit kind, and the candidate join must
  * return EXACTLY the brute-force answer on a random corpus.
  */
class EditDistanceJoinSpec extends SparkSpec {
  import spark.implicits._

  test("deletionVariants of 'abc' is {abc, bc, ac, ab}") {
    val got = Seq("abc").toDF("s")
      .select(EditDistanceJoin.deletionVariants(col("s"), length(col("s"))))
      .head().getSeq[String](0).toSet
    assert(got == Set("abc", "bc", "ac", "ab"))
  }

  test("empty and 1-char strings: no phantom positions, exact pairs") {
    // sequence(1, 0) DESCENDS in Spark — an unguarded empty string would
    // grow two phantom deletion rows
    val got = Seq("").toDF("s")
      .select(EditDistanceJoin.deletionVariants(col("s"), length(col("s"))))
      .head().getSeq[String](0)
    assert(got == Seq(""))
    // "", "", "a", "b": lev("","")=0, lev("","a")=1, lev("a","b")=1
    assert(pairsOf(Seq("", "", "a", "b")) == Set(
      (0L, 1L, 0), (0L, 2L, 1), (0L, 3L, 1), (1L, 2L, 1), (1L, 3L, 1),
      (2L, 3L, 1)))
  }

  private def pairsOf(strs: Seq[String]): Set[(Long, Long, Int)] =
    EditDistanceJoin.similarPairs(
        strs.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "name"),
        "id", "name")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(4))).toSet

  test("each edit kind is found; distance-2 pairs are not") {
    val strs = Seq(
      "kitten",   // 0
      "kitten",   // 1: equal -> dist 0
      "mitten",   // 2: substitution -> dist 1
      "kittens",  // 3: insertion -> dist 1
      "kitte",    // 4: deletion -> dist 1
      "sitting",  // 5: far away
      "iktten")   // 6: transposition = dist 2 in plain Levenshtein -> excluded
    val got = pairsOf(strs)
    assert(got.contains((0L, 1L, 0)))
    assert(got.contains((0L, 2L, 1)))
    assert(got.contains((0L, 3L, 1)))
    assert(got.contains((0L, 4L, 1)))
    assert(!got.exists { case (a, b, _) => Set(a, b).contains(5L) })
    assert(!got.exists { case (a, b, _) => a == 0L && b == 6L })
  }

  test("exactly the brute-force answer on a random-ish corpus") {
    // deterministic pseudo-random digit strings with many planted 1-edit
    // neighbors (zero-padded numbers differ by single substitutions)
    val strs = (0 until 200).map(i => f"${(i * 37) % 500}%04d")
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val expected = (for {
      i <- strs.indices; j <- (i + 1) until strs.size
      d = lev(strs(i), strs(j)) if d <= 1
    } yield (i.toLong, j.toLong, d)).toSet
    assert(expected.nonEmpty) // the corpus must actually exercise the join
    assert(pairsOf(strs) == expected)
  }

  test("blockingStats replays the string-variant funnel exactly") {
    // same corpus as the brute-force test; the in-test funnel uses variant
    // STRINGS where the engine joins xxhash64 keys, so equality here is
    // also a collision check on this corpus
    val strs = (0 until 200).map(i => f"${(i * 37) % 500}%04d")
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    // (pos, variant) rows: -1 = the full string, i = delete char i; a
    // candidate channel survives only position-consistent (same pos, or
    // either side the full string) — the engine's residual prune
    val vars = strs.zipWithIndex.map { case (s, i) =>
      (i.toLong, s,
        Seq((-1, s)) ++ s.indices.map(j => (j + 1, s.take(j) + s.drop(j + 1))))
    }
    val shared = for {
      (a, sa, va) <- vars; (b, sb, vb) <- vars if a < b
      n = (for {
        (pa, x) <- va; (pb, y) <- vb
        if x == y && (pa == pb || pa == -1 || pb == -1)
      } yield 1).size
      if n > 0
    } yield (a, b, sa, sb, n)
    val nCand = shared.map(_._5.toLong).sum
    val nVer = shared.collect { case (_, _, sa, sb, n) if lev(sa, sb) <= 1 => n.toLong }.sum
    val nPairs = shared.count { case (_, _, sa, sb, _) => lev(sa, sb) <= 1 }.toLong
    val r = EditDistanceJoin.blockingStats(
        strs.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "name"),
        "id", "name").head()
    assert(r.getLong(0) == strs.size.toLong)           // n_strings
    assert(r.getLong(1) == vars.map(_._3.size.toLong).sum) // n_variant_rows
    assert(r.getLong(2) == nCand)                      // n_candidates
    assert(r.getLong(3) == nVer)                       // n_verified
    assert(r.getLong(4) == nPairs)                     // n_pairs
    // the position residual must beat position-blind blocking: without it
    // this corpus produces cross-position (transposition-shaped) false
    // candidates that the residual kills before the levenshtein
    val nCandUnpruned = (for {
      (a, _, va) <- vars; (b, _, vb) <- vars if a < b
      (_, x) <- va; (_, y) <- vb if x == y
    } yield 1).size.toLong
    assert(nCandUnpruned > nCand, "the position residual must prune")
    assert(nCand >= nVer && nVer >= nPairs, "the funnel can only narrow")
  }
}
