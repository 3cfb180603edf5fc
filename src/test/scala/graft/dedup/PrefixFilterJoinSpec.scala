package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The prefix-filtering exact similarity join: recall GUARANTEE vs an
  * in-test brute force (the property LSH cannot give), threshold boundary
  * semantics, and short-text edge cases.
  */
class PrefixFilterJoinSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force word-w-gram Jaccard pairs at >= num/den, in plain Scala
    * (same tokenization + short-doc fallback as the engine kernel).
    */
  private def bruteForce(docs: Seq[(Long, String)], num: Long, den: Long,
                         w: Int): Set[(Long, Long, Long, Long)] = {
    def shingles(t: String): Set[String] = {
      val ws = t.trim.split(" +").toSeq
      if (ws.length >= w) ws.sliding(w).map(_.mkString(" ")).toSet
      else Set(ws.mkString(" "))
    }
    val g = docs.map { case (id, t) => id -> shingles(t) }.toMap
    (for {
      (a, sa) <- g; (b, sb) <- g if a < b
      inter = (sa & sb).size.toLong
      uni = (sa | sb).size.toLong
      if inter * den >= uni * num
    } yield (a, b, inter, uni)).toSet
  }

  private def engine(docs: Seq[(Long, String)], num: Long, den: Long,
                     w: Int = 5): Set[(Long, Long, Long, Long)] =
    PrefixFilterJoin.similarPairs(docs.toDF("doc_id", "text"), num, den,
        shingleWords = w)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

  test("recall guarantee: engine pairs == brute force on a mixed corpus") {
    val base = "the quick brown fox jumps over the lazy dog and runs away fast"
    val docs = Seq(
      1L -> base,
      2L -> base,                                  // exact copy
      3L -> (base + " again and again today"),     // near copy
      4L -> base.replace("quick", "slow"),         // small edit
      5L -> "completely different text about distributed query engines and planners",
      6L -> "completely different text about distributed query planners and engines",
      7L -> "unrelated short doc",
      8L -> ((base + " ") * 3).trim,               // repetitive expansion
      9L -> base.split(" ").take(8).mkString(" "), // truncation
      10L -> "another singleton document with its own words entirely distinct")
    val expected = bruteForce(docs, 3, 5, 5)
    assert(expected.nonEmpty, "fixture must contain true pairs")
    assert(engine(docs, 3, 5) == expected)
    // and at the production threshold too
    assert(engine(docs, 4, 5) == bruteForce(docs, 4, 5, 5))
  }

  test("threshold boundary is inclusive (>= num/den, exact rational)") {
    // "a b c d e f" -> shingles {a b c d e, b c d e f}
    // "a b c d e g" -> shingles {a b c d e, b c d e g}
    // inter = 1, union = 3 -> J = 1/3 exactly
    val docs = Seq(1L -> "a b c d e f", 2L -> "a b c d e g")
    assert(engine(docs, 1, 3) == Set((1L, 2L, 1L, 3L)))  // >= 1/3: kept
    assert(engine(docs, 1, 2) == Set.empty)              // >= 1/2: dropped
  }

  test("short texts (below shingle width) fall back to whole-text shingles") {
    val docs = Seq(1L -> "tiny doc", 2L -> "tiny doc", 3L -> "other doc")
    assert(engine(docs, 4, 5) == Set((1L, 2L, 1L, 1L)))
  }

  test("no self-pairs and no reversed duplicates") {
    val t = "five whole words right here exactly once"
    val docs = Seq(1L -> t, 2L -> t, 3L -> t)
    // 7 words -> 3 shingles; identical docs share all 3
    assert(engine(docs, 4, 5) == Set((1L, 2L, 3L, 3L), (1L, 3L, 3L, 3L),
      (2L, 3L, 3L, 3L)))
  }

  test("blockingStats: funnel invariants + order-blind columns exact") {
    val base = "the quick brown fox jumps over the lazy dog and runs away fast"
    val docs = Seq(
      1L -> base, 2L -> base, 3L -> (base + " again and again today"),
      4L -> base.replace("quick", "slow"),
      5L -> "completely different text about distributed query engines and planners",
      6L -> "completely different text about distributed query planners and engines",
      7L -> "unrelated short doc", 8L -> ((base + " ") * 3).trim,
      9L -> base.split(" ").take(8).mkString(" "),
      10L -> "another singleton document with its own words entirely distinct")
    val r = PrefixFilterJoin.blockingStats(docs.toDF("doc_id", "text"),
      num = 4, den = 5, shingleWords = 5).head()
    val (nDocs, nPrefix, slots, candPairs, res) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    // order-blind columns are theorems: doc count, prefix mass
    // sum(l - ceil(4l/5) + 1) over distinct-shingle counts, result size
    def shingles(t: String): Set[String] = {
      val ws = t.trim.split(" +").toSeq
      if (ws.length >= 5) ws.sliding(5).map(_.mkString(" ")).toSet
      else Set(ws.mkString(" "))
    }
    val expectedPrefix = docs.map { case (_, t) =>
      val l = shingles(t).size.toLong
      l - math.ceil(l * 4.0 / 5.0).toLong + 1
    }.sum
    assert(nDocs == docs.size.toLong)
    assert(nPrefix == expectedPrefix)
    assert(res == engine(docs, 4, 5).size.toLong)
    // funnel can only narrow: raw slots >= distinct candidates >= verified
    assert(slots >= candPairs && candPairs >= res)
    // and the candidate stage is doing real pruning vs all-pairs (45)
    assert(candPairs < docs.size.toLong * (docs.size - 1) / 2)
  }
}
