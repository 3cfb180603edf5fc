package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The prefix-filtering exact similarity join: recall GUARANTEE vs an
  * in-test brute force (the property LSH cannot give), threshold boundary
  * semantics, and short-text edge cases.
  */
class PrefixFilterJoinSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force char-3-gram Jaccard pairs at >= num/den, in plain Scala. */
  private def bruteForce(docs: Seq[(Long, String)], num: Long, den: Long)
      : Set[(Long, Long, Long, Long)] = {
    def grams(t: String): Set[String] = {
      val n = t.trim.toLowerCase.replaceAll("\\s+", " ")
      if (n.length >= 3) n.sliding(3).toSet else Set(n)
    }
    val g = docs.map { case (id, t) => id -> grams(t) }.toMap
    (for {
      (a, sa) <- g; (b, sb) <- g if a < b
      inter = (sa & sb).size.toLong
      uni = (sa | sb).size.toLong
      if inter * den >= uni * num
    } yield (a, b, inter, uni)).toSet
  }

  private def engine(docs: Seq[(Long, String)], num: Long, den: Long)
      : Set[(Long, Long, Long, Long)] =
    PrefixFilterJoin.similarPairs(docs.toDF("doc_id", "text"), num, den)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

  test("recall guarantee: engine pairs == brute force on a mixed corpus") {
    val base = "the quick brown fox jumps over the lazy dog and runs away fast"
    val docs = Seq(
      1L -> base,
      2L -> base,                                  // exact copy
      3L -> (base + " again"),                     // near copy
      4L -> base.replace("quick", "slow"),         // small edit
      5L -> "completely different text about distributed query engines",
      6L -> "completely different text about distributed query planners",
      7L -> "unrelated short doc",
      8L -> ("the quick brown fox " * 4),          // repetitive
      9L -> (base.substring(0, 30)),               // truncation
      10L -> "another singleton document with its own words entirely")
    val expected = bruteForce(docs, 4, 5)
    assert(expected.nonEmpty, "fixture must contain true pairs")
    assert(engine(docs, 4, 5) == expected)
  }

  test("threshold boundary is inclusive (>= num/den, exact rational)") {
    // two docs engineered to share exactly 4 of 5 union grams is hard by
    // hand with char-3-grams; instead check both thresholds bracket the
    // measured similarity of a known pair
    val docs = Seq(1L -> "abcdefgh", 2L -> "abcdefgX")
    // grams(1): abc bcd cde def efg fgh (6); grams(2): abc..efg + fgX (6)
    // inter = 5, union = 7 -> J = 5/7
    assert(engine(docs, 5, 7) == Set((1L, 2L, 5L, 7L)))  // >= 5/7: kept
    assert(engine(docs, 3, 4) == Set.empty)              // >= 3/4: dropped
  }

  test("short texts (below gram width) fall back to whole-string grams") {
    val docs = Seq(1L -> "ab", 2L -> "ab", 3L -> "cd")
    // "ab" normalizes to a single gram; identical docs J=1
    assert(engine(docs, 4, 5) == Set((1L, 2L, 1L, 1L)))
  }

  test("no self-pairs and no reversed duplicates") {
    val docs = Seq(1L -> "same text here", 2L -> "same text here",
      3L -> "same text here")
    val pairs = engine(docs, 4, 5)
    assert(pairs == Set((1L, 2L, 12L, 12L), (1L, 3L, 12L, 12L),
      (2L, 3L, 12L, 12L)))
  }
}
