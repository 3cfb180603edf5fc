package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Micro-corpus truth tables for the long-span substring dedup: every
  * structural path the gate corpus may not exercise — within-doc repeats,
  * island breaks (two separate spans in one doc), adjacency merges, the
  * sub-window short-doc guard, and kernel/hash parity with the MinHash
  * shingle machinery.
  */
class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  // tokens "w0 w1 w2 ..." — distinct unless deliberately shared
  private def toks(prefix: String, from: Int, until: Int): String =
    (from until until).map(i => s"$prefix$i").mkString(" ")

  test("kernel: position-ordered, non-distinct, rolling == direct recompute") {
    val df = Seq("a b a b a").toDF("text")
      .select(split(col("text"), " ").as("tk"))
    val seq2 = df.select(SpanDedup.gramHashSeq(col("tk"), 2)).head().getSeq[Long](0)
    assert(seq2.length == 4)            // positions 1..4, duplicates kept
    assert(seq2(0) == seq2(2))          // "a b" at pos 1 and 3
    assert(seq2(1) == seq2(3))          // "b a" at pos 2 and 4
    assert(seq2(0) != seq2(1))          // "a b" vs "b a": order matters
    // the O(1)-per-step roll must equal a from-scratch polynomial per
    // window: compare against windows computed as their own 1-doc arrays
    // (a length-n doc has exactly one window — no roll step involved)
    val win = Seq("a b", "b a").toDF("text")
      .select(SpanDedup.gramHashSeq(split(col("text"), " "), 2))
      .collect().map(_.getSeq[Long](0).head)
    assert(seq2 == Seq(win(0), win(1), win(0), win(1)))
  }

  test("kernel: a doc shorter than one window yields NO windows (no whole-doc fallback)") {
    val got = Seq("a b c").toDF("text")
      .select(SpanDedup.gramHashSeq(split(col("text"), " "), 4))
      .head().getSeq[Long](0)
    assert(got.isEmpty)
  }

  test("cross-doc shared span is found with exact bounds; unique docs never flag") {
    // docs 1 and 2 share tokens s0..s9 (positions 3..12 in doc 1,
    // 1..10 in doc 2); doc 3 is entirely unique
    val d1 = toks("a", 0, 2) + " " + toks("s", 0, 10) + " " + toks("b", 0, 3)
    val d2 = toks("s", 0, 10) + " " + toks("c", 0, 5)
    val d3 = toks("u", 0, 20)
    val docs = Seq((1L, d1), (2L, d2), (3L, d3)).toDF("doc_id", "text")
    val got = SpanDedup.spans(docs, "doc_id", "text", n = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3))).toSet
    assert(got == Set((1L, 3, 12, 10), (2L, 1, 10, 10)))
  }

  test("within-doc repetition counts as repeated (the Lee-et-al second occurrence)") {
    // one doc, nobody else: "r0..r4" occurs at positions 1 and 11
    val d = toks("r", 0, 5) + " " + toks("x", 0, 5) + " " + toks("r", 0, 5)
    val got = SpanDedup.spans(Seq((7L, d)).toDF("doc_id", "text"),
        "doc_id", "text", n = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(got == Set((7L, 1, 5), (7L, 11, 15)))
  }

  test("island break: two far-apart shared spans stay two spans; profile aggregates them") {
    // doc 1 shares s-span (pos 1..6) and t-span (pos 27..34) with doc 2;
    // the 20 unique tokens between them exceed the n=6 merge gap
    val d1 = toks("s", 0, 6) + " " + toks("q", 0, 20) + " " + toks("t", 0, 8)
    val d2 = toks("s", 0, 6) + " " + toks("z", 0, 9) + " " + toks("t", 0, 8)
    val docs = Seq((1L, d1), (2L, d2)).toDF("doc_id", "text")
    val spans = SpanDedup.spans(docs, "doc_id", "text", n = 6)
      .filter(col("doc_id") === 1L)
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getInt(3))).toSet
    assert(spans == Set((1, 6, 6), (27, 34, 8)))
    val prof = SpanDedup.profile(docs, "doc_id", "text", n = 6)
      .filter(col("doc_id") === 1L).head()
    assert((prof.getLong(1), prof.getLong(2), prof.getInt(3)) == ((2L, 14L, 8)))
  }

  test("adjacent windows merge: a repeated 2n-token span is ONE span, not two") {
    val shared = toks("m", 0, 12)
    val docs = Seq((1L, shared + " " + toks("p", 0, 4)),
      (2L, shared + " " + toks("q", 0, 4))).toDF("doc_id", "text")
    val got = SpanDedup.spans(docs, "doc_id", "text", n = 6)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3))).toSet
    assert(got == Set((1L, 1, 12, 12), (2L, 1, 12, 12)))
  }

  test("gate corpus is non-vacuous at sf0.001 and matches the 50-token contract") {
    val docs = graft.Tables.documents(spark, sf("sf0.001"))
    val prof = SpanDedup.profile(docs, "doc_id", "text", n = 50).collect()
    assert(prof.length == 28) // pinned: the template near-dup prefix count
    assert(prof.forall(_.getInt(3) >= 50)) // every max span >= one window
    // docs shorter than 50 tokens can never appear
    val shortIds = docs
      .filter(size(split(trim(col("text")), " +")) < 50)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(prof.map(_.getLong(0)).toSet.intersect(shortIds).isEmpty)
  }

  test("removal keeps the canonical (lowest doc, pos) occurrence and cuts the rest") {
    val d1 = toks("a", 0, 2) + " " + toks("s", 0, 10) + " " + toks("b", 0, 3)
    val d2 = toks("s", 0, 10) + " " + toks("c", 0, 5)
    val docs = Seq((1L, "en", d1), (2L, "en", d2)).toDF("doc_id", "lang", "text")
    val out = SpanDedup.removeSpans(docs, "doc_id", "text", n = 5)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out(1L) == d1)                      // canonical holder untouched
    assert(out(2L) == toks("c", 0, 5))         // shared span cut, tail kept
  }

  test("removal cuts the within-doc SECOND occurrence, keeps the first") {
    val d = toks("r", 0, 5) + " " + toks("x", 0, 5) + " " + toks("r", 0, 5)
    val out = SpanDedup.removeSpans(
        Seq((7L, "en", d)).toDF("doc_id", "lang", "text"),
        "doc_id", "text", n = 5)
      .head().getString(2)
    assert(out == toks("r", 0, 5) + " " + toks("x", 0, 5))
  }

  test("a doc that is entirely a non-canonical copy is cut to the empty string") {
    val shared = toks("w", 0, 8)
    val docs = Seq((1L, "en", shared), (2L, "en", shared))
      .toDF("doc_id", "lang", "text")
    val out = SpanDedup.removeSpans(docs, "doc_id", "text", n = 8)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out(1L) == shared && out(2L) == "")
  }

  test("untouched docs keep their text byte-for-byte; extra columns ride through") {
    val weird = "  u0   u1 u2\tu3  " // odd whitespace must survive untouched
    val docs = Seq((1L, "en", weird, 42)).toDF("doc_id", "lang", "text", "extra")
    val out = SpanDedup.removeSpans(docs, "doc_id", "text", n = 3).head()
    assert(out.getString(2) == weird)
    assert(out.getInt(3) == 42)
    assert(SpanDedup.removeSpans(docs, "doc_id", "text", n = 3).columns.toSeq ==
      Seq("doc_id", "lang", "text", "extra"))
  }

  test("removalAudit: counts and checksum reconcile with the removed corpus") {
    val d1 = toks("a", 0, 2) + " " + toks("s", 0, 10) + " " + toks("b", 0, 3)
    val d2 = toks("s", 0, 10) + " " + toks("c", 0, 5)
    val d3 = toks("u", 0, 7)
    val docs = Seq((1L, "en", d1), (2L, "en", d2), (3L, "de", d3))
      .toDF("doc_id", "lang", "text")
    val audit = SpanDedup.removalAudit(docs, "doc_id", "text", "lang", n = 5)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(audit("de") == ((1L, 0L, 7L, 0L,
      kmv(d3))))                                // untouched: checksum of raw text
    assert(audit("en") == ((2L, 1L, 30L, 10L,  // 15 + 15 tokens, 10 cut from d2
      kmv(d1) + kmv(toks("c", 0, 5)))))
  }

  private def kmv(s: String): Long =
    Seq(s).toDF("t")
      .select(graft.functions.KmvSketch.kmvKey(col("t"))).head().getLong(0)

  test("plan shape: the semi-join back is broadcast (small dup set) or exchange-reused") {
    // two acceptable adaptive shapes, both scale-correct: when the
    // repeated-gram set is small AQE broadcasts it and the probe side
    // never shuffles at all (the plan at gate scale); when it is not,
    // the shuffled semi-join shares the gram stream's exchange. What must
    // NEVER appear is a shuffle of the stream feeding a plain inner join.
    val docs = graft.Tables.documents(spark, sf("sf0.001"))
    val df = SpanDedup.repeatedWindows(docs, "doc_id", "text", n = 50)
    df.collect() // drive AQE to the final plan before reading it
    val plan = df.queryExecution.executedPlan.toString
    val broadcastSemi = plan.linesIterator.exists(l =>
      l.contains("BroadcastHashJoin") && l.contains("LeftSemi"))
    assert(broadcastSemi || plan.contains("ReusedExchange"),
      s"expected broadcast semi-join or a reused gram exchange:\n$plan")
  }
}
