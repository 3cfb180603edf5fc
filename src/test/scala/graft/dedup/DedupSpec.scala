package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  // corpus with planted exact dups, near dups (one word changed), and noise
  private def mk(i: Int, words: Seq[String]) = (i.toLong, words.mkString(" "))
  private lazy val corpus = {
    val base = (1 to 40).map(i => s"w$i")
    Seq(
      mk(1, base),
      mk(2, base),                                       // exact dup of 1
      mk(3, base.updated(20, "changed")),                // near dup of 1
      mk(4, (1 to 40).map(i => s"x$i")),                 // distinct
      mk(5, (1 to 40).map(i => s"y$i")),                 // distinct
      mk(6, base.updated(5, "alpha").updated(30, "beta")) // near-ish dup of 1
    ).toDF("doc_id", "text")
  }

  test("ExactDedup: groups, summary, and deduplicate") {
    val dups = ExactDedup.duplicateGroups(corpus).collect()
    assert(dups.length === 1)
    assert(dups(0).getAs[Long]("canonical_id") === 1L)
    assert(dups(0).getAs[Long]("n_copies") === 2L)
    val sum = ExactDedup.summary(corpus).collect()(0)
    assert(sum.getAs[Long]("n_docs") === 6L)
    assert(sum.getAs[Long]("n_distinct") === 5L)
    val kept = ExactDedup.deduplicate(corpus).select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq === Seq(1L, 3L, 4L, 5L, 6L))
  }

  test("MinHashLSH: finds planted near-dups, no cross-noise pairs") {
    val found = MinHashLSH.nearDuplicates(corpus, threshold = 0.5)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(found.contains((1L, 2L)), s"exact dup missed: $found")
    assert(found.contains((1L, 3L)), s"near dup missed: $found")
    assert(!found.exists { case (a, b) => Set(a, b) == Set(4L, 5L) },
      "distinct docs flagged as near-dups")
  }

  test("MinHashLSH: jaccard values are exact on shingle sets") {
    val sigs = MinHashLSH.signatures(corpus)
    val j = MinHashLSH.verifyPairs(Seq((1L, 2L), (1L, 4L)).toDF("id1", "id2"), sigs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(j((1L, 2L)) === 1.0)
    assert(j((1L, 4L)) === 0.0)
  }

  test("MinHashLSH: short documents (< shingle size) survive") {
    val tiny = Seq((1L, "one two"), (2L, "one two"), (3L, "")).toDF("doc_id", "text")
    val found = MinHashLSH.nearDuplicates(tiny, threshold = 0.9)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(found.contains((1L, 2L)))
  }

  test("SimHashDedup: exact dup at hamming 0, near dup within 8") {
    val near = SimHashDedup.nearDuplicates(corpus, maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(near.get((1L, 2L)).contains(0), s"got $near")
    assert(near.contains((1L, 3L)), s"near dup missed: $near")
  }

  test("NgramJaccard: identity 1.0, disjoint 0.0, verified pipeline finds dups") {
    val j = NgramJaccard.forPairs(
      Seq((1L, 2L), (4L, 5L)).toDF("id1", "id2"), corpus)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(j((1L, 2L)) === 1.0)
    assert(j((4L, 5L)) < 0.5)
    val found = NgramJaccard.nearDuplicates(corpus, threshold = 0.8)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(found.contains((1L, 2L)))
  }

  test("empty corpus: every dedup path returns empty, no crash") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(MinHashLSH.nearDuplicates(empty).count() === 0)
    assert(SimHashDedup.nearDuplicates(empty).count() === 0)
    assert(ExactDedup.deduplicate(empty).count() === 0)
    assert(ConnectedComponents.canonicalAssignments(
      Seq.empty[(Long, Long)].toDF("id1", "id2")).count() === 0)
  }

  test("MinHashLSH on real documents at sf0.001 runs clean") {
    val docs = graft.Tables.documents(spark, sf("sf0.001"))
    val pairs = MinHashLSH.nearDuplicates(docs, threshold = 0.8).collect()
    // synthetic corpus: just assert shape + no self/dup pairs
    val keys = pairs.map(r => (r.getLong(0), r.getLong(1)))
    assert(keys.distinct.length === keys.length)
    assert(keys.forall { case (a, b) => a < b })
  }
}
