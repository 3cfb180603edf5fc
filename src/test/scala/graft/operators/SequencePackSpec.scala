package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Pack-and-split: hand-derivable placements, the full-capacity
  * invariant, and partitioning-independence of the distributed prefix
  * sum (the determinism the canonical order promises).
  */
class SequencePackSpec extends SparkSpec {
  import spark.implicits._

  test("hand-checked placements and per-sequence report") {
    // token stream in doc order: 3 + 4 + 6 + 2 = 15 tokens, capacity 5
    val docs = Seq(
      (1L, "a b c"),          // [0,3)   -> seq 0
      (2L, "d e f g"),        // [3,7)   -> seqs 0,1
      (3L, "h i j k l m"),    // [7,13)  -> seqs 1,2
      (5L, "n o")             // [13,15) -> seq 2
    ).toDF("doc_id", "text")
    val assigned = SequencePack.assign(docs, 5L)
    val rows = assigned.orderBy($"doc_id")
      .select($"doc_id", $"n_tokens", $"start_offset", $"first_seq", $"last_seq")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows === Array(
      (1L, 3L, 0L, 0L, 0L), (2L, 4L, 3L, 0L, 1L),
      (3L, 6L, 7L, 1L, 2L), (5L, 2L, 13L, 2L, 2L)))
    val summary = SequencePack.summary(assigned, 5L)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(summary === Array(
      (0L, 2L, 5L, 1L, 2L), (1L, 2L, 5L, 2L, 3L), (2L, 2L, 5L, 3L, 5L)))
  }

  test("zero-token docs are excluded; every sequence is full except the tail") {
    val docs = Tables.documents(spark, sf("sf0.001"))
      .unionByName(Seq((999999L, "   ")).toDF("doc_id", "text"),
        allowMissingColumns = true)
    val cap = 256L
    val summary = SequencePack.summary(SequencePack.assign(docs, cap), cap)
      .select($"seq_id", $"n_tokens").as[(Long, Long)].collect()
    val last = summary.map(_._1).max
    summary.foreach { case (s, n) =>
      if (s < last) assert(n === cap, s"sequence $s not full: $n")
      else assert(n >= 1 && n <= cap)
    }
    assert(summary.map(_._1).toSeq === (0L to last))
  }

  test("the pack is invariant under input partitioning") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val a = SequencePack.summary(SequencePack.assign(docs, 128L), 128L).collect()
    val b = SequencePack.summary(
      SequencePack.assign(docs.repartition(13), 128L), 128L).collect()
    assert(a.toSeq === b.toSeq)
  }

  test("manifest: increment equals batch, stored placements untouched") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_pack_manifest_spec_").toString
    val docs = Tables.documents(spark, sf("sf0.001"))
    SequencePack.Manifest.write(docs.filter($"doc_id" < 250), 256L, dir)
    val before = SequencePack.Manifest.loadAssign(spark, dir)
      .orderBy($"doc_id").collect()
    SequencePack.Manifest.append(docs.filter($"doc_id" >= 250), dir)
    val grown = SequencePack.Manifest.loadAssign(spark, dir)
    // batch equivalence, placement for placement
    val batch = SequencePack.assign(docs, 256L)
    assert(grown.orderBy($"doc_id").collect().toSeq ===
      batch.orderBy($"doc_id").collect().toSeq)
    // the stored prefix was appended to, never rewritten
    assert(grown.filter($"doc_id" < 250).orderBy($"doc_id").collect().toSeq
      === before.toSeq)
    assert(SequencePack.Manifest.capacityOf(spark, dir) === 256L)
    // the former tail sequence gains cohabitants from both sides of the cut
    val boundarySeq = before.map(_.getAs[Long]("last_seq")).max
    val cohort = SequencePack.summary(grown, 256L)
      .filter($"seq_id" === boundarySeq)
      .select($"first_doc", $"last_doc").as[(Long, Long)].head()
    assert(cohort._1 < 250 && cohort._2 >= 250,
      s"expected the cut to land mid-sequence: $cohort")
  }

  test("manifest: a crashed append (placements written, meta not swapped) " +
      "is invisible to loads and absorbed by the retry") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_pack_manifest_spec_").toString
    val docs = Tables.documents(spark, sf("sf0.001"))
    SequencePack.Manifest.write(docs.filter($"doc_id" < 250), 256L, dir)
    val committed = SequencePack.Manifest.loadAssign(spark, dir)
      .orderBy($"doc_id").collect().toSeq
    // simulate the crash window: the increment's placement files land in
    // assign/ but the meta swap never happens (ids > committed max)
    SequencePack.assign(docs, 256L).filter($"doc_id" >= 250)
      .write.mode("append").parquet(s"$dir/assign")
    // (a) the orphan rows are not visible — loads read the committed snapshot
    assert(SequencePack.Manifest.loadAssign(spark, dir)
      .orderBy($"doc_id").collect().toSeq === committed)
    // (b) the retry cleans the orphans and lands exactly the batch answer
    SequencePack.Manifest.append(docs.filter($"doc_id" >= 250), dir)
    val grown = SequencePack.Manifest.loadAssign(spark, dir)
    val batch = SequencePack.assign(docs, 256L)
    assert(grown.orderBy($"doc_id").collect().toSeq ===
      batch.orderBy($"doc_id").collect().toSeq)
    // no duplicate placements survived the replay
    assert(grown.count() === grown.select($"doc_id").distinct().count())
    // and the orphan FILES are physically gone — deleted through the
    // filesystem URI via the Hadoop FS API (round-16 ADVICE: the java.nio
    // form silently no-ops on non-local filesystems): a RAW, unfiltered
    // scan of assign/ holds exactly the batch rows, nothing orphaned
    assert(spark.read.parquet(s"$dir/assign").count() === batch.count())
  }

  test("manifest: interleaved append ids fail fast") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_pack_manifest_spec_").toString
    SequencePack.Manifest.write(
      Seq((10L, "a b c"), (20L, "d e")).toDF("doc_id", "text"), 4L, dir)
    val e = intercept[IllegalArgumentException] {
      SequencePack.Manifest.append(
        Seq((15L, "x y")).toDF("doc_id", "text"), dir)
    }
    assert(e.getMessage.contains("repack"))
    // an all-empty increment is a no-op, not an error
    SequencePack.Manifest.append(Seq((30L, "  ")).toDF("doc_id", "text"), dir)
    assert(SequencePack.Manifest.loadAssign(spark, dir).count() === 2)
  }

  test("prefixSum matches the window cumsum on a total order") {
    val df = Seq((3L, 10L), (1L, 5L), (7L, 2L), (2L, 8L))
      .toDF("id", "v")
    val got = DistRank.prefixSum(df, Seq($"id"), "v")
      .orderBy($"id").select($"id", $"offset").as[(Long, Long)].collect()
    assert(got === Array((1L, 0L), (2L, 5L), (3L, 13L), (7L, 23L)))
  }
}
