package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The persisted tokenizer: write/load must round-trip the merge table
  * and vocab exactly, the vocab id contract must hold (sorted base
  * block, then merge outputs in round order), encodeToIds must produce
  * the hand-derivable sequences, and the staging swap must self-heal.
  */
class BpeStoreSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft_bpe_store_spec_").toString

  // corpus: "ab" dominates, then "abc"; merges learned to exhaustion are
  // (a,b) then (ab,c) — the chain case
  private def docs = Seq(
    (1L, "ab ab ab abc"),
    (2L, "abc ab xy")).toDF("doc_id", "text")

  test("write/load round-trips merges and the id contract holds") {
    val dir = freshDir()
    val merges = BpeTrainer.learnMergesDistilled(docs, nMerges = 8)
    BpeStore.write(merges, BpeTrainer.baseSymbols(docs), dir)
    val st = BpeStore.load(spark, dir)
    // learned chain: (a,b) count 6, then (ab,c) count 2, then (x,y) 1
    assert(st.merges === Seq(("a", "b"), ("ab", "c"), ("x", "y")))
    // base block: sorted distinct code points a,b,c,x,y -> ids 0..4;
    // merge outputs ab, abc, xy -> 5, 6, 7
    assert(st.vocab === Map("a" -> 0, "b" -> 1, "c" -> 2, "x" -> 3,
      "y" -> 4, "ab" -> 5, "abc" -> 6, "xy" -> 7))
  }

  test("encodeToIds emits ordered id sequences; unknown symbols map to -1") {
    val dir = freshDir()
    BpeStore.write(BpeTrainer.learnMergesDistilled(docs, nMerges = 8),
      BpeTrainer.baseSymbols(docs), dir)
    val st = BpeStore.load(spark, dir)
    val out = BpeTrainer.encodeToIds(docs, st.merges, st.vocab)
      .orderBy($"doc_id")
      .select($"doc_id", $"ids", $"n_words", $"n_ids")
      .as[(Long, Seq[Int], Long, Long)].collect()
    assert(out(0) === ((1L, Seq(5, 5, 5, 6), 4L, 4L)))
    assert(out(1) === ((2L, Seq(6, 5, 7), 3L, 3L)))
    // prefix table (first merge only): abc -> ab + c, xy stays x y
    val prefix = BpeTrainer.encodeToIds(docs, st.merges.take(1), st.vocab)
      .orderBy($"doc_id").select($"ids").as[Seq[Int]].collect()
    assert(prefix(0) === Seq(5, 5, 5, 5, 2))
    assert(prefix(1) === Seq(5, 2, 5, 3, 4))
    // serving-time unseen code point -> -1 (pinned UNK), known parts keep ids
    val unk = BpeTrainer.encodeToIds(
        Seq((9L, "ab zq")).toDF("doc_id", "text"), st.merges, st.vocab)
      .select($"ids").as[Seq[Int]].head()
    assert(unk === Seq(5, -1, -1))
  }

  test("load self-heals an interrupted staging swap") {
    val dir = freshDir()
    val merges = BpeTrainer.learnMergesDistilled(docs, nMerges = 8)
    BpeStore.write(merges, BpeTrainer.baseSymbols(docs), dir)
    val before = BpeStore.load(spark, dir)
    // simulate the crash window on vocab: staging complete, live absent
    val live = java.nio.file.Paths.get(dir, "vocab")
    val staging = java.nio.file.Paths.get(dir, "vocab_staging")
    java.nio.file.Files.move(live, staging)
    assert(!java.nio.file.Files.exists(live))
    val healed = BpeStore.load(spark, dir)
    assert(java.nio.file.Files.exists(live))
    assert(healed.vocab === before.vocab && healed.merges === before.merges)
  }
}
