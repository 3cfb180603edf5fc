package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Persisted-dedup-store truth tables: disk round-trip fidelity, the
  * four-verdict ingest, the planted q187 construction's guarantees, and
  * the append-then-reingest cycle.
  */
class DedupStoreSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft_dstore_test").toString

  private def docs(rows: (Long, String)*) =
    rows.map { case (id, t) => (id, t, "en") }.toSeq
      .toDF("doc_id", "text", "lang")

  test("write/load round-trip: canonical hashes and signatures, exactly") {
    val corpus = docs(
      1L -> "alpha beta gamma", 2L -> "alpha beta gamma", // exact dups
      3L -> "delta epsilon zeta")
    val dir = tmpDir()
    DedupStore.write(corpus, dir)
    val st = DedupStore.load(spark, dir)
    // duplicates collapse to the min-id canonical before distillation
    val hs = st.hashes.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(hs.values.toSet == Set(1L, 3L))
    val sims = st.simhashes.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(sims.map(_._1).toSeq == Seq(1L, 3L))
    // signatures equal a fresh in-query computation
    val fresh = corpus.filter(col("doc_id").isin(1L, 3L)).orderBy("doc_id")
      .select(graft.functions.HashExprs.simhash64(col("text"))).collect()
      .map(_.getLong(0))
    assert(sims.map(_._2).toSeq == fresh.toSeq)
  }

  test("ingest labels all four verdicts; exact precedence over near") {
    val dir = tmpDir()
    DedupStore.write(docs(1L -> "alpha beta gamma"), dir)
    val st = DedupStore.load(spark, dir)
    val batch = docs(
      10L -> "alpha beta gamma",   // dup_vs_store (exact, NOT near)
      11L -> "new words here",     // new
      12L -> "new words here",     // dup_in_batch (11 is the canonical)
      13L -> "alpha  beta gamma")  // near_dup_vs_store (md5 differs,
                                   // simhash identical: whitespace run)
    val v = DedupStore.ingest(st, batch).select("doc_id", "verdict")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(v == Map(10L -> "dup_vs_store", 11L -> "new",
      12L -> "dup_in_batch", 13L -> "near_dup_vs_store"))
  }

  test("q187 planted construction: space variant is Hamming 0, fresh vocab > 3") {
    val stored = graft.Planted.dedupStoredDocs(spark)
      .select(col("doc_id"), graft.functions.HashExprs.simhash64(col("text")).as("sim"))
    val batch = graft.Planted.dedupBatchDocs(spark)
      .select(col("doc_id"), graft.functions.HashExprs.simhash64(col("text")).as("sim"))
    val ham = batch.as("b").crossJoin(stored.as("s"))
      .groupBy(col("b.doc_id"))
      .agg(min(bit_count(col("b.sim").bitwiseXOR(col("s.sim"))))
        .cast("long").as("mh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val base = graft.Planted.dsBase
    (0 until 5).foreach { i =>
      assert(ham(base + 100 + i) == 0L, s"exact copy $i")
      assert(ham(base + 200 + i) == 0L, s"space variant $i")
      assert(ham(base + 300 + i) > 3L, s"fresh vocab $i: ${ham(base + 300 + i)}")
    }
  }

  test("append folds the accepted batch in; re-ingest sees only dups") {
    val dir = tmpDir()
    DedupStore.write(docs(1L -> "alpha beta gamma"), dir)
    val batch = docs(20L -> "brand new content", 21L -> "other fresh text")
    val st = DedupStore.load(spark, dir)
    val accepted = DedupStore.ingest(st, batch)
      .filter(col("verdict") === "new").drop("verdict")
    assert(accepted.count() == 2)
    DedupStore.append(accepted, dir)
    val grown = DedupStore.load(spark, dir)
    assert(grown.hashes.count() == 3 && grown.simhashes.count() == 3)
    val again = DedupStore.ingest(grown, batch)
      .select("doc_id", "verdict").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(again == Map(20L -> "dup_vs_store", 21L -> "dup_vs_store"))
  }

  test("purge tombstones both state tables; purged content re-ingests new") {
    val dir = tmpDir()
    DedupStore.write(docs(
      1L -> "alpha beta gamma", 2L -> "delta epsilon zeta"), dir)
    DedupStore.purge(Seq(1L).toDF("doc_id"), dir)
    val st = DedupStore.load(spark, dir)
    // the tombstoned row is invisible in BOTH tables; 2 survives
    assert(st.hashes.select("canonical_id").as[Long].collect().toSet == Set(2L))
    assert(st.simhashes.select("doc_id").as[Long].collect().toSet == Set(2L))
    val v = DedupStore.ingest(st, docs(
      10L -> "alpha beta gamma",   // purged content: NEW again
      11L -> "alpha  beta gamma",  // near-variant of purged: NEW again
      12L -> "delta epsilon zeta", // unpurged: still suppressed
      13L -> "delta  epsilon zeta")) // near of unpurged: still near
      .select("doc_id", "verdict").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(v == Map(10L -> "new", 11L -> "new",
      12L -> "dup_vs_store", 13L -> "near_dup_vs_store"))
    // the base files were NOT rewritten — only tombstones were added
    val rawHashes = spark.read.parquet(s"$dir/hashes")
    assert(rawHashes.count() == 2)
  }

  test("compact folds tombstones in and drops them; verdicts unchanged") {
    val dir = tmpDir()
    DedupStore.write(docs(
      1L -> "alpha beta gamma", 2L -> "delta epsilon zeta",
      3L -> "eta theta iota"), dir)
    DedupStore.purge(Seq(1L, 3L).toDF("doc_id"), dir)
    val before = DedupStore.ingest(DedupStore.load(spark, dir), docs(
      10L -> "alpha beta gamma", 11L -> "delta epsilon zeta"))
      .select("doc_id", "verdict").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    DedupStore.compact(spark, dir)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "tombstones")))
    // base tables now PHYSICALLY hold only the survivor
    assert(spark.read.parquet(s"$dir/hashes").count() == 1)
    assert(spark.read.parquet(s"$dir/simhashes").count() == 1)
    val after = DedupStore.ingest(DedupStore.load(spark, dir), docs(
      10L -> "alpha beta gamma", 11L -> "delta epsilon zeta"))
      .select("doc_id", "verdict").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(before == after &&
      after == Map(10L -> "new", 11L -> "dup_vs_store"))
    // compact with no tombstones is a no-op
    DedupStore.compact(spark, dir)
    assert(spark.read.parquet(s"$dir/hashes").count() == 1)
  }

  test("load self-heals a crash between compact's rename-aside and rename-in") {
    val dir = tmpDir()
    DedupStore.write(docs(
      1L -> "alpha beta gamma", 2L -> "delta epsilon zeta"), dir)
    DedupStore.purge(Seq(1L).toDF("doc_id"), dir)
    // simulate the crash window compact can die in: staging fully
    // written, live renamed aside, new live NOT yet moved in
    val st = DedupStore.load(spark, dir)
    st.hashes.write.mode("overwrite").parquet(s"$dir/hashes_staging")
    val live = java.nio.file.Paths.get(dir, "hashes")
    java.nio.file.Files.move(live, java.nio.file.Paths.get(dir, "hashes_old"))
    assert(!java.nio.file.Files.exists(live))
    // load() finishes the move instead of throwing on the missing dir
    val healed = DedupStore.load(spark, dir)
    assert(java.nio.file.Files.exists(live))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "hashes_old")))
    assert(healed.hashes.select("canonical_id").as[Long].collect().toSet == Set(2L))
    // and compact completes normally from the healed state
    DedupStore.compact(spark, dir)
    assert(spark.read.parquet(s"$dir/hashes").count() == 1)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "tombstones")))
  }
}
