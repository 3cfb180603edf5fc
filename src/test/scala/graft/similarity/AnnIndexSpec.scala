package graft.similarity

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The persistable index: the disk round-trip must reproduce the trained
  * model bit-for-bit, and the loaded IVF+ADC+refine search must hold the
  * q95-style recall floor against brute force.
  */
class AnnIndexSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft_ann_spec_").toString

  test("write/load round-trips the codebook, coarse lists and codes exactly") {
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    val dir = freshDir()
    AnnIndex.write(emb, dir, m = 4, k = 8, nLists = 4, maxIter = 2)
    val idx = AnnIndex.load(spark, dir)
    // the rebuilt model equals a fresh deterministic train run
    val cb = ProductQuantization.train(emb, "embedding", m = 4, k = 8, maxIter = 2)
    assert(idx.cb.subDim === cb.subDim)
    for (j <- 0 until cb.m; c <- 0 until cb.k)
      assert(idx.cb.centroids(j)(c).toSeq === cb.centroids(j)(c).toSeq,
        s"codebook mismatch at subspace $j code $c")
    assert(idx.coarse.length === 4)
    // one codes row per corpus vector, every list assignment in range
    assert(idx.codes.count() === emb.count())
    val lists = idx.codes.select(min($"list_id"), max($"list_id"))
      .as[(Int, Int)].collect()(0)
    assert(lists._1 >= 0 && lists._2 < 4)
  }

  test("loaded-index search holds the recall floor vs brute force") {
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    val dir = freshDir()
    AnnIndex.write(emb, dir, m = 8, k = 64, nLists = 16, maxIter = 3)
    val idx = AnnIndex.load(spark, dir)
    val queries = ProductQuantization
      .normalized(emb.filter($"vec_id" < 5), "embedding", "nvec")
      .orderBy($"vec_id").select($"vec_id", $"nvec").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toSeq
    val approx = AnnIndex
      .searchRefined(idx, emb, queries, k = 10, nProbe = 8, shortlist = 150)
      .select($"query_id", $"neighbor_id")
    val exact = Knn.bruteForce(emb, emb.filter($"vec_id" < 5), k = 10)
      .select($"query_id", $"neighbor_id")
    val hits = approx.join(exact, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy($"query_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(queries.map(_._1).forall(q => hits.getOrElse(q, 0L) >= 6L),
      s"recall floor broken: $hits")
    info(s"per-query top-10 hits at sf0.001: $hits")
  }

  test("append encodes with the frozen codebook; grown index holds recall") {
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    val dir = freshDir()
    val base = emb.filter($"vec_id" % 5 =!= 4)
    val rest = emb.filter($"vec_id" % 5 === 4)
    AnnIndex.write(base, dir, m = 8, k = 64, nLists = 16, maxIter = 3)
    val before = AnnIndex.load(spark, dir)
    val nBase = before.codes.count()
    AnnIndex.append(before, rest, dir)
    val grown = AnnIndex.load(spark, dir)
    // the code table grew by exactly the batch; model artifacts FROZEN
    assert(grown.codes.count() === emb.count())
    assert(nBase === base.count())
    for (j <- 0 until before.cb.m; c <- 0 until before.cb.k)
      assert(grown.cb.centroids(j)(c).toSeq === before.cb.centroids(j)(c).toSeq)
    // appended codes equal a fresh encode under the same frozen codebook
    val fresh = ProductQuantization.encode(rest, "embedding", before.cb)
      .select($"vec_id", $"codes").as[(Long, Seq[Int])].collect().toMap
    val stored = grown.codes.join(rest.select("vec_id"), Seq("vec_id"), "left_semi")
      .select($"vec_id", $"codes").as[(Long, Seq[Int])].collect().toMap
    assert(stored === fresh)
    // appended vectors are REACHABLE: searching the grown index with an
    // appended vector as the query must return it... it's excluded as
    // self; instead: full-corpus recall floor through the grown index
    val queries = ProductQuantization
      .normalized(emb.filter($"vec_id" < 5), "embedding", "nvec")
      .orderBy($"vec_id").select($"vec_id", $"nvec").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toSeq
    val approx = AnnIndex
      .searchRefined(grown, emb, queries, k = 10, nProbe = 8, shortlist = 150)
      .select($"query_id", $"neighbor_id")
    val exact = Knn.bruteForce(emb, emb.filter($"vec_id" < 5), k = 10)
      .select($"query_id", $"neighbor_id")
    val hits = approx.join(exact, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy($"query_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(queries.map(_._1).forall(q => hits.getOrElse(q, 0L) >= 6L),
      s"post-append recall floor broken: $hits")
    info(s"post-append per-query top-10 hits: $hits")
  }

  test("purge tombstones hide vectors at load; compact folds them in") {
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    val dir = freshDir()
    AnnIndex.write(emb, dir, m = 4, k = 8, nLists = 4, maxIter = 2)
    val n = emb.count()
    // purge two organic vectors through the O(ids) tombstone append
    AnnIndex.purge(Seq(7L, 11L).toDF("vec_id"), dir)
    val purgedView = AnnIndex.load(spark, dir)
    assert(purgedView.codes.count() === n - 2)
    assert(purgedView.codes.filter($"vec_id".isin(7L, 11L)).count() === 0)
    // codes/ itself was NOT rewritten — the raw table still has all rows
    assert(spark.read.parquet(s"$dir/codes").count() === n)
    // re-purging an id is an absorbed no-op (idempotence)
    AnnIndex.purge(Seq(7L).toDF("vec_id"), dir)
    assert(AnnIndex.load(spark, dir).codes.count() === n - 2)
    // purged vectors never surface in search (they were id<20, likely
    // neighbors at this corpus size — assert the anti-join property)
    val queries = ProductQuantization
      .normalized(emb.filter($"vec_id" < 3), "embedding", "nvec")
      .orderBy($"vec_id").select($"vec_id", $"nvec").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toSeq
    val res = AnnIndex.searchRefined(AnnIndex.load(spark, dir), emb, queries,
      k = 10, nProbe = 4, shortlist = 100)
    assert(res.filter($"neighbor_id".isin(7L, 11L)).count() === 0)
    // compact: tombstones folded, same visible state, tombstone set gone
    AnnIndex.compact(spark, dir)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "tombstones")))
    val folded = AnnIndex.load(spark, dir)
    assert(folded.codes.count() === n - 2)
    assert(spark.read.parquet(s"$dir/codes").count() === n - 2)
    // compact with no tombstones is a no-op
    AnnIndex.compact(spark, dir)
    assert(AnnIndex.load(spark, dir).codes.count() === n - 2)
  }

  test("full lifecycle: append, purge an appended vector, compact, append again") {
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    val dir = freshDir()
    val base = emb.filter($"vec_id" % 5 =!= 4)
    val rest = emb.filter($"vec_id" % 5 === 4)
    AnnIndex.write(base, dir, m = 4, k = 8, nLists = 4, maxIter = 2)
    AnnIndex.append(AnnIndex.load(spark, dir), rest.filter($"vec_id" < 100), dir)
    // purge one ORIGINAL and one APPENDED vector — tombstones are
    // layout-blind (they key vec_id, not file provenance)
    val appendedId = rest.filter($"vec_id" < 100)
      .orderBy($"vec_id").select($"vec_id").as[Long].head()
    AnnIndex.purge(Seq(0L, appendedId).toDF("vec_id"), dir)
    val n1 = AnnIndex.load(spark, dir).codes.count()
    AnnIndex.compact(spark, dir)
    assert(AnnIndex.load(spark, dir).codes.count() === n1)
    // append AFTER compact: the frozen codebooks survive the fold and
    // new files land beside the compacted table
    AnnIndex.append(AnnIndex.load(spark, dir), rest.filter($"vec_id" >= 100), dir)
    val finalIdx = AnnIndex.load(spark, dir)
    assert(finalIdx.codes.count() ===
      n1 + rest.filter($"vec_id" >= 100).count())
    assert(finalIdx.codes.filter($"vec_id".isin(0L, appendedId)).count() === 0)
    // a purged-then-reingested vector is live again (erasure is of the
    // record, not a permanent id ban — matches DedupStore re-ingest)
    AnnIndex.append(finalIdx, emb.filter($"vec_id" === 0L), dir)
    assert(AnnIndex.load(spark, dir).codes.filter($"vec_id" === 0L).count() === 1)
  }

  test("load self-heals a crash between compact's rename-aside and rename-in") {
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    val dir = freshDir()
    AnnIndex.write(emb, dir, m = 4, k = 8, nLists = 4, maxIter = 2)
    val n = emb.count()
    AnnIndex.purge(Seq(3L).toDF("vec_id"), dir)
    // simulate the crash window: staging fully written, live renamed
    // aside, new live NOT yet moved in
    AnnIndex.load(spark, dir).codes
      .write.mode("overwrite").parquet(s"$dir/codes_staging")
    val live = java.nio.file.Paths.get(dir, "codes")
    java.nio.file.Files.move(live, java.nio.file.Paths.get(dir, "codes_old"))
    assert(!java.nio.file.Files.exists(live))
    // load finishes the move (and the tombstone anti-join stays a no-op
    // on the already-filtered staging content)
    val healed = AnnIndex.load(spark, dir)
    assert(java.nio.file.Files.exists(live))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "codes_old")))
    assert(healed.codes.count() === n - 1)
  }

  test("driftAudit: organic held-out batch passes, fixed-direction batch trips") {
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    val dir = freshDir()
    AnnIndex.write(emb.filter($"vec_id" % 5 =!= 4), dir,
      m = 8, k = 64, nLists = 16, maxIter = 3)
    // stats persisted by write(): one row per non-empty list, shares sum
    // to 1, a positive global training distortion
    val stats = spark.read.parquet(s"$dir/stats")
    assert(math.abs(stats.agg(sum($"train_share")).as[Double].head() - 1.0) < 1e-9)
    assert(stats.select(min($"train_mean_distortion")).as[Double].head() > 0)
    val heldOut = emb.filter($"vec_id" % 5 === 4)
    val control = AnnIndex.driftAudit(spark, dir, heldOut).collect()(0)
    assert(!control.getAs[Boolean]("retrain"),
      s"organic held-out batch tripped the monitor: $control")
    assert(control.getAs[Double]("tvd") >= 0 && control.getAs[Double]("tvd") <= 1)
    // every coordinate 1.0 -> after normalization one identical unit
    // vector -> a single coarse list holds the whole batch -> tvd is
    // 1 - that list's training share, provably past the threshold
    val shifted = heldOut.withColumn("embedding",
      expr("transform(embedding, x -> CAST(1.0 AS DOUBLE))"))
    val drifted = AnnIndex.driftAudit(spark, dir, shifted).collect()(0)
    assert(drifted.getAs[Boolean]("share_drifted") &&
      drifted.getAs[Boolean]("retrain"),
      s"fixed-direction batch did not trip the monitor: $drifted")
    assert(drifted.getAs[Double]("tvd") > 0.5)
    // an index written before round 15 (no stats/) must fail fast
    val bare = freshDir()
    AnnIndex.write(emb, bare, m = 4, k = 8, nLists = 4, maxIter = 1)
    graft.io.SwapDir.deleteRecursively(java.nio.file.Paths.get(bare, "stats"))
    val e = intercept[IllegalArgumentException] {
      AnnIndex.driftAudit(spark, bare, heldOut)
    }
    assert(e.getMessage.contains("stats"))
  }
}
