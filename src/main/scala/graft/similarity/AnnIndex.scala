package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistable ANN index — the production retrieval shape: BUILD ONCE
  * (train + encode + write), QUERY FOREVER (any later session loads the
  * compact artifacts and searches without touching the training path).
  * Everything in the index directory is plain parquet, so the artifacts
  * are inspectable, partition-prunable and portable across sessions and
  * clusters:
  *
  *   <dir>/codes     — (vec_id, codes array<int>, list_id int): the PQ
  *                     byte-codes (m per vector, each < k <= 256) plus the
  *                     vector's IVF coarse-list assignment. The ONLY
  *                     corpus-sized artifact — ~m bytes + one int per
  *                     vector, the few-TB shadow of a 100 TB float corpus.
  *   <dir>/codebook  — (subspace, code, centroid array<double>, sub_dim):
  *                     m·k rows, KBs — the PQ codebooks.
  *   <dir>/coarse    — (list_id, centroid array<double>): nLists rows —
  *                     the IVF coarse quantizer.
  *
  * Search composes the classic IVF+ADC+refine pipeline (Jégou et al.
  * TPAMI 2011, §V) over the LOADED artifacts: the driver picks each
  * query's `nProbe` nearest coarse lists (nLists-sized arithmetic), the
  * code scan prunes to those lists (partition-prunable predicate at
  * scale) and scores survivors by ADC lookup, and only the per-query
  * `shortlist` best code-scored rows fetch their original floats for the
  * exact cosine re-rank — so float reads touch shortlist/corpus of the
  * data and the final ranking on the shortlist is exact.
  *
  * Determinism: training uses the same first-k-by-id init as q46/q95 and
  * the seeded [[ArrayKMeans]] fit, so a rebuilt index is bit-identical —
  * a correctness gate can stage the index to disk once and replay
  * against it forever (q183's fixture pattern).
  */
object AnnIndex {

  final case class Loaded(codes: DataFrame,
                          cb: ProductQuantization.Codebook,
                          coarse: Array[Array[Double]])

  /** Train PQ codebooks + IVF coarse centroids over the corpus, encode
    * every vector, and write the three artifact tables under `dir`.
    */
  def write(embeddings: DataFrame, dir: String, m: Int = 8, k: Int = 64,
            nLists: Int = 16, maxIter: Int = 3, idCol: String = "vec_id",
            vecCol: String = "embedding"): Unit = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val cb = ProductQuantization.train(embeddings, vecCol, m, k, maxIter, idCol)
    val coarse = ArrayKMeans.fitFrom(
      ProductQuantization.normalized(embeddings, vecCol, "ann_nvec")
        .select(col("ann_nvec").as("v")),
      "v",
      ProductQuantization.normalized(embeddings, vecCol, "ann_nvec")
        .orderBy(col(idCol)).limit(nLists)
        .select(col("ann_nvec")).collect().map(_.getSeq[Double](0).toArray),
      k = nLists, maxIter = maxIter, seed = 1L)
    ProductQuantization.encode(embeddings, vecCol, cb, idCol)
      .join(ProductQuantization.normalized(embeddings, vecCol, "ann_nvec")
        .select(col(idCol), Knn.assignList(col("ann_nvec"), coarse).as("list_id")),
        Seq(idCol))
      .write.mode("overwrite").parquet(s"$dir/codes")
    val cbRows = for { j <- 0 until cb.m; c <- 0 until cb.k }
      yield (j, c, cb.centroids(j)(c).toSeq)
    cbRows.toDF("subspace", "code", "centroid")
      .withColumn("sub_dim", lit(cb.subDim))
      .write.mode("overwrite").parquet(s"$dir/codebook")
    coarse.zipWithIndex.map { case (cent, i) => (i, cent.toSeq) }.toSeq
      .toDF("list_id", "centroid")
      .write.mode("overwrite").parquet(s"$dir/coarse")
    // training-time reference statistics — the drift monitor's baseline
    // (see driftAudit). Written LAST so a stats/_SUCCESS guard implies a
    // complete index. One nLists-row table; the global mean distortion
    // rides as a constant column.
    val trained = spark.read.parquet(s"$dir/codes")
    val meanDist = broadcast(
      distortion(embeddings, Loaded(trained, cb, coarse), vecCol)
        .agg(avg(col("__distortion")).as("train_mean_distortion")))
    val listCounts = trained.groupBy(col("list_id"))
      .agg(count(lit(1)).as("n_train"))
    // share via a broadcast 1-row total (not an unpartitioned window —
    // same result on the nLists-row frame, no global-window plan node)
    listCounts
      .crossJoin(broadcast(listCounts.agg(sum(col("n_train")).as("__tot"))))
      .withColumn("train_share", col("n_train") / col("__tot"))
      .drop("__tot")
      .crossJoin(meanDist)
      .write.mode("overwrite").parquet(s"$dir/stats")
  }

  /** Per-row PQ reconstruction distortion of the NORMALIZED vector:
    * Σ over subspaces of min-over-codes ‖sub_j − centroid_j_c‖² — the
    * ADC self-distortion the frozen codebooks incur on this vector.
    * One codegen'd kernel per subspace, shuffle-free.
    */
  private def distortion(embeddings: DataFrame, index: Loaded,
                         vecCol: String): DataFrame = {
    val cb = index.cb
    val normed = ProductQuantization.normalized(embeddings, vecCol, "ann_nvec")
    normed.withColumn("__distortion",
      (0 until cb.m).map { j =>
        graft.functions.VectorExprs.minDistConst(
          slice(col("ann_nvec"), j * cb.subDim + 1, cb.subDim),
          cb.centroids(j))
      }.reduce(_ + _))
  }

  /** Quantization-drift monitor — the measured retrain trigger the
    * frozen-codebook [[append]] path needs: an appended batch from a
    * distribution the codebooks never saw silently degrades recall, and
    * nothing in the lifecycle would notice until a human does. Compares
    * the batch against the TRAINING-time reference persisted by
    * [[write]] under `stats/` on two axes:
    *
    *  - coarse-assignment shares: total-variation distance between the
    *    batch's per-list assignment distribution (frozen quantizer) and
    *    the training distribution — a shifted batch crowds into lists
    *    the training data spread across;
    *  - quantization distortion: mean ADC self-distortion of the batch
    *    over the training mean — codes get uniformly worse when the
    *    subspace marginals move.
    *
    * Output is ONE row: (n_batch, tvd, distortion_ratio, share_drifted,
    * distortion_drifted, retrain) with retrain = either axis over its
    * threshold — the queryable bit a pipeline gates a full re-[[write]]
    * on, composing with [[append]] (audit the batch BEFORE appending).
    * Distributed shape: one narrow map per axis, one nLists-row join, a
    * 1-row final agg; thresholds are arguments, defaults adjudicated in
    * THREESCALE.md §15 (organic held-out batches measure tvd ≈ 0.02-0.1
    * and ratio ≈ 1.0 at three scales; a fixed-direction batch measures
    * tvd ≥ 0.9).
    *
    * Requires a `stats/` table — indexes written before round 15 must be
    * re-[[write]]ten to be auditable (stats derive from the training
    * corpus, which only write() sees).
    */
  def driftAudit(spark: SparkSession, dir: String, batch: DataFrame,
                 tauTvd: Double = 0.25, tauRho: Double = 2.0,
                 idCol: String = "vec_id",
                 vecCol: String = "embedding"): DataFrame = {
    require(java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "stats", "_SUCCESS")),
      s"no stats/ under $dir — the index predates the drift monitor; " +
        "re-run AnnIndex.write to persist training-time reference stats")
    val idx = load(spark, dir, idCol)
    val stats = spark.read.parquet(s"$dir/stats")
    val assigned = ProductQuantization.normalized(batch, vecCol, "ann_nvec")
      .select(Knn.assignList(col("ann_nvec"), idx.coarse).as("list_id"))
    val batchCounts = assigned.groupBy(col("list_id"))
      .agg(count(lit(1)).as("n_batch_list"))
    val batchShares = batchCounts
      .crossJoin(broadcast(batchCounts.agg(sum(col("n_batch_list")).as("__tot"))))
      .withColumn("batch_share", col("n_batch_list") / col("__tot"))
      .drop("__tot")
    // nLists-row outer join: lists the batch never hits (or training
    // never hit) contribute their full share to the distance
    val tvdRow = stats.select(col("list_id"), col("train_share"))
      .join(batchShares.select(col("list_id"), col("batch_share")),
        Seq("list_id"), "full_outer")
      .agg((sum(abs(coalesce(col("batch_share"), lit(0.0)) -
        coalesce(col("train_share"), lit(0.0)))) / 2).as("tvd"))
    val distRow = distortion(batch, idx, vecCol)
      .agg(avg(col("__distortion")).as("batch_mean_distortion"),
        count(lit(1)).as("n_batch"))
    val trainMean = stats.select(col("train_mean_distortion")).limit(1)
    broadcast(distRow).crossJoin(broadcast(tvdRow))
      .crossJoin(broadcast(trainMean))
      .select(col("n_batch"), col("tvd"),
        (col("batch_mean_distortion") / col("train_mean_distortion"))
          .as("distortion_ratio"))
      .withColumn("share_drifted", col("tvd") > tauTvd)
      .withColumn("distortion_drifted", col("distortion_ratio") > tauRho)
      .withColumn("retrain", col("share_drifted") || col("distortion_drifted"))
  }

  /** Incremental ingest — the [[graft.dedup.DedupStore.append]]
    * discipline applied to retrieval: encode NEW vectors with the
    * FROZEN codebooks and coarse quantizer (no retraining — the
    * codebook/coarse artifacts are immutable after [[write]]) and
    * append their (vec_id, codes, list_id) rows as new parquet files
    * under `codes/`. O(batch) work and I/O; the corpus-sized code table
    * is never rewritten, so a 100 TB index absorbs a crawl increment at
    * the increment's own cost. The price is quantization drift: vectors
    * from a distribution the codebooks never saw encode with higher
    * distortion — the q191 gate holds the recall floor after appending
    * the corpus's held-out 20%, and a production pipeline would retrain
    * (full [[write]]) when a drift monitor trips, exactly like periodic
    * [[graft.dedup.DedupStore.compact]].
    */
  def append(index: Loaded, newEmbeddings: DataFrame, dir: String,
             idCol: String = "vec_id", vecCol: String = "embedding"): Unit =
    ProductQuantization.encode(newEmbeddings, vecCol, index.cb, idCol)
      .join(ProductQuantization.normalized(newEmbeddings, vecCol, "ann_nvec")
        .select(col(idCol),
          Knn.assignList(col("ann_nvec"), index.coarse).as("list_id")),
        Seq(idCol))
      .write.mode("append").parquet(s"$dir/codes")

  /** GDPR-delete through the persisted index — the
    * [[graft.dedup.DedupStore.purge]] tombstone discipline applied to
    * retrieval: append the purged vector ids as new parquet files under
    * `tombstones/` (O(ids) work and I/O; the corpus-sized `codes/` table
    * is NEVER rewritten) and let [[load]] subtract them at read time
    * (merge-on-read). A purged vector stops appearing in
    * [[searchRefined]] results immediately after the next [[load]], and
    * the ranks below it close up — the erased document's embedding no
    * longer influences retrieval at all. [[compact]] folds the tombstone
    * set into `codes/` when the operator chooses to pay O(index) once.
    * Idempotent: re-purging an id adds a redundant tombstone row the
    * read-time anti-join absorbs. Ids are matched against the codes
    * table's `idCol` values — the caller purges VECTOR ids (there is no
    * canonical-id indirection here, unlike the dedup store). Because the
    * tombstone keys the ID (not file provenance), re-[[append]]ing a
    * purged id stays hidden until [[compact]] folds the tombstone away —
    * re-ingest under the SAME id after an erasure requires a compact
    * first (or a fresh id, which is what a re-crawled document gets).
    */
  def purge(ids: DataFrame, dir: String, idCol: String = "vec_id"): Unit =
    ids.select(col(idCol).cast("long").as("purged_id")).distinct()
      .write.mode("append").parquet(s"$dir/tombstones")

  /** Fold the tombstone set into `codes/` — many O(k) purges amortized
    * into one O(index) rewrite. Crash safety is write ORDER plus a
    * recoverable swap: the filtered staging copy is fully written first,
    * then the live dir is renamed aside (`codes_old`), staging renamed
    * in, the leftover deleted, and the tombstone set dropped LAST — at
    * every intermediate crash point a reader either sees tombstoned rows
    * + the tombstone set (anti-join removes them) or the folded table +
    * the tombstone set (anti-join is a no-op), and [[load]] self-heals
    * the one window where `codes/` is mid-rename (staging present, live
    * absent) by finishing the move.
    */
  def compact(spark: SparkSession, dir: String, idCol: String = "vec_id"): Unit = {
    val tomb = java.nio.file.Paths.get(dir, "tombstones")
    if (!java.nio.file.Files.exists(tomb.resolve("_SUCCESS"))) return
    load(spark, dir, idCol).codes // tombstone-filtered
      .write.mode("overwrite").parquet(s"$dir/codes_staging")
    swapIn(dir, "codes")
    deleteRecursively(tomb)
  }

  // atomic-swap trio shared with DedupStore/BpeStore — single-writer
  // contract and reader-race tolerance documented on graft.io.SwapDir
  private def swapIn(dir: String, name: String): Unit =
    graft.io.SwapDir.swapIn(dir, name)
  private def healSwap(dir: String, name: String): Unit =
    graft.io.SwapDir.healSwap(dir, name)
  private def deleteRecursively(p: java.nio.file.Path): Unit =
    graft.io.SwapDir.deleteRecursively(p)

  /** Reload the artifacts. The codebook/coarse collects are m·k and
    * nLists rows — KB-sized driver state, the sanctioned sketch collect.
    * If a `tombstones` set exists (see [[purge]]), the code table is
    * anti-joined against it at read time — purged vectors are invisible
    * to every downstream search without any rewrite of `codes/`.
    */
  def load(spark: SparkSession, dir: String, idCol: String = "vec_id"): Loaded = {
    healSwap(dir, "codes")
    val base = spark.read.parquet(s"$dir/codes")
    val tomb = java.nio.file.Paths.get(dir, "tombstones")
    val codes =
      if (!java.nio.file.Files.exists(tomb.resolve("_SUCCESS"))) base
      else {
        val t = spark.read.parquet(s"$dir/tombstones")
        base.join(t, base(idCol) === t("purged_id"), "left_anti")
      }
    val cbRows = spark.read.parquet(s"$dir/codebook").collect()
    require(cbRows.nonEmpty, s"empty codebook under $dir")
    val subDim = cbRows.head.getAs[Int]("sub_dim")
    val m = cbRows.map(_.getAs[Int]("subspace")).max + 1
    val k = cbRows.map(_.getAs[Int]("code")).max + 1
    val cents = Array.ofDim[Array[Double]](m, k)
    cbRows.foreach { r =>
      cents(r.getAs[Int]("subspace"))(r.getAs[Int]("code")) =
        r.getSeq[Double](r.fieldIndex("centroid")).toArray
    }
    val coarseRows = spark.read.parquet(s"$dir/coarse").collect()
    val coarse = Array.ofDim[Array[Double]](coarseRows.length)
    coarseRows.foreach { r =>
      coarse(r.getAs[Int]("list_id")) =
        r.getSeq[Double](r.fieldIndex("centroid")).toArray
    }
    Loaded(codes, ProductQuantization.Codebook(subDim, cents), coarse)
  }

  /** The `nProbe` coarse lists nearest to a normalized query — driver
    * arithmetic over the nLists-row quantizer.
    */
  private def probeLists(q: Array[Double], coarse: Array[Array[Double]],
                         nProbe: Int): Seq[Int] =
    coarse.zipWithIndex.map { case (c, i) =>
      var d2 = 0d; var j = 0
      while (j < c.length) { val t = q(j) - c(j); d2 += t * t; j += 1 }
      (d2, i)
    }.sortBy(p => (p._1, p._2)).take(nProbe).map(_._2).toSeq

  /** IVF-pruned ADC shortlist + exact cosine re-rank over a loaded index:
    * (query_id, neighbor_id, cosine, rank), rank 1 = best — the
    * [[Knn.bruteForce]] contract restricted to the probed shortlist.
    * `embeddings` supplies the original floats for the refine fetch only.
    */
  def searchRefined(index: Loaded, embeddings: DataFrame,
                    queries: Seq[(Long, Array[Double])], k: Int,
                    nProbe: Int = 8, shortlist: Int = 50,
                    idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame = {
    require(queries.nonEmpty, "no queries")
    val spark = index.codes.sparkSession
    import spark.implicits._
    val cb = index.cb
    // per-query ADC score rides an array entry that is NULL outside the
    // query's probed lists — the filter prunes it before the explode, so
    // un-probed rows contribute nothing downstream
    val scored = index.codes.select(col(idCol), explode(filter(array(queries.map {
      case (qid, qvec) =>
        val probes = probeLists(qvec, index.coarse, nProbe)
        val flat = ProductQuantization.lookupTable(qvec, cb)
        val adist = (0 until cb.m).map { j =>
          element_at(typedLit(flat.slice(j * cb.k, (j + 1) * cb.k)),
            col("codes").getItem(j) + 1)
        }.reduce(_ + _)
        when(col("list_id").isin(probes: _*),
          struct(lit(qid).as("query_id"), adist.as("adist")))
    }: _*), x => x.isNotNull)).as("q"))
      .select(col(idCol), col("q.query_id"), col("q.adist"))
      .filter(col(idCol) =!= col("query_id"))
    val cands = scored
      .groupBy(col("query_id"))
      // negate: TopKAggregator keeps the LARGEST scores; nearest = smallest
      .agg(TopKAggregator.topK(shortlist)(col(idCol), -col("adist")).as("top"))
      .select(col("query_id"), explode(col("top")).as("s"))
      .select(col("query_id"), col("s.id").as("neighbor_id"))
    val qDf = broadcast(queries.toDF("query_id", "q_vec"))
    val normed = ProductQuantization.normalized(embeddings, vecCol, "ann_nvec")
      .select(col(idCol).as("neighbor_id"), col("ann_nvec"))
    cands
      .join(normed, Seq("neighbor_id"))
      .join(qDf, Seq("query_id"))
      // unit vectors on both sides: cosine = dot
      .withColumn("cosine", Knn.dot(col("ann_nvec"), col("q_vec")))
      .groupBy(col("query_id"))
      .agg(TopKAggregator.topK(k)(col("neighbor_id"), col("cosine")).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("query_id"), col("s.id").as("neighbor_id"),
        col("s.score").as("cosine"), (col("pos") + 1).cast("int").as("rank"))
      .orderBy(col("query_id"), col("rank"))
  }
}
