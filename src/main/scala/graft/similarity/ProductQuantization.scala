package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) for approximate nearest-neighbor search — the
  * memory-compression scale path beyond IVF probing: each d-dim vector is
  * stored as `m` small codes (one byte each for k ≤ 256), so a 100 TB
  * float-embedding corpus becomes a few TB of codes that scan at memory
  * bandwidth, while queries score against the codes via per-subspace
  * lookup tables (asymmetric distance computation, ADC) without ever
  * touching the original floats. Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011 — public method, built here from
  * the engine's own [[ArrayKMeans]] kernel.
  *
  * Cosine ordering: train/encode/search all operate on L2-NORMALIZED
  * vectors, where squared L2 distance is a monotone transform of cosine
  * (‖a−b‖² = 2 − 2·cosθ), so ADC ranking approximates cosine ranking.
  *
  * Scale shape:
  *  - training: `m` independent [[ArrayKMeans]] fits over sub-vector
  *    slices (each iteration is one k·subDim-row partial-agg shuffle); at
  *    100 TB the fits run on a sample — codebooks are k·d doubles total.
  *  - encode: one narrow projection per row (m codegen'd argmin kernels),
  *    zero shuffle; the codes column is the only thing persisted.
  *  - search: the per-query LUT (m·k doubles) is embedded in the plan as a
  *    literal — scoring is m `element_at` picks + a sum per (row, query),
  *    fully codegen, zero joins — followed by the bounded
  *    [[TopKAggregator]] (≤ k rows per query per partition shuffled). For
  *    thousands of concurrent queries the LUT literal would become a
  *    broadcast-joined LUT table instead; the per-query literal form here
  *    is the low-Q hot path.
  */
object ProductQuantization {

  /** Trained codebooks: `centroids(j)(c)` is the subDim-length centroid of
    * code `c` in subspace `j`.
    */
  final case class Codebook(subDim: Int, centroids: Array[Array[Array[Double]]]) {
    def m: Int = centroids.length
    def k: Int = centroids(0).length
  }

  /** L2-normalized copy of `vecCol` (unit vectors; zero vectors pass
    * through unchanged rather than dividing by zero). The norm is
    * materialized as its own projection so the per-element lambda divides
    * by a plain column reference, not a re-evaluated fold.
    */
  def normalized(df: DataFrame, vecCol: String, outCol: String): DataFrame =
    df.withColumn("pq_norm", Knn.norm(col(vecCol).cast("array<double>")))
      .withColumn(outCol,
        when(col("pq_norm") === 0d, col(vecCol).cast("array<double>"))
          .otherwise(transform(col(vecCol).cast("array<double>"),
            x => x / col("pq_norm"))))
      .drop("pq_norm")

  private def subVec(vecCol: Column, j: Int, subDim: Int): Column =
    slice(vecCol, j * subDim + 1, subDim)

  /** Train `m` per-subspace codebooks of `k` centroids each over the
    * normalized vectors. `init` row ids (first-k-by-id, the q46 pattern)
    * make the whole fit deterministic so a correctness gate can replay it;
    * pass `initIds = None` for seeded-sample init.
    */
  def train(df: DataFrame, vecCol: String, m: Int, k: Int, maxIter: Int = 4,
            idCol: String = "vec_id", deterministicInit: Boolean = true,
            seed: Long = 1L): Codebook = {
    val dimRow = df.select(size(col(vecCol))).limit(1).collect()
    require(dimRow.nonEmpty, "cannot train PQ on an empty corpus")
    val dim = dimRow(0).getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val subDim = dim / m
    val normed = normalized(df, vecCol, "pq_nvec")
    val initRows: Array[Array[Double]] =
      if (deterministicInit)
        normed.orderBy(col(idCol)).limit(k)
          .select(col("pq_nvec")).collect()
          .map(_.getSeq[Double](0).toArray)
      else null
    val inits: Array[Array[Array[Double]]] =
      if (initRows != null)
        (0 until m).toArray.map(j =>
          initRows.map(v => v.slice(j * subDim, (j + 1) * subDim)))
      else (0 until m).toArray.map { j =>
        ArrayKMeans.sampleInit(
          normed.select(subVec(col("pq_nvec"), j, subDim).as("sub")),
          "sub", k, seed)
      }
    // FUSED Lloyd's across all m subspaces (round-16): the per-subspace
    // ArrayKMeans loop materialized the normalized corpus once PER SUBSPACE
    // (m full scans) and ran m·maxIter separate aggregation jobs; every one
    // of those jobs reads the same rows. One pass per iteration computes
    // every subspace's assignment + per-(subspace, list, dim) partial sums
    // together — the corpus is scanned maxIter+1 times total instead of
    // m·(maxIter+1). Per-subspace semantics are IDENTICAL to the
    // independent fits: same init, same argmin assignment, same mean
    // update, same empty-cluster drop, same per-subspace tol early-stop
    // (a converged subspace's centroids freeze while the rest iterate).
    val vecs = normed.select(col("pq_nvec").as("v"))
      .where(col("v").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val cents: Array[Array[Array[Double]]] = inits.clone()
      val done = Array.fill(m)(false)
      val tol = 1e-6
      var iter = 0
      while (iter < maxIter && !done.forall(identity)) {
        val live = (0 until m).filterNot(done)
        val perSub = live.map { j =>
          struct(lit(j).as("j"),
            Knn.assignList(subVec(col("v"), j, subDim), cents(j)).as("list"),
            subVec(col("v"), j, subDim).as("sub"))
        }
        val agg = vecs.select(explode(array(perSub: _*)).as("a"))
          .select(col("a.j").as("j"), col("a.list").as("list"),
            posexplode(col("a.sub")).as(Seq("dim", "x")))
          .groupBy(col("j"), col("list"), col("dim"))
          .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
          .collect()
        val sums = scala.collection.mutable.Map.empty[(Int, Int), Array[Double]]
        val ns = scala.collection.mutable.Map.empty[(Int, Int), Long]
        agg.foreach { r =>
          val key = (r.getInt(0), r.getInt(1))
          sums.getOrElseUpdate(key, new Array[Double](subDim))(r.getInt(2)) =
            r.getDouble(3)
          ns(key) = r.getLong(4)
        }
        live.foreach { j =>
          val updated = cents(j).indices
            .filter(l => ns.getOrElse((j, l), 0L) > 0)
            .map(l => sums((j, l)).map(_ / ns((j, l))))
            .toArray
          done(j) = updated.length == cents(j).length &&
            cents(j).zip(updated).forall { case (a, b) =>
              a.zip(b).forall { case (x, y) => math.abs(x - y) <= tol }
            }
          cents(j) = updated
        }
        iter += 1
      }
      Codebook(subDim, cents)
    } finally { vecs.unpersist(); () }
  }

  /** Encode each row's normalized vector as `m` codes — a narrow,
    * shuffle-free projection (`codes` is `array<int>`; every element fits
    * a byte for k ≤ 256, the parquet sink dictionary-packs it).
    */
  def encode(df: DataFrame, vecCol: String, cb: Codebook,
             idCol: String = "vec_id"): DataFrame = {
    val normed = normalized(df, vecCol, "pq_nvec")
    normed.select(col(idCol),
      array((0 until cb.m).map { j =>
        Knn.assignList(subVec(col("pq_nvec"), j, cb.subDim), cb.centroids(j))
      }: _*).as("codes"))
  }

  /** ADC lookup table for one normalized query vector, flattened to
    * `m · k` doubles: `flat(j*k + c)` = ‖q_sub_j − centroid_j_c‖².
    */
  def lookupTable(query: Array[Double], cb: Codebook): Array[Double] = {
    val flat = new Array[Double](cb.m * cb.k)
    var j = 0
    while (j < cb.m) {
      val qSub = query.slice(j * cb.subDim, (j + 1) * cb.subDim)
      var c = 0
      while (c < cb.k) {
        val cent = cb.centroids(j)(c)
        var d2 = 0d; var i = 0
        while (i < cb.subDim) { val t = qSub(i) - cent(i); d2 += t * t; i += 1 }
        flat(j * cb.k + c) = d2
        c += 1
      }
      j += 1
    }
    flat
  }

  /** Approximate top-k per query over an encoded corpus. `queries` is the
    * collected driver-side (query_id, normalized vector) set — the same
    * k-sized-driver-state pattern as broadcast centroids; each query
    * contributes one codegen'd score expression. Self-matches are dropped
    * to mirror [[Knn.bruteForce]]'s contract.
    *
    * Output: (query_id, neighbor_id, adist, rank) — `adist` is the ADC
    * approximate squared distance, rank 1 = nearest.
    */
  /** ADC shortlist + exact re-rank (the "ADC with refinement" form, Jégou
    * et al. §V): PQ codes prune the corpus to `shortlist` candidates per
    * query, then ONLY those rows' original vectors are fetched and scored
    * with exact cosine. This is the production operating point — the code
    * scan touches compressed bytes for 100% of the corpus, the float reads
    * touch `shortlist / corpus` of it (a semi-join-pruned scan at 100 TB),
    * and the output ranking on the shortlist is exact, so recall is the
    * shortlist's hit rate rather than the raw ADC ordering's.
    *
    * Output: (query_id, neighbor_id, cosine, rank) — same contract as
    * [[Knn.bruteForce]] restricted to the shortlist.
    */
  def searchRefined(codes: DataFrame, embeddings: DataFrame,
                    queries: Seq[(Long, Array[Double])], cb: Codebook,
                    k: Int, shortlist: Int = 50,
                    idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame = {
    val spark = codes.sparkSession
    import spark.implicits._
    val cands = search(codes, queries, cb, shortlist, idCol)
      .select(col("query_id"), col("neighbor_id"))
    val qDf = broadcast(queries.toDF("query_id", "q_vec"))
    val normed = normalized(embeddings, vecCol, "pq_nvec")
      .select(col(idCol).as("neighbor_id"), col("pq_nvec"))
    cands
      .join(normed, Seq("neighbor_id"))
      .join(qDf, Seq("query_id"))
      // unit vectors on both sides: cosine = dot
      .withColumn("cosine", Knn.dot(col("pq_nvec"), col("q_vec")))
      .groupBy(col("query_id"))
      .agg(TopKAggregator.topK(k)(col("neighbor_id"), col("cosine")).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("query_id"), col("s.id").as("neighbor_id"),
        col("s.score").as("cosine"), (col("pos") + 1).cast("int").as("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  def search(codes: DataFrame, queries: Seq[(Long, Array[Double])],
             cb: Codebook, k: Int,
             idCol: String = "vec_id"): DataFrame = {
    require(queries.nonEmpty, "no queries")
    val scored = codes.select(col(idCol), explode(array(queries.map {
      case (qid, qvec) =>
        val flat = lookupTable(qvec, cb)
        val adist = (0 until cb.m).map { j =>
          element_at(typedLit(flat.slice(j * cb.k, (j + 1) * cb.k)),
            col("codes").getItem(j) + 1)
        }.reduce(_ + _)
        struct(lit(qid).as("query_id"), adist.as("adist"))
    }: _*)).as("q"))
      .select(col(idCol), col("q.query_id"), col("q.adist"))
      .filter(col(idCol) =!= col("query_id"))
    scored
      .groupBy(col("query_id"))
      // negate: TopKAggregator keeps the LARGEST scores; nearest = smallest
      .agg(TopKAggregator.topK(k)(col(idCol), -col("adist")).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("query_id"), col("s.id").as("neighbor_id"),
        (-col("s.score")).as("adist"), (col("pos") + 1).cast("int").as("rank"))
      .orderBy(col("query_id"), col("rank"))
  }
}
