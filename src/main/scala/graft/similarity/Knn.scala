package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate & exact nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Two paths, same answer shape (query_id, neighbor_id, cosine, rank):
  *
  *  - [[bruteForce]]: broadcast the (small) query set against the corpus —
  *    one pass, no corpus shuffle, O(|Q|·N·d) fused multiply-adds inside
  *    codegen. The per-query top-k uses a ranking window over |Q|·N rows;
  *    fine when |Q| is modest (the shuffle is |Q|·N tiny rows). This is the
  *    exact baseline.
  *
  *  - [[ivf]]: IVF-style pruning — k-means coarse centroids over a sample,
  *    every corpus vector assigned to its nearest list (one narrow pass),
  *    queries probe only `nProbe` nearest lists. At 1000 executors the list
  *    assignment is a partition-pruning predicate: each query touches
  *    nProbe/nLists of the data. Recall < 1 by design; measured in tests.
  *
  * All vector math is built-in higher-order functions (zip_with + aggregate)
  * — no UDF, no MLlib Vector boxing on the hot path.
  */
object Knn {

  /** Σ aᵢ·bᵢ as ONE codegen'd static-kernel call ([[graft.functions.VecKernels]]).
    * (The earlier `aggregate(zip_with(...))` fold interpreted its lambda per
    * element and dominated every vector query; the kernel form is
    * bit-identical — same fold order — at JIT-loop speed.)
    */
  def dot(a: Column, b: Column): Column = graft.functions.VectorExprs.dotVec(a, b)

  def norm(a: Column): Column = graft.functions.VectorExprs.normVec(a)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  private def prepared(embeddings: DataFrame, idCol: String, vecCol: String) =
    embeddings.select(
      col(idCol).as("nn_id"),
      col(vecCol).cast("array<double>").as("nn_vec"),
      norm(col(vecCol).cast("array<double>")).as("nn_norm"))

  /** Exact top-k cosine neighbors for each query id (excluding self-match).
    * `queries` must be small enough to broadcast (it is collected-free — the
    * broadcast hint does the work).
    */
  def bruteForce(embeddings: DataFrame, queries: DataFrame, k: Int = 5,
                 idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val corpus = prepared(embeddings, idCol, vecCol)
    val q = prepared(queries, idCol, vecCol)
      .select(col("nn_id").as("query_id"), col("nn_vec").as("q_vec"), col("nn_norm").as("q_norm"))
    val scored = corpus.join(broadcast(q), col("nn_id") =!= col("query_id"))
      .withColumn("cosine", dot(col("nn_vec"), col("q_vec")) / (col("nn_norm") * col("q_norm")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("nn_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("nn_id").as("neighbor_id"), col("cosine"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Exact top-k neighbors via the bounded [[TopKAggregator]] instead of a
    * ranking window: map-side partial top-k means the shuffle carries at
    * most k rows per query per upstream partition (vs every scored row for
    * the window form). Same output contract as [[bruteForce]].
    */
  def bruteForceAgg(embeddings: DataFrame, queries: DataFrame, k: Int = 5,
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val corpus = prepared(embeddings, idCol, vecCol)
    val q = prepared(queries, idCol, vecCol)
      .select(col("nn_id").as("query_id"), col("nn_vec").as("q_vec"), col("nn_norm").as("q_norm"))
    val scored = corpus.join(broadcast(q), col("nn_id") =!= col("query_id"))
      .withColumn("cosine", dot(col("nn_vec"), col("q_vec")) / (col("nn_norm") * col("q_norm")))
    scored
      .groupBy(col("query_id"))
      .agg(TopKAggregator.topK(k)(col("nn_id"), col("cosine")).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("query_id"), col("s.id").as("neighbor_id"),
        col("s.score").as("cosine"), (col("pos") + 1).cast("int").as("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Squared L2 distance of a vector column to a constant centroid — one
    * codegen'd kernel call; the centroid ships as a plan-referenced object.
    */
  private def sqDistToCentroid(vec: Column, c: Array[Double]): Column =
    graft.functions.VectorExprs.sqDistConst(vec, c)

  /** Nearest-centroid index over a constant centroid set (first-index wins
    * ties — same contract as the segmentation K-means). All k distances are
    * fused into a single kernel loop instead of a k-branch CASE over k
    * separate folds.
    */
  def assignList(vec: Column, centroids: Array[Array[Double]]): Column =
    graft.functions.VectorExprs.argminConst(vec, centroids)

  /** Train coarse IVF centroids with the engine's own array K-means
    * ([[ArrayKMeans]]) — no MLlib Vector conversion, same dataflow shape as
    * the rest of the engine. `sampleFraction` bounds the training cost.
    */
  def trainCentroidsNative(embeddings: DataFrame, nLists: Int, seed: Long = 1L,
                           vecCol: String = "embedding", maxIter: Int = 5,
                           sampleFraction: Double = 1.0): Array[Array[Double]] = {
    val src = if (sampleFraction >= 1.0) embeddings
      else embeddings.sample(withReplacement = false, sampleFraction, seed)
    ArrayKMeans.fit(src, vecCol, nLists, maxIter, seed)
  }

  /** Train coarse centroids for IVF via MLlib k-means on a sample. */
  def trainCentroids(embeddings: DataFrame, nLists: Int, seed: Long = 1L,
                     vecCol: String = "embedding",
                     sampleFraction: Double = 1.0): Array[Array[Double]] = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val sampled = (if (sampleFraction >= 1.0) embeddings
                   else embeddings.sample(withReplacement = false, sampleFraction, seed))
      .select(array_to_vector(col(vecCol).cast("array<double>")).as("features"))
    new KMeans().setK(nLists).setSeed(seed).fit(sampled)
      .clusterCenters.map(_.toArray)
  }

  /** IVF search: probe the `nProbe` nearest lists per query. Returns the
    * same shape as [[bruteForce]]; recall measured against it in tests.
    */
  def ivf(embeddings: DataFrame, queries: DataFrame,
          centroids: Array[Array[Double]], k: Int = 5, nProbe: Int = 4,
          idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val corpus = prepared(embeddings, idCol, vecCol)
      .withColumn("list_id", assignList(col("nn_vec"), centroids))
    // per-query probe lists: nProbe nearest centroids, as an array column
    val nLists = centroids.length
    val q = prepared(queries, idCol, vecCol)
      .select(col("nn_id").as("query_id"), col("nn_vec").as("q_vec"), col("nn_norm").as("q_norm"))
      .withColumn("probe_lists",
        slice(array_sort(array((0 until nLists).map { j =>
          struct(sqDistToCentroid(col("q_vec"), centroids(j)).as("d"), lit(j).as("list"))
        }: _*)), 1, nProbe).getField("list"))
    val scored = corpus.join(broadcast(q),
        array_contains(col("probe_lists"), col("list_id")) &&
          col("nn_id") =!= col("query_id"))
      .withColumn("cosine", dot(col("nn_vec"), col("q_vec")) / (col("nn_norm") * col("q_norm")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("nn_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("nn_id").as("neighbor_id"), col("cosine"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }
}
