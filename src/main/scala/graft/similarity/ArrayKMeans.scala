package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Lloyd's K-means over an `array<double>` embedding column — the engine's
  * own d-dimensional K-means (the segmentation module's column-wise form
  * covers low-d; this covers vector columns without MLlib's Vector boxing).
  *
  * Per-iteration dataflow, all built-ins:
  *   assign (codegen'd argmin over constant centroids, [[Knn.assignList]])
  *   → posexplode the vector → groupBy (list, dim) partial-sum
  *   → k·d tiny rows to the driver → next centroids.
  * The shuffle payload is k·d rows per partition independent of corpus size
  * (same partial-agg shape as the 2-D K-means), so the update step scales
  * like an aggregation, not like the data.
  */
object ArrayKMeans {

  /** Seeded init: k distinct vectors via seeded random top-m + driver-side
    * dedup of the m-row sample. `orderBy(rand).limit(m)` plans as
    * TakeOrderedAndProject — map-side top-m per partition, m rows collected,
    * NO full-corpus shuffle (the previous form ran dropDuplicates keyed by the
    * whole 64-double vector across the corpus just to pick k seeds — a giant
    * exchange at 100 TB). If the sample holds < k distinct vectors the sample
    * width escalates ×16; a short sample (< m rows returned) means the corpus
    * itself is exhausted and whatever is distinct is all there is.
    */
  def sampleInit(df: DataFrame, vecCol: String, k: Int, seed: Long): Array[Array[Double]] = {
    val vecs = df.select(col(vecCol).cast("array<double>").as("v"))
      .where(col("v").isNotNull)
    var m = math.max(4 * k, 64)
    while (true) {
      val rows = vecs.orderBy(rand(seed)).limit(m).collect()
        .map(_.getSeq[Double](0).toVector)
      val distinct = rows.distinct
      if (distinct.length >= k || rows.length < m)
        return distinct.take(k).map(_.toArray).toArray
      m *= 16
    }
    throw new IllegalStateException("unreachable")
  }

  def fit(df: DataFrame, vecCol: String, k: Int, maxIter: Int = 10,
          seed: Long = 1L, tol: Double = 1e-6): Array[Array[Double]] =
    fitFrom(df, vecCol, null, k, maxIter, seed, tol)

  /** Lloyd's from an EXPLICIT initial centroid set (deterministic path — an
    * SQL oracle can replay it; `fit` falls back to the seeded sample init
    * when `init` is null).
    */
  def fitFrom(df: DataFrame, vecCol: String, init: Array[Array[Double]],
              k: Int = 0, maxIter: Int = 10, seed: Long = 1L,
              tol: Double = 1e-6): Array[Array[Double]] = {
    val vecs = df.select(col(vecCol).cast("array<double>").as("v"))
      .where(col("v").isNotNull)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      var centroids = if (init != null) init else sampleInit(vecs, "v", k, seed)
      val d = centroids.head.length
      var iter = 0
      var done = false
      while (iter < maxIter && !done) {
        val agg = vecs
          .withColumn("list_id", Knn.assignList(col("v"), centroids))
          .select(col("list_id"), posexplode(col("v")).as(Seq("dim", "x")))
          .groupBy(col("list_id"), col("dim"))
          .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
          .collect()
        val sums = Array.fill(centroids.length)(new Array[Double](d))
        val counts = new Array[Long](centroids.length)
        agg.foreach { r =>
          val l = r.getInt(0); val dim = r.getInt(1)
          sums(l)(dim) = r.getDouble(2)
          counts(l) = r.getLong(3)
        }
        val updated = sums.indices.filter(counts(_) > 0)
          .map(l => sums(l).map(_ / counts(l)))
          .toArray
        done = updated.length == centroids.length &&
          centroids.zip(updated).forall { case (a, b) =>
            a.zip(b).forall { case (x, y) => math.abs(x - y) <= tol }
          }
        centroids = updated
        iter += 1
      }
      centroids
    } finally { vecs.unpersist(); () }
  }
}
