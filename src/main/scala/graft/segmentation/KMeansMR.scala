package graft.segmentation

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Result of a Lloyd's run: final centroids (sorted by surviving cluster
  * index), iterations executed, and whether exact convergence was reached.
  */
final case class KMeansResult(
    centroids: Array[Array[Double]],
    iterations: Int,
    converged: Boolean)

/** Distributed Lloyd's K-means with the reference's MapReduce semantics
  * (reference: codeText.txt:79-109), re-expressed Spark-first.
  *
  * Where the reference drops to opaque RDD closures (map → map → map →
  * reduceByKey → collect per iteration, re-reading its source every pass),
  * this implementation stays in the DataFrame layer end-to-end:
  *
  *  - Centroids are driver-side literals folded into Catalyst expressions, so
  *    the assignment step is pure whole-stage-codegen arithmetic — no closure
  *    serialization, no UDF, no codegen fence (SURVEY §4: the reference
  *    forfeits Tungsten codegen; we regain it).
  *  - The update step is `groupBy(cluster).agg(count, sum per dim)`: Spark
  *    plans a partial HashAggregate before the exchange (the moral equivalent
  *    of `reduceByKey`'s map-side combine), so the per-iteration shuffle
  *    carries only k rows per upstream partition — ~k×P tiny rows regardless
  *    of input size. This is the shape that survives a 100 TB scale-up.
  *  - The projected points are persisted once (MEMORY_AND_DISK) instead of
  *    recomputing the full source lineage every iteration (deviation from the
  *    reference noted in SURVEY §4 "Caching"; observable output identical).
  *
  * Preserved reference semantics: argmin assignment with strict-`<`
  * lowest-index tie-break (codeText.txt:61-72), EXACT-equality convergence
  * (codeText.txt:46-49), and empty-cluster drop — a cluster that attracts no
  * points vanishes and k shrinks (codeText.txt:103; SURVEY §7.4.2).
  */
object KMeansMR {

  /** Squared-L2 distance from the given dimension columns to a constant
    * centroid, as a foldable expression tree. Truncates to min(dims, |c|)
    * like the reference's `zip` (codeText.txt:66).
    */
  def sqDistExpr(dims: Seq[Column], c: Array[Double]): Column =
    dims.zip(c).map { case (p, ci) => (p - lit(ci)) * (p - lit(ci)) }
      .reduceOption(_ + _)
      .getOrElse(lit(0.0))

  /** Argmin-over-centroids as a chained CASE WHEN with first-index-wins
    * tie-break: cluster j is chosen iff d_j <= min(d_{j+1..k-1}) and no
    * earlier branch fired — which selects the lowest index among the global
    * minima, exactly the reference's strict-`<` loop (codeText.txt:61-72).
    */
  def assignExpr(dims: Seq[Column], centroids: Array[Array[Double]]): Column = {
    require(centroids.nonEmpty, "assignExpr needs at least one centroid")
    if (centroids.length == 1) lit(0)
    else {
      val d = centroids.map(c => sqDistExpr(dims, c))
      val n = d.length
      (0 until n - 1).foldRight(lit(n - 1): Column) { (j, elseB) =>
        val rest = (j + 1 until n).map(d)
        val minRest = if (rest.length == 1) rest.head else least(rest: _*)
        when(d(j) <= minRest, lit(j)).otherwise(elseB)
      }
    }
  }

  /** Distance to the nearest centroid, squared — `least` over the per-centroid
    * squared distances (used by WCSS, codeText.txt:144-145).
    */
  def minSqDistExpr(dims: Seq[Column], centroids: Array[Array[Double]]): Column = {
    val d = centroids.map(c => sqDistExpr(dims, c))
    if (d.length == 1) d.head else least(d.toIndexedSeq: _*)
  }

  private def doubleDims(dims: Seq[String]): Seq[Column] =
    dims.map(c => col(c).cast("double"))

  /** Adds a `cluster` column with the nearest-centroid index. Null-safe: rows
    * with a null in any dimension are excluded (the reference would have
    * crashed on them inside numpy; our contract filters them up front).
    */
  def assignClusters(df: DataFrame, dims: Seq[String],
                     centroids: Array[Array[Double]],
                     clusterCol: String = "cluster"): DataFrame = {
    val pts = doubleDims(dims)
    df.filter(pts.map(_.isNotNull).reduce(_ && _))
      .withColumn(clusterCol, assignExpr(pts, centroids))
  }

  /** One Lloyd's update: per-cluster mean of assigned points. Returns
    * (clusterIdx, centroid) sorted by cluster index; empty clusters are
    * simply absent (reference R7 drop semantics, codeText.txt:103).
    */
  def updateStep(points: DataFrame, dims: Seq[String],
                 centroids: Array[Array[Double]]): Array[(Int, Array[Double])] = {
    val pts = doubleDims(dims)
    val aggs = count(lit(1)).as("cnt") +:
      dims.indices.map(i => sum(pts(i)).as(s"s$i"))
    points
      .groupBy(assignExpr(pts, centroids).as("cluster"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
      .map { r =>
        val cnt = r.getLong(1).toDouble
        val mean = dims.indices.map(i => r.getDouble(2 + i) / cnt).toArray
        (r.getInt(0), mean)
      }
      .sortBy(_._1)
  }

  /** Full Lloyd's loop (reference U4, codeText.txt:79-109).
    *
    * @param tol  None → exact-equality convergence (the reference contract);
    *             Some(eps) → element-wise tolerance (extension knob).
    */
  def fit(df: DataFrame, dims: Seq[String], init: Array[Array[Double]],
          maxIter: Int, tol: Option[Double] = None): KMeansResult = {
    val pts = doubleDims(dims)
    val points = df
      .select(dims.indices.map(i => pts(i).as(s"p$i")): _*)
      .filter(dims.indices.map(i => col(s"p$i").isNotNull).reduce(_ && _))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      var centroids = init
      var iter = 0
      var converged = false
      val pCols = dims.indices.map(i => col(s"p$i"))
      while (iter < maxIter && !converged) {
        val aggs = count(lit(1)).as("cnt") +:
          dims.indices.map(i => sum(pCols(i)).as(s"s$i"))
        val updated = points
          .groupBy(assignExpr(pCols, centroids).as("cluster"))
          .agg(aggs.head, aggs.tail: _*)
          .collect()
          .map { r =>
            val cnt = r.getLong(1).toDouble
            (r.getInt(0), dims.indices.map(i => r.getDouble(2 + i) / cnt).toArray)
          }
          .sortBy(_._1)
          .map(_._2)
        iter += 1
        converged = tol match {
          case None      => Distance.clustersSame(centroids, updated)
          case Some(eps) => Distance.clustersWithin(centroids, updated, eps)
        }
        if (!converged) centroids = updated
      }
      KMeansResult(centroids, iter, converged)
    } finally points.unpersist()
  }

  /** Convenience: random init (reference U2) then fit. */
  def fitRandomInit(df: DataFrame, dims: Seq[String], k: Int, maxIter: Int,
                    seed: Long): KMeansResult =
    fit(df, dims, Sampling.initialCentroids(df, dims, k, seed), maxIter)

  /** WCSS of a centroid set: Σ over rows of min squared distance
    * (reference A2, codeText.txt:144-145) — a single map-side-combined agg,
    * one job, O(1) rows to the driver.
    */
  def wcss(df: DataFrame, dims: Seq[String], centroids: Array[Array[Double]]): Double = {
    val pts = doubleDims(dims)
    val row = df
      .filter(pts.map(_.isNotNull).reduce(_ && _))
      .agg(sum(minSqDistExpr(pts, centroids)).as("wcss"))
      .collect()(0)
    if (row.isNullAt(0)) 0.0 else row.getDouble(0)
  }
}
