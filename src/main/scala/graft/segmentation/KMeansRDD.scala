package graft.segmentation

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** The reference's K-means in its literal MapReduce shape (SURVEY §2.7
  * R1-R8): RDD map → map → map → reduceByKey → collect per iteration
  * (reference: codeText.txt:79-109).
  *
  * [[KMeansMR.fit]] is the engine's primary implementation (DataFrame
  * expressions, whole-stage codegen, AQE); this RDD form exists to prove the
  * paradigm-level capability and as the semantics cross-check — both must
  * converge to identical centroids from the same init. Idiomatic deltas from
  * the reference, with identical observable output:
  *  - centroids ship via `SparkContext.broadcast`, not task-closure capture
  *    (codeText.txt:91 re-serializes the list into every task);
  *  - the points RDD is persisted instead of recomputing the full lineage
  *    every iteration (SURVEY §3 Q2 step 5);
  *  - `zipWithIndex` is omitted — the reference computes and then discards
  *    the index (codeText.txt:83, dropped at :97); SURVEY §2.7 R2 sanctions
  *    the omission.
  */
object KMeansRDD {

  def fit(df: DataFrame, dims: Seq[String], init: Array[Array[Double]],
          maxIter: Int, tol: Option[Double] = None): KMeansResult = {
    import org.apache.spark.sql.functions.col
    val sc = df.sparkSession.sparkContext
    // R1: deschematize to dense points (codeText.txt:81)
    val points = df
      .select(dims.map(c => col(c).cast("double")): _*)
      .na.drop()
      .rdd.map(r => Array.tabulate(dims.length)(r.getDouble))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      var centroids = init
      var iter = 0
      var converged = false
      while (iter < maxIter && !converged) {
        val bc = sc.broadcast(centroids)
        val updated = points
          // R3+R4+R5 fused: assign cluster, emit (cluster, (point, 1))
          .map(p => (Distance.assign(p, bc.value), (p, 1L)))
          // R6: per-cluster vector sum + count with map-side combine
          .reduceByKey { (a: (Array[Double], Long), b: (Array[Double], Long)) =>
            val ((s1, c1), (s2, c2)) = (a, b)
            val s = new Array[Double](s1.length)
            var i = 0
            while (i < s.length) { s(i) = s1(i) + s2(i); i += 1 }
            (s, c1 + c2)
          }
          // R7: mean; empty clusters are simply absent (k shrinks)
          .mapValues { case (s, c) => s.map(_ / c) }
          .collect()
          .sortBy(_._1)
          .map(_._2)
        bc.destroy()
        iter += 1
        // R8/U1: exact-equality convergence (codeText.txt:46-49,106)
        converged = tol match {
          case None      => Distance.clustersSame(centroids, updated)
          case Some(eps) => Distance.clustersWithin(centroids, updated, eps)
        }
        if (!converged) centroids = updated
      }
      KMeansResult(centroids, iter, converged)
    } finally { points.unpersist(); () }
  }
}
