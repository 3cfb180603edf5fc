package graft.segmentation

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** WCSS / elbow-method model selection (reference U5, codeText.txt:127-166).
  *
  * The reference sweeps k=2..11 with MLlib `KMeans(seed=1)`, recomputes WCSS
  * with an RDD map/reduce, and picks the elbow as
  * `argmin(np.diff(wcss, 2)) + 2` — that exact index arithmetic is the spec
  * (the +2 is `argmin + 1` for the diff offset, then `+ 1` at return;
  * codeText.txt:149-162).
  *
  * Our WCSS is a DataFrame aggregate over the same min-squared-distance
  * expression K-means uses ([[KMeansMR.minSqDistExpr]]) — no RDD hop, fully
  * codegen'd, one shuffle-free job per k. MLlib's `summary.trainingCost` is
  * the same quantity; [[sweep]] returns both so tests can cross-check them
  * (SURVEY §5.3).
  */
object Elbow {

  final case class SweepPoint(k: Int, wcss: Double, trainingCost: Double,
                              centroids: Array[Array[Double]])

  /** MLlib KMeans sweep over `ks` on the given input columns.
    * (reference: VectorAssembler at codeText.txt:132-133, fits at 139-141).
    *
    * The per-k fits are independent Spark jobs, so they are submitted
    * CONCURRENTLY (bounded thread pool): on a many-core local run or a real
    * cluster the scheduler interleaves their stages instead of serializing
    * ten small jobs end-to-end. The input is assembled + persisted once.
    */
  def sweep(df: DataFrame, dims: Seq[String], ks: Seq[Int], seed: Long = 1L,
            maxConcurrent: Int = 4): Seq[SweepPoint] = {
    val casted = dims.foldLeft(df)((d, c) => d.withColumn(c, col(c).cast("double")))
      .filter(dims.map(c => col(c).isNotNull).reduce(_ && _))
    val assembled = new VectorAssembler()
      .setInputCols(dims.toArray).setOutputCol("features")
      .transform(casted)
      .persist()
    assembled.count() // materialize once before the concurrent fits
    try {
      import java.util.concurrent.Executors
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      val pool = Executors.newFixedThreadPool(math.min(maxConcurrent, ks.length))
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      try {
        val futures = ks.map { k =>
          Future {
            val model = new KMeans().setK(k).setSeed(seed).fit(assembled)
            val centroids = model.clusterCenters.map(_.toArray)
            val w = KMeansMR.wcss(casted, dims, centroids)
            SweepPoint(k, w, model.summary.trainingCost, centroids)
          }
        }
        futures.map(f => Await.result(f, Duration.Inf))
      } finally pool.shutdown()
    } finally { assembled.unpersist(); () }
  }

  /** Second discrete difference: diff2(i) = w(i) - 2*w(i+1) + w(i+2)
    * (np.diff(_, 2) semantics; length = n-2).
    */
  def secondDiff(wcss: Seq[Double]): Seq[Double] =
    wcss.sliding(3).collect { case Seq(a, b, c) => a - 2 * b + c }.toSeq

  /** The reference's elbow pick, verbatim: argmin(diff2) + 2
    * (codeText.txt:149-150,162: `elbow_index = argmin + 1; return elbow_index
    * + 1`). Requires |wcss| >= 3.
    */
  def elbowK(wcss: Seq[Double]): Int = {
    val d2 = secondDiff(wcss)
    require(d2.nonEmpty, "elbowK needs at least 3 WCSS points")
    d2.indices.minBy(d2) + 2
  }

  /** Full find_k: sweep k=2..11 (reference default) and return the elbow k. */
  def findK(df: DataFrame, dims: Seq[String], ks: Seq[Int] = 2 until 12,
            seed: Long = 1L): Int =
    elbowK(sweep(df, dims, ks, seed).map(_.wcss))
}
