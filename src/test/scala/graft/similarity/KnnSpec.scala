package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KnnSpec extends SparkSpec {
  import spark.implicits._

  private lazy val tinyVecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),   // closest to 0
    (2L, Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(0.0f, 0.9f, 0.1f)),   // closest to 2
    (4L, Array(-1.0f, 0.0f, 0.0f))   // opposite of 0
  ).toDF("vec_id", "embedding")

  test("bruteForce: hand-checkable neighbors and cosine values") {
    val q = tinyVecs.filter($"vec_id" === 0L)
    val got = Knn.bruteForce(tinyVecs, q, k = 2)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(got.map(_._1).toSeq === Seq(1L, 2L))
    val expCos1 = 0.9 / math.sqrt(0.9 * 0.9 + 0.1 * 0.1)
    assert(math.abs(got(0)._2 - expCos1) < 1e-6) // inputs are float32

    assert(got.map(_._3).toSeq === Seq(1, 2))
  }

  test("bruteForce excludes self-matches") {
    val got = Knn.bruteForce(tinyVecs, tinyVecs, k = 4)
    assert(got.filter($"query_id" === $"neighbor_id").count() === 0)
  }

  test("ivf achieves high recall vs bruteForce on real embeddings (sf0.001)") {
    val emb = graft.Tables.embeddings(spark, sf("sf0.001")).persist()
    val queries = emb.filter($"vec_id" < 10)
    val exact = Knn.bruteForce(emb, queries, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val cents = Knn.trainCentroids(emb, nLists = 8, seed = 1L)
    val approx = Knn.ivf(emb, queries, cents, k = 5, nProbe = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"IVF recall $recall too low (${exact.size} exact, ${approx.size} approx)")
    emb.unpersist()
    ()
  }

  test("native ArrayKMeans centroids give IVF recall comparable to MLlib's") {
    val emb = graft.Tables.embeddings(spark, sf("sf0.001")).persist()
    val queries = emb.filter($"vec_id" < 10)
    val exact = Knn.bruteForce(emb, queries, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val cents = Knn.trainCentroidsNative(emb, nLists = 8, seed = 1L, maxIter = 5)
    assert(cents.length === 8)
    assert(cents.forall(_.length === 64))
    val approx = Knn.ivf(emb, queries, cents, k = 5, nProbe = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"native-centroid IVF recall $recall")
    emb.unpersist()
    ()
  }

  test("ivf probes fewer vectors than brute force") {
    val emb = graft.Tables.embeddings(spark, sf("sf0.001"))
    val cents = Knn.trainCentroids(emb, nLists = 8, seed = 1L)
    val corpus = emb.withColumn("list_id",
      Knn.assignList($"embedding".cast("array<double>"), cents))
    val sizes = corpus.groupBy("list_id").count().collect().map(_.getLong(1))
    assert(sizes.length === 8)            // all lists non-empty
    assert(sizes.sum === emb.count())     // partition of the corpus
  }

  test("bruteForceAgg (bounded top-k aggregate) equals the window-based bruteForce") {
    val emb = graft.Tables.embeddings(spark, sf("sf0.001"))
    val queries = emb.filter($"vec_id" < 10)
    val win = Knn.bruteForce(emb, queries, k = 4)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect().toSeq
    val agg = Knn.bruteForceAgg(emb, queries, k = 4)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect().toSeq
    assert(agg === win)
  }

  test("TopKAggregator keeps O(k) state with deterministic tie-breaks") {
    val items = Seq((1L, 0.5), (2L, 0.9), (3L, 0.9), (4L, 0.1), (5L, 0.7))
      .map { case (i, s) => ScoredId(i, s) }
    val a = new TopKAggregator(3)
    val full = items.foldLeft(a.zero)(a.reduce)
    assert(a.finish(full).toSeq === Seq(ScoredId(2L, 0.9), ScoredId(3L, 0.9), ScoredId(5L, 0.7)))
    // merge in any split order gives the same answer
    val (l, r) = items.splitAt(2)
    val merged = a.merge(l.foldLeft(a.zero)(a.reduce), r.foldLeft(a.zero)(a.reduce))
    assert(a.finish(merged).toSeq === a.finish(full).toSeq)
  }

  test("bruteForce is deterministic on real embeddings (sf0.001)") {
    val emb = graft.Tables.embeddings(spark, sf("sf0.001"))
    val queries = emb.filter($"vec_id" < 20)
    def run() = Knn.bruteForce(emb, queries, k = 3)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect().toSeq
    assert(run() === run())
  }
}
