package graft.similarity

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {
  import spark.implicits._

  test("normalized produces unit vectors; zero vectors pass through") {
    val df = Seq((1L, Array(3f, 4f)), (2L, Array(0f, 0f)))
      .toDF("vec_id", "embedding")
    val got = ProductQuantization.normalized(df, "embedding", "nvec")
      .orderBy($"vec_id").select($"nvec").as[Array[Double]].collect()
    assert(math.abs(got(0).map(x => x * x).sum - 1.0) < 1e-12)
    assert(got(1).toSeq === Seq(0d, 0d))
  }

  test("codes are m-wide and every code is inside [0, k)") {
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    val cb = ProductQuantization.train(emb, "embedding", m = 8, k = 16, maxIter = 2)
    assert(cb.m === 8 && cb.subDim === 8)
    val codes = ProductQuantization.encode(emb, "embedding", cb)
    val stats = codes.select(
        min(size($"codes")).as("lo"), max(size($"codes")).as("hi"),
        min(array_min($"codes")).as("clo"), max(array_max($"codes")).as("chi"))
      .as[(Int, Int, Int, Int)].collect()(0)
    assert(stats._1 === 8 && stats._2 === 8)
    assert(stats._3 >= 0 && stats._4 < 16)
  }

  test("lookupTable matches a driver-side model and ADC scores are exact LUT sums") {
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    val cb = ProductQuantization.train(emb, "embedding", m = 4, k = 8, maxIter = 2)
    val q = ProductQuantization.normalized(emb.filter($"vec_id" === 1), "embedding", "nvec")
      .select($"nvec").as[Array[Double]].collect()(0)
    val flat = ProductQuantization.lookupTable(q, cb)
    assert(flat.length === cb.m * cb.k)
    // spot-check one entry against the direct distance
    val d0 = q.slice(0, cb.subDim).zip(cb.centroids(0)(3))
      .map { case (a, b) => (a - b) * (a - b) }.sum
    assert(math.abs(flat(3) - d0) < 1e-12)
    // an engine-side adist must equal the driver-side LUT sum over that row's codes
    val codes = ProductQuantization.encode(emb, "embedding", cb)
    val row = codes.filter($"vec_id" === 7)
      .select($"codes").as[Array[Int]].collect()(0)
    val expect = row.zipWithIndex.map { case (c, j) => flat(j * cb.k + c) }.sum
    val got = ProductQuantization.search(codes, Seq((1L, q)), cb, k = Int.MaxValue >> 1)
      .filter($"neighbor_id" === 7).select($"adist").as[Double].collect()(0)
    assert(math.abs(got - expect) < 1e-12)
  }

  test("searchRefined excludes self, ranks by non-increasing cosine, is deterministic") {
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    val cb = ProductQuantization.train(emb, "embedding", m = 8, k = 16, maxIter = 2)
    val codes = ProductQuantization.encode(emb, "embedding", cb)
    val queries = ProductQuantization.normalized(emb.filter($"vec_id" < 3), "embedding", "nvec")
      .orderBy($"vec_id").select($"vec_id", $"nvec").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toSeq
    def run() = ProductQuantization
      .searchRefined(codes, emb, queries, cb, k = 5, shortlist = 20)
      .select($"query_id", $"neighbor_id", $"cosine", $"rank")
      .as[(Long, Long, Double, Int)].collect().toSeq
    val got = run()
    assert(got === run()) // deterministic end to end
    assert(got.forall { case (q, n, _, _) => q != n })
    got.groupBy(_._1).values.foreach { rows =>
      val sorted = rows.sortBy(_._4)
      assert(sorted.map(_._3) === sorted.map(_._3).sorted.reverse)
    }
  }

  test("q95 operating point holds the 6/10 recall floor at sf0.01") {
    val emb = Tables.embeddings(spark, sf("sf0.01"))
    val cb = ProductQuantization.train(emb, "embedding", m = 8, k = 64, maxIter = 3)
    val codes = ProductQuantization.encode(emb, "embedding", cb)
    val queries = ProductQuantization.normalized(emb.filter($"vec_id" < 5), "embedding", "nvec")
      .orderBy($"vec_id").select($"vec_id", $"nvec").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toSeq
    val approx = ProductQuantization
      .searchRefined(codes, emb, queries, cb, k = 10, shortlist = 150)
      .select($"query_id", $"neighbor_id")
    val exact = Knn.bruteForce(emb, emb.filter($"vec_id" < 5), k = 10)
      .select($"query_id", $"neighbor_id")
    val hits = approx.join(exact, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy($"query_id").count().as[(Long, Long)].collect().toMap
    assert(hits.size === 5)
    hits.foreach { case (q, n) => assert(n >= 6, s"query $q recall $n/10") }
  }
}
