package graft.dedup

import graft.SparkSpec

class BigStarSpec extends SparkSpec {
  import spark.implicits._

  private def labelsOf(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    BigStar.components(pairs.toDF("id1", "id2"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chains, triangles, reversed/duplicate edges, self-loops — agrees with min-label") {
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),       // 4-chain
      (10L, 11L), (11L, 10L),             // reversed duplicate
      (20L, 21L), (21L, 22L), (22L, 20L), // triangle
      (30L, 30L),                         // self-loop only -> dropped
      (40L, 41L))
    val star = labelsOf(pairs)
    val minLabel = ConnectedComponents.components(pairs.toDF("id1", "id2"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star === minLabel)
    assert(star(4L) === 1L && star(22L) === 20L && !star.contains(30L))
  }

  test("random-ish merged components agree with min-label propagation") {
    // deterministic pseudo-random union structure: edges (i, (i*7919) % 100)
    // plus bridges — exercises merges in both directions
    val pairs = (0L until 100L).map(i => (i, (i * 7919) % 100))
      .filter { case (a, b) => a != b } ++ Seq((0L, 100L), (100L, 200L))
    val star = labelsOf(pairs)
    val minLabel = ConnectedComponents
      .components(pairs.toDF("id1", "id2"), maxIter = 200)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star === minLabel)
  }

  test("a 4096-vertex path converges in O(log n) alternations, not O(n)") {
    val path = (0L until 4095L).map(i => (i, i + 1))
    val (labels, rounds) =
      BigStar.run(path.toDF("id1", "id2"), "id1", "id2", maxIter = 50)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size === 4096 && got.values.forall(_ === 0L))
    // 12 = log2(4096); the alternation closes well inside 2*log2 + slack,
    // where min-label propagation would need ~4095 rounds
    assert(rounds <= 16, s"path took $rounds alternations")
  }

  test("maxIter below the convergence round count fails loudly, not silently") {
    // a 64-vertex path needs several alternations; maxIter=1 cannot reach
    // the star-forest fixpoint, and the read-off there would emit
    // conflicting labels — the contract is to throw instead
    val path = (0L until 63L).map(i => (i, i + 1))
    val e = intercept[IllegalStateException] {
      BigStar.run(path.toDF("id1", "id2"), "id1", "id2", maxIter = 1)
    }
    assert(e.getMessage.contains("did not converge"))
    // and the loud exit releases its checkpoints like the happy path does
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  test("no persisted state after return; result is re-actionable") {
    val labels = BigStar.components(
      Seq((5L, 6L), (6L, 7L), (9L, 8L)).toDF("id1", "id2"))
    val leaked = spark.sparkContext.getPersistentRDDs
    assert(leaked.isEmpty, s"BigStar leaked: $leaked")
    assert(labels.count() === 5)
    assert(labels.filter("label = 5").count() === 3)
  }
}
