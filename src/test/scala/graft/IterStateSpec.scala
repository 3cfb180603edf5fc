package graft

import org.apache.spark.sql.functions._

/** The round-8 leak gate: every iterative operator must leave the block
  * manager EMPTY the moment it returns (r7 verdict task 1). Each test runs
  * the operator, asserts `getPersistentRDDs.isEmpty` BEFORE consuming the
  * result, then consumes the result twice (the copied-out frame must stay
  * re-actionable — a released checkpoint would throw here).
  */
class IterStateSpec extends SparkSpec {
  import spark.implicits._

  private def assertNoPinnedState(where: String): Unit = {
    val leaked = spark.sparkContext.getPersistentRDDs
    assert(leaked.isEmpty, s"$where leaked persisted RDDs: $leaked")
  }

  test("checkpoint returns a usable frame and release frees its blocks") {
    val (ck, release) = IterState.checkpoint(
      spark.range(1000).toDF("id").withColumn("x", col("id") * 2))
    assert(spark.sparkContext.getPersistentRDDs.nonEmpty)
    assert(ck.agg(sum("x")).head.getLong(0) === 999000L)
    release()
    // unpersist is async (blocking = false): poll briefly
    val deadline = System.nanoTime() + 10_000_000_000L
    while (spark.sparkContext.getPersistentRDDs.nonEmpty &&
      System.nanoTime() < deadline) Thread.sleep(50)
    assertNoPinnedState("IterState.checkpoint+release")
  }

  test("copyOut survives release and repeated actions") {
    val (ck, release) = IterState.checkpoint(spark.range(100).toDF("id"))
    val out = IterState.copyOut(ck)
    release()
    assert(out.count() === 100)
    assert(out.agg(sum("id")).head.getLong(0) === 4950L)
  }

  test("copyOut stages under spark.graft.scratch.dir; purge reclaims it") {
    val scratch = java.nio.file.Files
      .createTempDirectory("graft_scratch_spec").toString
    spark.conf.set("spark.graft.scratch.dir", scratch)
    try {
      IterState.purge(spark) // drain dirs staged by earlier tests
      val out = IterState.copyOut(spark.range(10).toDF("id"))
      val stagedDirs = java.nio.file.Files.list(java.nio.file.Paths.get(scratch))
      val names = try {
        stagedDirs.map[String](_.getFileName.toString)
          .toArray(n => new Array[String](n))
      } finally stagedDirs.close()
      assert(names.length === 1 && names(0).startsWith("graft_iterstate_"),
        s"expected one staged dir under configured scratch, got ${names.toSeq}")
      assert(out.count() === 10)
      assert(IterState.purge(spark) === 1)
      val left = java.nio.file.Files.list(java.nio.file.Paths.get(scratch))
      try assert(!left.findAny().isPresent, "purge left staged dirs behind")
      finally left.close()
    } finally spark.conf.unset("spark.graft.scratch.dir")
  }

  test("ConnectedComponents.components leaves no persisted state") {
    val pairs = ((0L until 50L).map(i => (i, i + 1)) ++
      Seq((100L, 101L), (101L, 102L), (200L, 201L))).toDF("id1", "id2")
    val labels = graft.dedup.ConnectedComponents.components(pairs)
    assertNoPinnedState("ConnectedComponents.components")
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L to 50L).forall(got(_) === 0L))
    assert(got(102L) === 100L && got(201L) === 200L)
    assert(labels.count() === 56) // result is re-actionable after return
  }

  test("KCore.peelRounds leaves no persisted state") {
    // triangle core + pendant chain: k=2 peels the chain, keeps the triangle
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("a", "b")
    val trace = graft.operators.KCore.peelRounds(edges, k = 2, rounds = 4)
    assertNoPinnedState("KCore.peelRounds")
    val rows = trace.collect().map(r =>
      (r.getInt(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(rows.last === ((4, 3L, 3L, true))) // converged on the triangle
    assert(trace.count() === 4)
  }

  test("PageRank.ranksMillionths leaves no persisted state") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 1L)).toDF("s", "d")
    val ranks = graft.operators.PageRank.ranksMillionths(edges, iterations = 5)
    assertNoPinnedState("PageRank.ranksMillionths")
    val got = ranks.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size === 4)
    assert(got(4L) === 150000L) // no in-edges: damping floor
    assert(got(1L) > got(4L))
    assert(ranks.count() === 4) // re-actionable
  }

  test("KsDrift.ks leaves no persisted state") {
    val df = ((1 to 100).map(i => ("A", i.toDouble)) ++
      (1 to 100).map(i => ("B", i + 50.0))).toDF("side", "value")
    val ks = graft.operators.KsDrift.ks(df, "side", "A", "B", "value",
      centsPerBucket = 100)
    assertNoPinnedState("KsDrift.ks")
    val row = ks.head
    assert(row.getLong(0) === 100L && row.getLong(1) === 100L)
    assert(ks.count() === 1)
  }
}
