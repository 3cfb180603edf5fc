package graft

import org.apache.spark.sql.functions._

/** ScaleUp is gate infrastructure — the sf1 decade of the three-scale bench
  * and the sf1 oracle run both read its output — so its invariants get their
  * own spec instead of resting on the downstream gates alone. Runs the real
  * generator at factor 3 over sf0.001 into a temp dir and checks the
  * properties the scaling evidence depends on.
  */
class ScaleUpSpec extends SparkSpec {

  private lazy val out: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_scaleup_spec")
    dir.toFile.deleteOnExit()
    ScaleUp.run(spark, sf("sf0.001"), dir.toString, factor = 3)
    dir.toString
  }
  private def src(t: String) = spark.read.parquet(s"${sf("sf0.001")}/$t.parquet")
  private def dst(t: String) = spark.read.parquet(s"$out/$t.parquet")

  test("fact tables tile by the factor; fixed dimensions are copied verbatim") {
    for (t <- Seq("customer", "supplier", "part", "orders", "lineitem",
        "events", "documents")) {
      assert(dst(t).count() === 3 * src(t).count(), t)
    }
    // embeddings grow 4x per 10x decade -> max(1, 3*4/10) = 1 copy here
    assert(dst("embeddings").count() === src("embeddings").count())
    for (t <- Seq("region", "nation")) {
      assert(dst(t).count() === src(t).count(), t)
      assert(dst(t).exceptAll(src(t)).isEmpty && src(t).exceptAll(dst(t)).isEmpty, t)
    }
  }

  test("copy 0 is the identity and keys never collide across copies") {
    val ordSrc = src("orders")
    val nOrd = ordSrc.agg(max(col("o_orderkey"))).head.getLong(0) + 1L
    val copy0 = dst("orders").filter(col("o_orderkey") < nOrd)
    assert(copy0.exceptAll(ordSrc).isEmpty && ordSrc.exceptAll(copy0).isEmpty)
    for ((t, k) <- Seq("customer" -> "c_custkey", "orders" -> "o_orderkey",
        "events" -> "event_id", "documents" -> "doc_id")) {
      val d = dst(t)
      assert(d.select(col(k)).distinct().count() === d.count(), s"$t.$k collided")
    }
  }

  test("referential integrity and per-entity fan-outs are preserved exactly") {
    // every order's customer exists, and the orders-per-customer histogram
    // is the source histogram with 3x the mass — tiling must not reshape
    // the fan-out distribution the join/agg queries exercise
    val o = dst("orders"); val c = dst("customer")
    assert(o.join(c, o("o_custkey") === c("c_custkey"), "left_anti").isEmpty)
    def fanout(odf: org.apache.spark.sql.DataFrame) = odf
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
      .groupBy(col("n")).agg(count(lit(1)).as("n_cust"))
    val got = fanout(o).withColumnRenamed("n_cust", "got")
    val want = fanout(src("orders"))
      .withColumn("want", col("n_cust") * 3).drop("n_cust")
    assert(got.join(want, Seq("n"), "full")
      .filter(col("got").isNull || col("want").isNull || col("got") =!= col("want"))
      .isEmpty)
  }

  test("revocab is a per-seed isomorphism: exact-dup structure survives a copy") {
    // equal texts stay equal and UNEQUAL texts stay unequal under one seed,
    // so the planted dedup structure is preserved copy by copy; across
    // seeds the shared vocabulary collapses to the ~20% kept words
    val d = dst("documents")
    val nDoc = src("documents").agg(max(col("doc_id"))).head.getLong(0) + 1L
    def dupGroups(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(col("text")).agg(count(lit(1)).as("n")).filter(col("n") > 1)
      .agg(coalesce(sum(col("n")), lit(0L))).head.getLong(0)
    val srcDups = dupGroups(src("documents"))
    for (c <- 0 until 3) {
      val copy = d.filter(col("doc_id") >= c * nDoc && col("doc_id") < (c + 1) * nDoc)
      assert(dupGroups(copy) === srcDups, s"copy $c reshaped the dup structure")
    }
    // cross-copy: no document text is duplicated between different copies
    val crossDups = d.groupBy(col("text"))
      .agg(countDistinct(floor(col("doc_id") / nDoc)).as("nc"))
      .filter(col("nc") > 1).count()
    assert(crossDups === 0L)
  }

  test("n_chars matches the rewritten text and ts stays microsecond-exact") {
    assert(dst("documents")
      .filter(col("n_chars") =!= length(col("text")).cast("long")).isEmpty)
    // events ts arrives as native TIMESTAMP in ScaleUp output; Tables.events
    // must re-derive ts_ns so both dataset generations present one contract
    val ev = Tables.events(spark, out)
    assert(ev.filter(col("ts_ns").isNull).isEmpty)
    assert(ev.filter(col("ts_ns") =!=
      expr("unix_micros(ts)") * lit(1000L)).isEmpty)
  }

  test("embedding jitter is bounded by 0.01 and copy 0 is untouched") {
    val spec = ScaleUp.jitterEmbedding(col("embedding"), col("vec_id"), 2)
    val maxDelta = src("embeddings")
      .select(aggregate(zip_with(spec, col("embedding"),
        (a, b) => abs(a - b)), lit(0.0d), (acc, x) => greatest(acc, x)).as("m"))
      .agg(max(col("m"))).head.getDouble(0)
    assert(maxDelta <= 0.0101) // ±0.01 plus float cast slack
  }
}
