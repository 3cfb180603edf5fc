package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Physical-plan assertions: the scale-critical properties (scan pruning,
  * filter pushdown, broadcast joins, map-side partial aggregation, top-k
  * instead of global sort) must hold, not just produce correct rows. These
  * are the properties that decide whether the plan survives a 100 TB input.
  */
class PlanSpec extends SparkSpec {

  private def planOf(df: DataFrame): String = {
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
  }
  private def formatted(df: DataFrame): String = {
    val w = new java.io.ByteArrayOutputStream()
    Console.withOut(w) { df.explain("formatted") }
    w.toString
  }

  test("q11: filters AND projection are pushed into the parquet scan") {
    val df = Relational.highValueEarlyLines(Tables.lineitem(spark, sf("sf0.001")))
    val fmt = formatted(df)
    assert(fmt.contains("PushedFilters"), fmt)
    assert(fmt.matches("(?s).*PushedFilters: \\[.*GreaterThan\\(l_extendedprice.*"), fmt)
    assert(fmt.matches("(?s).*PushedFilters: \\[.*EqualTo\\(l_returnflag,R\\).*"), fmt)
    // scan schema pruned to the 4 referenced columns, not all 11
    val readSchema = fmt.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_quantity") && !readSchema.contains("l_shipdate"),
      s"scan not pruned: $readSchema")
  }

  test("q01: aggregation is partial (map-side) then final — one shuffle of tiny rows") {
    val df = Relational.pricingSummary(Tables.lineitem(spark, sf("sf0.001")))
    df.collect()
    val plan = planOf(df)
    assert(plan.contains("partial_sum") || plan.contains("partial_count"), plan)
    // exactly one exchange below the sort (group-by), none extra
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 3, s"too many exchanges ($exchanges):\n$plan") // agg + final sort + AQE reads
  }

  test("q03: dimension joins are broadcast, not shuffled") {
    val dir = sf("sf0.001")
    val df = Relational.revenueByNation(Tables.customer(spark, dir),
      Tables.orders(spark, dir), Tables.lineitem(spark, dir), Tables.nation(spark, dir))
    df.collect()
    val plan = planOf(df)
    assert(plan.contains("BroadcastHashJoin"), plan)
    // nation + customer broadcast → at least 2 broadcast exchanges
    assert(plan.linesIterator.count(_.contains("BroadcastExchange")) >= 2, plan)
  }

  test("q02: sort+limit plans as TakeOrderedAndProject (top-k), not a global sort") {
    val df = Relational.topKOrders(Tables.orders(spark, sf("sf0.001")), 10)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("O2 sampling: orderBy(rand).limit(k) is also top-k, not a full sort") {
    import graft.segmentation.Sampling
    val df = Sampling.randomRows(Tables.orders(spark, sf("sf0.001")), 5, seed = 7L)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("kNN brute force: queries are broadcast; corpus is never shuffled before scoring") {
    import graft.similarity.Knn
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    val df = Knn.bruteForce(emb, emb.filter(emb("vec_id") < 3), k = 2)
    df.collect()
    val plan = planOf(df)
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"), plan)
  }

  test("K-means update step: assignment+partial agg in one codegen stage before the k-row shuffle") {
    import graft.segmentation.KMeansMR
    import org.apache.spark.sql.functions._
    val pts = Tables.events(spark, sf("sf0.001"))
      .select(hour(col("ts")).cast("double").as("h"),
        dayofweek(col("ts")).cast("double").as("d"))
    val cents = Array(Array(3.0, 1.0), Array(15.0, 4.0))
    val agg = pts.groupBy(KMeansMR.assignExpr(Seq(col("h"), col("d")), cents).as("cluster"))
      .agg(count(lit(1)), sum(col("h")), sum(col("d")))
    agg.collect()
    val plan = planOf(agg)
    assert(plan.contains("partial_"), plan)      // map-side combine
    val hashAggs = plan.linesIterator.count(_.contains("HashAggregate"))
    assert(hashAggs >= 2, plan)                  // partial + final
  }

  test("q61: a lang filter over the partitioned layout prunes at the partition level") {
    // stage a lang-partitioned copy of documents, then scan with a lang filter
    val dir = java.nio.file.Files.createTempDirectory("graft_part_spec").toString
    Tables.documents(spark, sf("sf0.001"))
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("n_chars"),
        org.apache.spark.sql.functions.col("lang"))
      .write.mode("overwrite").partitionBy("lang").parquet(dir)
    val df = spark.read.parquet(dir)
      .filter(org.apache.spark.sql.functions.col("lang") === "en")
    val fmt = formatted(df)
    assert(fmt.contains("PartitionFilters"), fmt)
    assert(fmt.matches("(?s).*PartitionFilters: \\[[^\\]]*lang[^\\]]*\\].*"),
      s"lang filter did not reach the partition level:\n$fmt")
  }

  test("LSH bucket caps plan without a Window (groupBy+semi-join form)") {
    // count-over-window adds a per-bucket SORT the groupBy+semi-join form
    // avoids; the bucket-key exchange is shared with the pair join instead.
    for (q <- Seq("q22_minhash_neardups", "q23_simhash_neardups", "q55_cosine_neardups")) {
      val df = graft.SparkEntry.queries(q)(spark, sf("sf0.001"))
      val plan = planOf(df)
      assert(!plan.contains("Window"), s"$q plan contains Window:\n$plan")
    }
  }

  test("q73: ORC scan gets filter pushdown and column pruning too") {
    val df = graft.SparkEntry.queries("q73_orc_ingest")(spark, sf("sf0.001"))
    val fmt = formatted(df)
    assert(fmt.contains("PushedFilters"), fmt)
    assert(fmt.matches("(?s).*PushedFilters: \\[.*GreaterThan\\(n_chars,100\\).*"), fmt)
    val readSchema = fmt.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("text"), s"ORC scan not pruned: $readSchema")
  }

  test("q36 as-of join: exactly ONE hash-partitioning exchange (merge-scan, not join)") {
    // the merge-scan's whole selling point: |L| + |R| rows cross the wire
    // once, keyed by user — no join-then-dedup second exchange. A plan
    // regression back to the equi+range join form shows up as extra
    // hash-partitioning exchanges.
    import org.apache.spark.sql.functions.col
    val dir = sf("sf0.001")
    val ev = Tables.events(spark, dir).select(col("event_id"), col("user_id"), col("ts"))
    val df = AsOfJoin.asof(ev, Tables.orders(spark, dir),
      leftKey = "user_id", rightKey = "o_custkey",
      leftTime = "ts", rightTime = "o_orderdate", rightTieBreak = "o_orderkey")
    df.collect()
    val plan = planOf(df)
    val shuffles = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(shuffles == 1, s"expected exactly 1 shuffle exchange, got $shuffles:\n$plan")
  }

  test("q22 on parquet: LSH signature exchange is reused (the subtree q68/q76 share)") {
    // the signature subtree feeds the bucket-cap semi-join AND the pair
    // join; on the real parquet input both consumers must read ONE exchange
    // (ReusedExchange), not recompute the minhash kernel per consumer.
    val df = graft.SparkEntry.queries("q22_minhash_neardups")(spark, sf("sf0.001"))
    df.collect()
    val plan = planOf(df)
    assert(plan.contains("ReusedExchange"),
      s"signature subtree not shared via ReusedExchange:\n$plan")
  }

  test("q80 contamination: eval grams broadcast — the training scan joins without a shuffle") {
    // the eval set is small by nature; its distinct grams must reach the
    // training side as a broadcast semi-join, never a shuffled one — at
    // 100 TB the training scan is the whole cost and must stay exchange-free
    // up to the per-lang aggregate.
    val df = graft.SparkEntry.queries("q80_contamination")(spark, sf("sf0.001"))
    df.collect()
    val plan = planOf(df)
    assert(plan.contains("BroadcastHashJoin"), s"eval-gram join not broadcast:\n$plan")
  }

  test("q84 z-score: per-type stats broadcast back onto the scan, not shuffled") {
    // the moments table is |event_type| rows; re-keying the full event scan
    // to join it would be a pointless 100 TB shuffle — it must broadcast.
    val df = graft.SparkEntry.queries("q84_anomaly_zscore")(spark, sf("sf0.001"))
    df.collect()
    val plan = planOf(df)
    assert(plan.contains("BroadcastHashJoin"), s"stats join not broadcast:\n$plan")
  }

  test("q45: sketch-only HLL aggregate plans without Expand") {
    // Mixing countDistinct with a regular aggregate triggers the Expand
    // rewrite (every input row duplicated per aggregate group) — a structural
    // 2x row multiplier at 100 TB. The sketch-only form must stay Expand-free
    // and keep map-side partial aggregation of the 4 KiB registers.
    val df = graft.SparkEntry.queries("q45_hll_distinct")(spark, sf("sf0.001"))
    val plan = planOf(df)
    assert(!plan.contains("Expand"), s"q45 plan contains Expand:\n$plan")
    assert(plan.contains("partial_hll_distinct") || plan.contains("HashAggregate"),
      s"q45 lost partial aggregation:\n$plan")
  }

  test("q90: Bloom probe gates BOTH branches; exactly one anti-join remains") {
    // the point of the prefilter: the definitely-new branch (NOT
    // bloom_might_contain) reaches the union with no join at all, and the
    // exact anti-join's left side is only the flagged sliver — the probe
    // expression must appear as a plain Filter in each branch, and the
    // whole plan must contain exactly ONE anti join (q85's form has one
    // too; a regression that verifies both branches would show two).
    val df = graft.SparkEntry.queries("q90_bloom_incremental_dedup")(spark, sf("sf0.001"))
    df.collect()
    val plan = planOf(df)
    val probes = plan.linesIterator.count(l =>
      l.contains("Filter") && l.contains("bloom_might_contain"))
    assert(probes == 2, s"expected 2 bloom-probe filters, got $probes:\n$plan")
    // at this fixture scale the filter flags NOTHING (no cross-boundary
    // dups, fpp ~0), so AQE sees an empty candidate side and eliminates
    // the anti-join altogether — the prefilter's win made structural.
    // Anything above one anti-join would mean both branches re-verify.
    val antis = plan.linesIterator.count(_.contains("LeftAnti"))
    assert(antis <= 1, s"expected at most 1 anti-join, got $antis:\n$plan")
  }

  test("q92 weighted sample: bounded top-k aggregate, never a ranking window") {
    // same scale argument as q88: a row_number window would sort whole
    // language partitions; the A-ES pick must ride the algebraic top-k
    // aggregate with map-side partial aggregation.
    val df = graft.SparkEntry.queries("q92_weighted_sample")(spark, sf("sf0.001"))
    val plan = planOf(df)
    assert(!plan.contains("Window"), s"q92 plan contains Window:\n$plan")
    assert(plan.contains("ObjectHashAggregate"),
      s"q92 lost the typed top-k aggregate:\n$plan")
  }

  test("q93 semantic dedup: candidate generation is never an all-pairs join") {
    // the LSH candidate stage must plan as bucket equi-joins; a cartesian
    // or nested-loop pair join is the O(n^2) form that dies at scale.
    import org.apache.spark.sql.functions.col
    val emb = Tables.embeddings(spark, sf("sf0.001"))
      .select(col("vec_id"), col("embedding"))
    val pairs = graft.similarity.CosineLSH.nearDuplicates(emb, threshold = 0.99)
    val plan = planOf(pairs)
    assert(!plan.contains("CartesianProduct"), s"q93 pair join is cartesian:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"q93 pair join is nested-loop:\n$plan")
  }

  test("q94 funnel: stage joins are keyed equi-joins; no window over user histories") {
    // the funnel must never sort/window whole per-user event histories —
    // the ONLY window allowed is the cosmetic one over the 3 stage-count
    // rows (no partition keys), and every stage join must be an equi-join
    // on the user column, not a nested loop.
    val df = graft.SparkEntry.queries("q94_event_funnel")(spark, sf("sf0.001"))
    df.collect()
    val plan = planOf(df)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"q94 has a non-equi join:\n$plan")
    val userWindows = plan.linesIterator.count(l =>
      l.contains("Window") && l.contains("user_id"))
    assert(userWindows == 0, s"q94 windows over user histories:\n$plan")
  }

  test("q95 PQ: the ADC scoring stage is a pure scan — no joins before the top-k aggregate") {
    // the whole point of PQ codes: scoring touches nothing but the codes
    // column (LUT literals live in the plan), so the pre-aggregate stage
    // must contain zero joins, no window, and the bounded typed top-k.
    import org.apache.spark.sql.functions.col
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    val cb = graft.similarity.ProductQuantization.train(emb, "embedding", m = 8, k = 16, maxIter = 1)
    val codes = graft.similarity.ProductQuantization.encode(emb, "embedding", cb)
    val q = graft.similarity.ProductQuantization.normalized(
        emb.filter(col("vec_id") === 0), "embedding", "nvec")
      .select(col("nvec")).collect()(0).getSeq[Double](0).toArray
    val scored = graft.similarity.ProductQuantization.search(codes, Seq((0L, q)), cb, k = 5)
    val plan = planOf(scored)
    assert(!plan.contains("Join"), s"q95 ADC stage contains a join:\n$plan")
    assert(!plan.contains("Window"), s"q95 ADC stage contains a window:\n$plan")
    assert(plan.contains("ObjectHashAggregate"),
      s"q95 lost the typed top-k aggregate:\n$plan")
  }

  test("q96 corpus sketch: explode collapses into a partial aggregate before the exchange") {
    // the H-fold row fan-out must exist only map-side: the plan is
    // Generate(explode) -> partial HashAggregate -> Exchange(corpus, i) ->
    // final — the shuffle carries H rows per corpus per partition, never
    // the exploded rows.
    import org.apache.spark.sql.functions.lit
    val docs = Tables.documents(spark, sf("sf0.001"))
      .withColumn("corpus", lit("A"))
    val sk = graft.dedup.CorpusOverlap.sketches(docs, "corpus", "text", 64)
    val plan = planOf(sk)
    assert(plan.contains("Generate explode"), s"q96 lost the literal-array explode:\n$plan")
    val genIdx = plan.indexOf("Generate explode")
    val aggAbove = plan.substring(0, genIdx).contains("HashAggregate")
    assert(aggAbove, s"q96 sketch: no aggregate above the explode:\n$plan")
    assert(!plan.contains("Window"), s"q96 sketch plans a window:\n$plan")
  }

  test("q97 containment: pair corpus is semi-join pruned and joins stay equi") {
    val df = graft.SparkEntry.queries("q97_containment_dedup")(spark, sf("sf0.001"))
    df.collect()
    val plan = planOf(df)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"q97 has a non-equi join:\n$plan")
    assert(plan.contains("LeftSemi"), s"q97 lost the gram-side semi-join prune:\n$plan")
  }

  test("q103 quantile bucketing: boundaries broadcast back; no ranking window, no global sort") {
    // the whole point of sketch-derived boundaries: the per-lang quartile
    // table is k rows and must BROADCAST onto the scan for a narrow bucket
    // assignment — an ntile/row_number formulation would sort every lang
    // partition; a shuffled join would re-key the corpus.
    val df = graft.SparkEntry.queries("q103_quantile_buckets")(spark, sf("sf0.001"))
    df.collect()
    val plan = planOf(df)
    assert(plan.contains("BroadcastHashJoin"), s"q103 boundaries not broadcast:\n$plan")
    assert(!plan.contains("Window"), s"q103 plans a ranking window:\n$plan")
    // exactly one range exchange: the cosmetic ORDER BY over the k-row
    // result — a second one would mean the corpus itself got range-sorted
    val ranges = plan.linesIterator.count(_.contains("Exchange rangepartitioning"))
    assert(ranges <= 1, s"q103 sorts the corpus globally ($ranges range exchanges):\n$plan")
  }

  test("q117 corpus card: no Expand anywhere — distincts run as separate passes") {
    // mixing countDistincts into one aggregate plans the Expand rewrite
    // (q45's measured row multiplier); the card must stay Expand-free
    val df = graft.SparkEntry.queries("q117_corpus_card")(spark, sf("sf0.001"))
    df.collect()
    val plan = planOf(df)
    assert(!plan.contains("Expand"), s"q117 plans an Expand:\n$plan")
  }

  test("q99 span dedup: explode partial-aggregates before the gram exchange; joins stay equi") {
    // the (doc, gram) fan-out must combine map-side (partial HashAggregate
    // below the gram-keyed exchange) — shuffling raw exploded rows is the
    // difference between shipping 8-byte combined keys and shipping the
    // corpus re-tokenized; and the dup-gram semi-join must stay an equi
    // join, never a nested loop.
    val df = graft.SparkEntry.queries("q99_span_dedup")(spark, sf("sf0.001"))
    df.collect()
    val plan = planOf(df)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"q99 has a non-equi join:\n$plan")
    assert(plan.contains("LeftSemi"), s"q99 lost the dup-gram semi-join:\n$plan")
    val genIdx = plan.indexOf("Generate explode")
    assert(genIdx >= 0, s"q99 lost the gram explode:\n$plan")
    assert(plan.substring(0, genIdx).contains("HashAggregate"),
      s"q99: no partial aggregate above the explode:\n$plan")
  }

  test("q98 BM25: df/stats broadcast, top-10 is a TakeOrdered, never a global sort") {
    // the posting aggregate joins a 5-row df table and a 1-row stats table —
    // both MUST broadcast (re-keying the postings to meet them would shuffle
    // the corpus-side aggregate twice); and the final top-10 must plan as
    // TakeOrderedAndProject, not an Exchange rangepartitioning + Sort over
    // every scored doc.
    val df = graft.SparkEntry.queries("q98_bm25_retrieval")(spark, sf("sf0.001"))
    df.collect()
    val plan = planOf(df)
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"q98 df/stats join not broadcast:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"q98 top-10 lost the TakeOrdered rewrite:\n$plan")
    // below the TakeOrdered (the corpus side) there must be NO global sort;
    // the cosmetic rank/order of the 10 surviving rows above it may sort
    val corpusSide = plan.substring(plan.indexOf("TakeOrderedAndProject"))
    assert(!corpusSide.contains("Exchange rangepartitioning"),
      s"q98 sorts the corpus side globally:\n$plan")
  }

  test("q120 cohort retention: cohort-size join broadcasts; one cosmetic range exchange") {
    // the heavy lifting is two user_id-keyed aggregates; the week-count-
    // sized cohort table must BROADCAST onto the retention rows, and the
    // only global sort allowed is the final ORDER BY over the k-row matrix
    val df = graft.SparkEntry.queries("q120_cohort_retention")(spark, sf("sf0.001"))
    df.collect()
    val plan = planOf(df)
    assert(plan.contains("BroadcastHashJoin"),
      s"q120 cohort-size join not broadcast:\n$plan")
    val ranges = plan.linesIterator.count(_.contains("Exchange rangepartitioning"))
    assert(ranges <= 1, s"q120 sorts more than the final matrix ($ranges):\n$plan")
  }

  test("q121 SCD-2 runs: windows stay user-partitioned — no global sort below the output ORDER BY") {
    // lag/cumsum/is_current all partition BY USER: the plan must show
    // hash exchanges on user_id with partition-local sorts, and exactly
    // one range exchange (the cosmetic output ordering) — a second one
    // would mean an accidental global sort of the event store
    val df = graft.SparkEntry.queries("q121_scd2_runs")(spark, sf("sf0.001"))
    df.collect()
    val plan = planOf(df)
    assert(plan.contains("Window"), s"q121 lost its windows:\n$plan")
    assert(plan.contains("Exchange hashpartitioning(user_id"),
      s"q121 windows not keyed by user_id:\n$plan")
    val ranges = plan.linesIterator.count(_.contains("Exchange rangepartitioning"))
    assert(ranges <= 1, s"q121 global-sorts the event store ($ranges):\n$plan")
  }

  test("q122 gap fill: grid generated from a 1-row broadcast bounds aggregate; fill join broadcasts") {
    // raw events feed exactly one aggregation; the dense (type x hour)
    // grid comes from a broadcast 1-row bounds aggregate (nested-loop on
    // one row, not a shuffle), and the zero-fill join must broadcast one
    // bounded side rather than re-shuffling either aggregate
    val df = graft.SparkEntry.queries("q122_hourly_gap_fill")(spark, sf("sf0.001"))
    df.collect()
    val plan = planOf(df)
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"q122 bounds row not broadcast under the grid:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"q122 fill join not broadcast:\n$plan")
    assert(plan.contains("Generate sequence") || plan.contains("Generate explode"),
      s"q122 lost the sequence explode:\n$plan")
  }

  test("q123 triangles: all joins are equi (no nested loop except the 1-row total); top-20 is TakeOrdered") {
    // the wedge and closure joins must plan as hash/sort-merge equi joins —
    // a nested loop there is the O(V^2) disaster; the only nested-loop
    // allowed is the broadcast of the 1-row total onto the k-row counts,
    // and the final top-20 must not globally sort the per-vertex table
    val df = graft.SparkEntry.queries("q123_triangle_count")(spark, sf("sf0.001"))
    df.collect()
    val plan = planOf(df)
    val nested = plan.linesIterator.count(_.contains("BroadcastNestedLoopJoin"))
    assert(nested <= 1, s"q123 plans $nested nested-loop joins:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"q123 plans a cartesian:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"q123 top-20 lost the TakeOrdered rewrite:\n$plan")
    // the wedge/closure joins live BELOW the eager orient checkpoint in
    // the shipped path — assert their shape on the lazy form, where the
    // whole subtree is one plan
    import org.apache.spark.sql.functions.col
    val li = Tables.lineitem(spark, sf("sf0.001"))
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val pairs = li.as("x").join(li.as("y"), col("x.ok") === col("y.ok")
        && col("x.pk") < col("y.pk"))
      .select(col("x.pk").as("a"), col("y.pk").as("b"))
    val lazyDf = Triangles.perVertexCounts(pairs, materialize = false)
    lazyDf.collect()
    val lazyPlan = planOf(lazyDf)
    assert(!lazyPlan.contains("BroadcastNestedLoopJoin") &&
      !lazyPlan.contains("CartesianProduct"),
      s"triangle wedge/closure joins are not all equi:\n$lazyPlan")
  }

  test("q124 trend fit: one partial-agg moment pass; 1-row anchor broadcasts") {
    // the five DECIMAL moments must combine map-side (partial HashAggregate
    // below the type-keyed exchange), and the global-min hour anchor must
    // reach the scan as a broadcast 1-row join, never a shuffle
    val df = graft.SparkEntry.queries("q124_trend_fit")(spark, sf("sf0.001"))
    df.collect()
    val plan = planOf(df)
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"q124 anchor row not broadcast:\n$plan")
    val exch = plan.indexOf("Exchange hashpartitioning(event_type")
    assert(exch >= 0, s"q124 lost the type-keyed exchange:\n$plan")
    assert(plan.substring(exch).contains("HashAggregate"),
      s"q124 moments not partially aggregated below the exchange:\n$plan")
  }

  test("q116 components: the propagation round is an equi-join + min-agg; the histogram stays window-free") {
    // the per-round body of ConnectedComponents.components (the part that
    // touches every edge at 100 TB) must plan as a keyed equi-join feeding a
    // min-aggregation WITH map-side partial combine — a nested-loop there is
    // the O(V·E) disaster, and losing the partial agg ships every incoming
    // label over the wire instead of one min per (vertex, partition).
    import org.apache.spark.sql.functions.{col, min => minCol}
    val docs = Tables.documents(spark, sf("sf0.001"))
    val pairs = graft.dedup.MinHashLSH.nearDuplicates(docs, threshold = 0.3)
      .select(col("id1").cast("long").as("s"), col("id2").cast("long").as("d"))
    val edges = pairs.union(pairs.select(col("d").as("s"), col("s").as("d")))
      .filter(col("s") =!= col("d")).distinct()
    val labels = edges.select(col("s").as("id")).distinct()
      .withColumn("label", col("id"))
    // one propagation round, exactly as ConnectedComponents.components builds it
    val incoming = edges.join(labels, col("s") === col("id"))
      .select(col("d").as("id"), col("label"))
    val round = labels.union(incoming).groupBy("id").agg(minCol("label").as("label"))
    round.collect()
    val plan = planOf(round)
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"q116 propagation round has a non-equi join:\n$plan")
    assert(plan.contains("partial_min"),
      s"q116 propagation round lost map-side partial min:\n$plan")
    // the composed histogram query: aggregates over the k-sized component
    // table only — no window anywhere, and the only global sort is the
    // cosmetic ORDER BY over the histogram rows
    val df = graft.SparkEntry.queries("q116_component_histogram")(spark, sf("sf0.001"))
    df.collect()
    val hist = planOf(df)
    assert(!hist.contains("Window"), s"q116 histogram plans a window:\n$hist")
    val ranges = hist.linesIterator.count(_.contains("Exchange rangepartitioning"))
    assert(ranges <= 1, s"q116 sorts more than the final histogram ($ranges):\n$hist")
  }

  test("q127 incremental rollup: on a date-partitioned store the delta side scans ONLY the delta partitions") {
    // q127's whole claim is O(delta) maintenance: the base rollup is stored
    // state, and the increment must reach the parquet scan as a PARTITION
    // filter (pruning whole directories), never a post-scan row filter over
    // the full event store. Stage a d-partitioned copy (the layout a real
    // event store ships) and assert both sides prune at the partition level.
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_rollup_spec").toString
    Tables.events(spark, sf("sf0.001"))
      .select(col("event_type"), to_date(col("ts")).as("d"),
        round(col("value") * 100).cast("long").as("cents"))
      .write.mode("overwrite").partitionBy("d").parquet(dir)
    val store = spark.read.parquet(dir)
    def rollup(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("event_type"), col("d"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
    val cut = lit("2024-01-25").cast("date")
    val base = rollup(store.filter(col("d") < cut))
    val delta = rollup(store.filter(col("d") >= cut))
    val merged = base.unionByName(delta)
      .groupBy(col("event_type"), col("d"))
      .agg(sum(col("n")).cast("long").as("n"),
        sum(col("sum_cents")).cast("long").as("sum_cents"))
    val fmt = formatted(merged)
    // both scans prune on d at the partition level; no row-level d filter
    val partFilters = fmt.linesIterator.filter(_.contains("PartitionFilters")).toList
    assert(partFilters.size == 2, s"expected 2 partitioned scans:\n$fmt")
    assert(partFilters.exists(_.contains("<")) && partFilters.exists(_.contains(">=")),
      s"delta/base cut did not reach the partition level:\n$fmt")
    // and the merge keeps map-side partial aggregation of the mergeable state
    merged.collect()
    val plan = planOf(merged)
    assert(plan.contains("partial_"), s"q127 merge lost partial aggregation:\n$plan")
  }

  test("q128 attribution: as-of merge-scan window present; every join stays equi") {
    // the attribution path inherits q36's merge-scan (one keyed shuffle,
    // running last() window); the 'direct' recovery anti-join ships only
    // event_id keys and must plan as a hash/sort-merge equi join — a
    // nested loop would pair every purchase with every attributed row
    val df = graft.SparkEntry.queries("q128_attribution")(spark, sf("sf0.001"))
    df.collect()
    val plan = planOf(df)
    assert(plan.contains("Window"), s"q128 lost the merge-scan window:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"q128 plans a non-equi join:\n$plan")
  }

  test("q134 perplexity: vocab join is UNHINTED equi (AQE decides), no window appears") {
    // a 100 TB corpus's vocabulary cannot ride a broadcast, so the vocab
    // join must NOT carry a broadcast hint — size-based planning then
    // broadcasts only while the measured vocab fits (it does at test
    // scale) and falls back to a token-keyed shuffle join beyond. The
    // only EXPLICIT broadcast is the 1-row corpus total.
    val df = graft.SparkEntry.queries("q134_unigram_perplexity")(spark, sf("sf0.001"))
    val logical = df.queryExecution.analyzed.toString
    val hinted = logical.linesIterator.filter(_.contains("ResolvedHint")).toSeq
    assert(hinted.size == 1 && !hinted.head.contains("token"),
      s"q134 should hint ONLY the 1-row total, found:\n${hinted.mkString("\n")}")
    df.collect()
    val plan = planOf(df)
    // the vocab join must be keyed on token (equi); the only nested loop
    // allowed is the deliberate 1-row corpus-total broadcast cross join
    val tokenJoins = plan.linesIterator.filter(l =>
      l.contains("Join") && l.contains("token")).toSeq
    assert(tokenJoins.nonEmpty, s"q134 lost the vocab join:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"q134 plans a cartesian:\n$plan")
    assert(!plan.contains("Window"), s"q134 grew a window:\n$plan")
  }

  test("ZOrder.cluster: exactly one range exchange + a non-global sort, interleave stays codegen") {
    import org.apache.spark.sql.functions.{col, floor}
    // absolute epoch minutes here are a DELIBERATE shortcut: only the plan
    // shape is asserted. A shipped recipe must subtract min(ts) first (the
    // q135 fixture / ExplainDump form) or spread16 wraps the minute lane.
    val df = ZOrder.cluster(
      Tables.events(spark, sf("sf0.001"))
        .select(col("event_id"), col("ts"), col("user_id"), col("value"))
        .withColumn("minute", floor(col("ts").cast("long") / 60)),
      col("user_id"), col("minute"), numFiles = 8)
    df.collect()
    val plan = planOf(df)
    val exchanges = plan.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.count(_.contains("rangepartitioning")) == 1,
      s"cluster needs ONE range exchange:\n$plan")
    assert(exchanges.size == 1, s"cluster grew extra exchanges:\n$plan")
    // the sort must be within-partition (global=false): a global sort here
    // would re-shuffle what the range exchange already ordered
    val sorts = plan.linesIterator.filter(_.contains("Sort ")).toSeq
    assert(sorts.nonEmpty && sorts.forall(_.contains("false")),
      s"cluster's sort is global:\n$plan")
    // codegen spans print as `*(n)` prefixes in this plan form; the
    // interleave projection must sit inside one
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("shiftleft")),
      s"interleave fell out of codegen:\n$plan")
  }

  test("q136 edit-distance join: candidate join is equi on the variant, no nested loop anywhere") {
    // the deletion-neighborhood join must stay a variant-keyed equi join:
    // a nested loop here IS the all-pairs blowup the blocking exists to
    // avoid (q136 has no 1-row broadcast frames, so NO nested loop at all
    // is legitimate)
    val df = graft.SparkEntry.queries("q136_editdist_dedup")(spark, sf("sf0.001"))
    df.collect()
    val plan = planOf(df)
    assert(plan.contains("Join"), s"q136 lost the candidate join:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"q136 plans a non-equi join:\n$plan")
  }

  test("q137 KS drift: one data-sized partial agg; ONE window over the staged bucket table") {
    import org.apache.spark.sql.functions.{col, lit, when}
    // the only pass over raw rows is the (side,bucket) count — it must
    // partial-aggregate map-side
    val ev = Tables.events(spark, sf("sf0.001"))
      .select(when(col("event_type") < lit("m"), "A").otherwise("B").as("side"),
        col("value"))
    val counts = KsDrift.bucketCounts(ev, "side", "A", "B", "value", 100)
    counts.collect()
    assert(planOf(counts).contains("partial_sum"),
      s"bucketCounts lost the map-side partial agg:\n${planOf(counts)}")
    // the composed statistic references the bucket table from the window,
    // the totals and the final agg — localCheckpoint staging means the
    // final plan holds exactly ONE window (over checkpointed bucket rows,
    // not raw data) and never re-derives the data-sized agg
    val df = graft.SparkEntry.queries("q137_ks_drift")(spark, sf("sf0.001"))
    df.collect()
    val plan = planOf(df)
    val windows = plan.linesIterator.filter(_.contains("Window [")).toSeq
    assert(windows.size == 1, s"q137 should have ONE window pass:\n$plan")
    assert(windows.head.contains("ca#") || windows.head.contains("cum"),
      s"q137's window runs over raw rows, not bucket counts:\n${windows.head}")
    assert(!plan.contains("partial_sum") || !plan.contains("events.parquet"),
      s"q137 re-derives the data-sized agg past the checkpoint:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"q137 plans a cartesian:\n$plan")
  }
}
