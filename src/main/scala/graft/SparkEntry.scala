package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Relational
import graft.functions.{BloomFilter, HashExprs, TextFunctions}
import graft.dedup.{ExactDedup, MinHashExprs, MinHashLSH, NgramJaccard, SimHashDedup}
import graft.segmentation.{Elbow, Ingest, KMeansMR, Pipelines, Recode}
import graft.similarity.Knn

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every `queries` entry is one operator from SURVEY §2 (or a §7 north-star
  * extension); entries with a DuckDB-expressible equivalent also appear in
  * [[oracleSql]] with IDENTICAL column names and deterministic ORDER BY.
  *
  * Numeric-parity rules used throughout (so Spark and DuckDB hash-match):
  *  - money sums go through DECIMAL(18,2) (exact addition) and cast back to
  *    double (deterministic) — never raw double sums, whose value depends on
  *    partial-aggregation order;
  *  - averages are expressed as exact-sum / count, one deterministic double
  *    division, not engine-native AVG (whose decimal widening rules differ);
  *  - counts/sizes are cast to the same width on both sides (Spark size() is
  *    INT32, DuckDB len() is INT64);
  *  - K-means oracle centroids are integer-valued so squared distances are
  *    integral doubles and their sums are order-independent.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    Relational.revenueByNation(
      Tables.customer(spark, dir), Tables.orders(spark, dir),
      Tables.lineitem(spark, dir), Tables.nation(spark, dir))
  }

  // ---- K-means fixture shared by queries + oracle: integral centroids ----
  private val kmCentroids: Array[Array[Double]] =
    Array(Array(17.0, 0.0), Array(13.0, 0.0), Array(8.0, 3.0)) // BASELINE.md K=3 (A) init

  /** Fixed elbow-sweep centroids for q41: MLlib KMeans(seed=1) fits on
    * events.hour at sf0.01 (k=2..7), exported once and quantized to integers
    * — integral centroids over integral hours make every squared distance an
    * integral double, so the WCSS sums are order-independent and bit-exact vs
    * the DuckDB oracle (same parity rule as [[kmCentroids]]).
    */
  private val sweepCentroids: Seq[(Int, Array[Array[Double]])] = Seq(
    2 -> Array(Array(5.0), Array(17.0)),
    3 -> Array(Array(11.0), Array(19.0), Array(3.0)),
    4 -> Array(Array(10.0), Array(16.0), Array(21.0), Array(3.0)),
    5 -> Array(Array(8.0), Array(18.0), Array(22.0), Array(3.0), Array(14.0)),
    6 -> Array(Array(8.0), Array(18.0), Array(22.0), Array(3.0), Array(20.0), Array(14.0)),
    7 -> Array(Array(9.0), Array(18.0), Array(5.0), Array(22.0), Array(1.0), Array(14.0), Array(20.0)))

  private def eventPoints(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(
        hour(col("ts")).cast("double").as("hour"),
        (dayofweek(col("ts")) - lit(1)).cast("double").as("dow"))

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- scans / projections / filters / casts (SURVEY §2.1, §2.2) ---
    "q11_pushdown_filter" -> ((s, dir) =>
      Relational.highValueEarlyLines(Tables.lineitem(s, dir))),
    "q09_cast_profile" -> ((s, dir) =>
      Relational.priorityCastProfile(Tables.orders(s, dir))),
    "q14_dow_recode" -> ((s, dir) =>
      Relational.eventDowRecode(Tables.events(s, dir))),
    // --- sorts / limits (§2.3) ---
    "q02_top_orders" -> ((s, dir) =>
      Relational.topKOrders(Tables.orders(s, dir), 10)),
    // --- aggregations (§2.5) ---
    "q01_pricing_summary" -> ((s, dir) =>
      Relational.pricingSummary(Parallelize.ensure(Tables.lineitem(s, dir)))),
    "q10_hist2d" -> ((s, dir) =>
      Relational.lineitemHistogram2d(Tables.lineitem(s, dir))),
    "q12_distinct_counts" -> ((s, dir) =>
      Relational.supplierPartStats(Tables.lineitem(s, dir))),
    "q13_events_hourly" -> ((s, dir) =>
      Relational.eventsHourly(Tables.events(s, dir))),
    // --- joins & set ops (§2.4 extension surface) ---
    "q03_revenue_by_nation" -> ((s, dir) =>
      Relational.revenueByNation(Tables.customer(s, dir), Tables.orders(s, dir),
        Tables.lineitem(s, dir), Tables.nation(s, dir))),
    "q04_semi_join" -> ((s, dir) =>
      Relational.customersWithOrders(Tables.customer(s, dir), Tables.orders(s, dir), "F")),
    "q05_anti_join" -> ((s, dir) =>
      Relational.customersWithoutOrders(Tables.customer(s, dir), Tables.orders(s, dir), "P")),
    "q08_union_agg" -> ((s, dir) =>
      Relational.unionAccountHolders(Tables.customer(s, dir), Tables.supplier(s, dir))),
    // --- windows ---
    "q06_window_topn" -> ((s, dir) =>
      Relational.topOrdersPerCustomer(Tables.orders(s, dir), 2)),
    "q07_distinct" -> ((s, dir) =>
      Relational.distinctBrandTypes(Tables.part(s, dir))),
    // --- K-means surface (§2.6/§2.7): assignment + WCSS with fixed inits ---
    "q19_kmeans_assign" -> ((s, dir) => {
      val pts = eventPoints(s, dir)
      pts.withColumn("cluster",
          KMeansMR.assignExpr(Seq(col("hour"), col("dow")), kmCentroids))
        .groupBy(col("cluster"))
        .agg(count(lit(1)).as("n_points"),
          (sum(col("hour")) / count(lit(1))).as("mean_hour"),
          (sum(col("dow")) / count(lit(1))).as("mean_dow"))
        .orderBy(col("cluster"))
    }),
    "q20_wcss" -> ((s, dir) => {
      val pts = eventPoints(s, dir)
      pts.agg(
        sum(KMeansMR.minSqDistExpr(Seq(col("hour"), col("dow")), kmCentroids))
          .as("wcss"),
        count(lit(1)).as("n_points"))
    }),
    // --- text analysis (north-star extensions, SURVEY §7 slice 5) ---
    "q15_doc_stats" -> ((s, dir) =>
      TextFunctions.docStats(Parallelize.ensure(Tables.documents(s, dir)))),
    "q16_exact_dedup" -> ((s, dir) =>
      ExactDedup.summary(Tables.documents(s, dir))),
    "q21_dedup_groups" -> ((s, dir) =>
      ExactDedup.duplicateGroups(Tables.documents(s, dir))),
    "q17_lang_id" -> ((s, dir) => {
      val d = Parallelize.ensure(Tables.documents(s, dir))
      // Staged form: one regexp scan per (row, language), argmax over plain
      // attribute refs — the single-Column langId re-embeds every score in
      // every CASE branch (O(langs²) scans; 26s at sf0.1 before this fix).
      TextFunctions.withLangScores(d, "text")
        .select(
          col("doc_id"),
          col(TextFunctions.langScoreCol("en")).as("en_hits"),
          TextFunctions.langIdFromScores().as("lang_guess"))
        .orderBy(col("doc_id"))
    }),
    "q18_quality" -> ((s, dir) => {
      val d = Parallelize.ensure(Tables.documents(s, dir))
      d.select(
        col("doc_id"),
        TextFunctions.lexicalDiversity(col("text")).as("lex_div"),
        TextFunctions.meanTokenLength(col("text")).as("mean_tok_len"))
        .orderBy(col("doc_id"))
    }),
    // --- near-dup dedup + similarity search (SURVEY §7 slice 5) ---
    "q22_minhash_neardups" -> ((s, dir) =>
      MinHashLSH.nearDuplicates(Parallelize.ensure(Tables.documents(s, dir)), threshold = 0.3)),
    "q70_sequence_packing" -> ((s, dir) => {
      // sequence packing for pretraining: assign docs to ~4096-token shards
      // by running prefix sum, packed WITHIN language shards (packing is
      // inherently order-dependent, so production packs per shard — here the
      // window partitions by lang and the shuffle is one lang-keyed
      // exchange; a doc lands in the shard where its tokens START)
      val docs = Parallelize.ensure(Tables.documents(s, dir))
        .withColumn("n_tokens", TextFunctions.tokenCount(col("text")).cast("bigint"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang")).orderBy(col("doc_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      docs.withColumn("cum", sum(col("n_tokens")).over(w))
        .withColumn("shard", expr("(cum - n_tokens) div 4096"))
        .groupBy(col("lang"), col("shard"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("shard_tokens"))
        .orderBy(col("lang"), col("shard"))
    }),
    "q69_corpus_mix" -> ((s, dir) =>
      // data-mixture stage: per-language target rates (dyadic so the gate
      // constant is exact in any engine), default rate for the tail
      operators.Mixing.sampleStrata(Parallelize.ensure(Tables.documents(s, dir)),
          "lang", Map("en" -> 0.5, "de" -> 0.25, "fr" -> 0.25, "zh" -> 0.125),
          defaultRate = 0.0625)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(TextFunctions.tokenCount(col("text")).cast("bigint")).as("total_tokens"))
        .orderBy(col("lang"))),
    "q68_corpus_dedup_pipeline" -> ((s, dir) => {
      // the full training-data dedup stack in one query: exact dedup (hash
      // groups, min-id canonical) → MinHash LSH near-dup pairs over the
      // survivors → connected components → drop non-canonical members →
      // per-language corpus stats. Every stage is the already-oracled
      // operator; this gates their COMPOSITION end-to-end.
      val docs = Parallelize.ensure(Tables.documents(s, dir))
      // exactDeduped feeds two consumers (LSH pairs + final anti-join) and
      // is recomputed per branch: column pruning specializes each branch's
      // subtree (pairs needs doc_id+text, the anti-join needs every output
      // column), so no shared exchange exists for ReusedExchange to match.
      // At 100 TB a pipeline stages the exact-deduped corpus to storage
      // (q61's partitioned sink) between the stages; recompute is the
      // correct stateless form for the composed one-shot query.
      val exactDeduped = ExactDedup.deduplicate(docs)
      val pairs = MinHashLSH.nearDuplicatePairs(exactDeduped, threshold = 0.3)
        .select(col("id1"), col("id2"))
      val cleaned = graft.dedup.ConnectedComponents.deduplicate(exactDeduped, pairs)
      cleaned.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(TextFunctions.tokenCount(col("text")).cast("bigint")).as("total_tokens"))
        .orderBy(col("lang"))
    }),
    "q76_corpus_dedup_staged" -> ((s, dir) => {
      // the 100 TB form of q68 DEMONSTRATED, not just claimed: the exact-
      // deduped corpus is STAGED to the lang-partitioned parquet layout
      // (q61's sink shape) between the stages, then LSH → connected
      // components → stats run over the staged copy. Both downstream
      // consumers (pair generation + the final anti-join) now read the
      // staged files instead of recomputing the dedup subtree per branch —
      // exactly the stage-to-storage pipeline a real run uses. Shares q68's
      // oracle: the staging hop must be value-preserving end to end.
      val deduped = s.read.parquet(stagedExactDedupedDocs(s, dir))
      val pairs = MinHashLSH.nearDuplicatePairs(deduped, threshold = 0.3)
        .select(col("id1"), col("id2"))
      val cleaned = graft.dedup.ConnectedComponents.deduplicate(deduped, pairs)
      cleaned.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(TextFunctions.tokenCount(col("text")).cast("bigint")).as("total_tokens"))
        .orderBy(col("lang"))
    }),
    "q116_component_histogram" -> ((s, dir) => {
      // dedup-audit histogram over q65's component assignment: how many
      // near-dup clusters exist at each size — the number a corpus owner
      // reads before deciding dedup policy (a few giant clusters vs a long
      // tail of pairs). One extra size agg + one histogram agg over the
      // k-sized component table; singleton docs (no near-dup) counted from
      // the corpus total so the histogram is complete.
      val docs = Parallelize.ensure(Tables.documents(s, dir))
      val pairs = MinHashLSH.nearDuplicatePairs(docs, threshold = 0.3)
        .select(col("id1"), col("id2"))
      val comp = graft.dedup.ConnectedComponents.canonicalAssignments(pairs)
      val sizes = comp.groupBy(col("canonical_id"))
        .agg(count(lit(1)).as("size"))
      val nondup = docs.agg(count(lit(1)).as("n")).collect()(0).getLong(0) -
        comp.count()
      val hist = sizes.groupBy(col("size"))
        .agg(count(lit(1)).as("n_clusters"))
      import s.implicits._
      hist.unionByName(Seq((1L, nondup)).toDF("size", "n_clusters"))
        .groupBy(col("size"))
        .agg(sum(col("n_clusters")).as("n_clusters"))
        .orderBy(col("size"))
    }),
    "q65_neardup_components" -> ((s, dir) => {
      // group resolution over the q22 pair graph: connected components by
      // min-label propagation → one canonical id per near-dup'd document
      val docs = Parallelize.ensure(Tables.documents(s, dir))
      val pairs = MinHashLSH.nearDuplicatePairs(docs, threshold = 0.3)
        .select(col("id1"), col("id2"))
      graft.dedup.ConnectedComponents.canonicalAssignments(pairs)
        .orderBy(col("doc_id"))
    }),
    "q23_simhash_neardups" -> ((s, dir) => {
      // TRUE-gate (q77's pattern lifted corpus-wide): the pair LISTING is
      // engine-internal (native 64-bit SimHash, not reproducible in DuckDB)
      // so the oracle gates the operator's semantics instead —
      //   precision: every returned pair re-verifies against independently
      //     recomputed signatures, reported hamming matching, <= 10;
      //   recall floor: the 20 planted exact copies (q71's fixture, always
      //     blockable: identical sigs share all four chunks) all return;
      //   non-vacuity: the corpus yields pairs at all.
      // A broken kernel, blocking stage, or verify filter flips a boolean.
      val docs = Parallelize.ensure(Tables.documents(s, dir))
        .select(col("doc_id"), col("text"))
      val planted = docs.filter(col("doc_id") < 20)
        .select((col("doc_id") + 1000000).as("doc_id"), col("text"))
      val all = docs.unionByName(planted)
      val sigs = SimHashDedup.signatures(all)
      SimHashDedup.nearDuplicates(all, maxHamming = 10)
        .join(sigs.select(col("id").as("id1"), col("sim").as("s1")), Seq("id1"))
        .join(sigs.select(col("id").as("id2"), col("sim").as("s2")), Seq("id2"))
        .withColumn("direct", bit_count(col("s1").bitwiseXOR(col("s2"))))
        .agg(
          (count(lit(1)) > 0).as("some_pairs_found"),
          coalesce(min((col("direct") === col("hamming") && col("hamming") <= 10)
            .cast("int")) === 1, lit(false)).as("all_pairs_verify"),
          (coalesce(sum(when(col("id2") - col("id1") === 1000000, 1).otherwise(0)),
            lit(0)) === 20).as("planted_all_recovered"))
    }),
    "q71_simhash_recovery" -> ((s, dir) => {
      // planted-copy recovery gate for the SimHash path (q55's design, text
      // flavor): 20 exact copies planted at +1000000 MUST come back through
      // signature → chunk blocking → hamming verify, at distance 0. The
      // oracle predicts exactly those pairs; a broken kernel, blocking, or
      // verify stage loses rows.
      val docs = Parallelize.ensure(Tables.documents(s, dir))
        .select(col("doc_id"), col("text"))
      val planted = docs.filter(col("doc_id") < 20)
        .select((col("doc_id") + 1000000).as("doc_id"), col("text"))
      SimHashDedup.nearDuplicates(docs.unionByName(planted), maxHamming = 0)
        .filter(col("id2") - col("id1") === 1000000)
        .select(col("id1"), col("id2"), col("hamming"))
    }),
    "q77_simhash_blocking_gate" -> ((s, dir) => {
      // q71 beyond distance 0: plant PERTURBED copies (a short deterministic
      // token appended, moving the signature 1–6 bits) at +1000000, compute
      // each planted pair's true signature distance DIRECTLY (no blocking),
      // and require the blocked path at maxHamming=3 to recover the pair IFF
      // that distance <= 3. Correctness of both halves of the claim is gated
      // end-to-end: pigeonhole blocking (4 chunks, <= 3 differing bits leave
      // one chunk intact) may not LOSE a close pair, and the hamming verify
      // may not ADMIT a far one — so `consistent` is TRUE for every pair,
      // which is exactly what the oracle predicts. SimHashBlockingSpec
      // asserts the gate is non-vacuous (both sides of the <=3 boundary are
      // populated at the tested scales).
      // the gate corpus is ONLY base ∪ perturbed (40 docs): the pigeonhole
      // guarantee q77 asserts ("a pair at distance <= 3 is never lost") is
      // deliberately voided by candidatePairs' degenerate-bucket cap, so
      // running the gate over the full corpus would let a >256-doc bucket
      // at a larger sf legally drop a close pair and flip the oracle. The
      // cap-vs-recall tradeoff is the operator's documented contract; this
      // query gates the kernel+blocking+verify SEMANTICS.
      val (base, perturbed) = simhashGateCorpus(Tables.documents(s, dir))
      val all = base.unionByName(perturbed)
      val sigs = SimHashDedup.signatures(all)
      val direct = base.select(col("doc_id").as("id1"),
          (col("doc_id") + 1000000).as("id2"))
        .join(sigs.select(col("id").as("id1"), col("sim").as("s1")), Seq("id1"))
        .join(sigs.select(col("id").as("id2"), col("sim").as("s2")), Seq("id2"))
        .select(col("id1"), col("id2"),
          bit_count(col("s1").bitwiseXOR(col("s2"))).as("direct_hamming"))
      val recovered = SimHashDedup.nearDuplicates(all, maxHamming = 3)
        .filter(col("id2") - col("id1") === 1000000)
        .select(col("id1"), col("id2"), lit(true).as("rec"))
      direct.join(recovered, Seq("id1", "id2"), "left")
        .select(col("id1"), col("id2"),
          (coalesce(col("rec"), lit(false)) === (col("direct_hamming") <= 3))
            .as("consistent"))
        .orderBy(col("id1"))
    }),
    "q24_knn_bruteforce" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Knn.bruteForce(emb, emb.filter(col("vec_id") < 5), k = 3)
        .withColumn("cosine", round(col("cosine"), 6))
    }),
    "q66_fingerprint_gate" -> ((s, dir) =>
      // property gate for the 64-bit fingerprint kernel: collision-free on
      // this corpus AND invariant to case + whitespace layout. The oracle
      // predicts both distinct counts from the normalized text itself — a
      // collision, a case-sensitivity bug, or a whitespace-normalization bug
      // each break a different column. (simhash64 gets no such gate: it is a
      // LOCALITY hash — nearby token multisets colliding is the feature.)
      Parallelize.ensure(Tables.documents(s, dir))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(HashExprs.fingerprint(col("text"))).as("n_distinct_fp"),
          countDistinct(HashExprs.fingerprint(upper(col("text")))).as("n_distinct_fp_case"))),
    "q25_fingerprints" -> ((s, dir) => {
      // contract gate for the 64-bit fingerprint (q66's distinct-count gate
      // lifted to per-doc equality CLASSES): plant a whitespace-layout
      // variant of the first 20 docs (leading/trailing runs + doubled inner
      // spaces — text both engines construct byte-identically), then require
      // the fingerprint's equality classes to equal the normalized-text
      // equality classes exactly, witnessed per doc by the min-doc_id
      // canonical of its class. Equal normalized text with a differing
      // fingerprint breaks a planted row's canonical; ANY collision between
      // distinct normalized texts merges two classes and breaks a base
      // row's canonical. The fingerprint value itself never leaves the
      // engine — only the grouping it induces is compared.
      val docs = Parallelize.ensure(Tables.documents(s, dir))
        .select(col("doc_id"), col("text"))
      val planted = docs.filter(col("doc_id") < 20)
        .select((col("doc_id") + 1000000).as("doc_id"),
          concat(lit(" "), regexp_replace(col("text"), " ", "  "), lit("  ")).as("text"))
      val fp = docs.unionByName(planted)
        .select(col("doc_id"), HashExprs.fingerprint(col("text")).as("fp"))
      val canon = fp.groupBy(col("fp")).agg(min(col("doc_id")).as("canonical_id"))
      fp.join(canon, Seq("fp"))
        .select(col("doc_id"), col("canonical_id"))
        .orderBy(col("doc_id"))
    }),
    "q26_ngram_jaccard" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val pairs = docs.select(col("doc_id").as("id1"))
        .filter(col("id1") < 50)
        .withColumn("id2", col("id1") + 1)
      NgramJaccard.forPairs(pairs, docs)
        .orderBy(col("id1"))
    }),
    "q30_knn_topk_agg" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Knn.bruteForceAgg(emb, emb.filter(col("vec_id") < 5), k = 3)
        .withColumn("cosine", round(col("cosine"), 6))
    }),
    "q27_knn_ivf" -> ((s, dir) => {
      // recall-GATED IVF: per query, does the approximate top-3 recover at
      // least 2 of the exact top-3 (recall@3 >= 2/3)? The oracle predicts
      // `true` for every query — any regression in the quantizer, probe
      // selection, or scoring flips the hash. Operating point (nLists=8,
      // maxIter=4, full-corpus training, nProbe=6) measured to hold the
      // floor at sf0.01 (both generator seeds — nProbe=5 lost one query's
      // 3rd neighbor to an unprobed list on the seed-2 jittered embeddings,
      // the round-7 differential run's one catch) AND sf0.1; at 100 TB the
      // quantizer would train on a sample (trainCentroidsNative's
      // sampleFraction) — full-corpus here keeps the seeded pipeline
      // deterministic for the gate.
      val emb = Tables.embeddings(s, dir)
      val q = emb.filter(col("vec_id") < 5)
      val cents = Knn.trainCentroidsNative(emb, nLists = 8, seed = 1L, maxIter = 4)
      val ivf = Knn.ivf(emb, q, cents, k = 3, nProbe = 6)
        .select(col("query_id"), col("neighbor_id"))
      val exact = Knn.bruteForce(emb, q, k = 3)
        .select(col("query_id"), col("neighbor_id"))
      val hits = ivf.join(exact, Seq("query_id", "neighbor_id"), "left_semi")
        .groupBy(col("query_id")).agg(count(lit(1)).as("n_hits"))
      exact.groupBy(col("query_id")).agg(count(lit(1)).as("n_exact"))
        .join(hits, Seq("query_id"), "left")
        .select(col("query_id"),
          (coalesce(col("n_hits"), lit(0L)) * 3 >= col("n_exact") * 2).as("meets_floor"))
        .orderBy(col("query_id"))
    }),
    "q46_embedding_clusters" -> ((s, dir) => {
      // end-to-end vector clustering with the engine's own array K-means.
      // Deterministic first-k-by-id init so the DuckDB oracle can replay the
      // whole loop (cluster COUNTS are ULP-robust: centroid drift between
      // engines never flips an assignment with real margins).
      val emb = Tables.embeddings(s, dir)
      val init = emb.filter(col("vec_id") < 5).orderBy(col("vec_id"))
        .select(col("embedding").cast("array<double>"))
        .collect().map(_.getSeq[Double](0).toArray)
      val cents = graft.similarity.ArrayKMeans.fitFrom(emb, "embedding", init, maxIter = 5)
      emb.withColumn("cluster",
          Knn.assignList(col("embedding").cast("array<double>"), cents))
        .groupBy(col("cluster"))
        .agg(count(lit(1)).as("n_vectors"))
        .orderBy(col("cluster"))
    }),
    "q47_corpus_pipeline" -> ((s, dir) => {
      // the training-data prep flow: exact-dedup -> quality gate -> per-lang stats
      val docs = Parallelize.ensure(Tables.documents(s, dir))
      val deduped = ExactDedup.deduplicate(docs)
      val gated = deduped
        .withColumn("n_tokens", TextFunctions.tokenCount(col("text")))
        .filter(col("n_tokens") >= 10 && col("n_chars") >= 50)
      gated.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens").cast("bigint")).as("total_tokens"),
          (sum(col("n_tokens")).cast("double") / count(lit(1))).as("mean_tokens"))
        .orderBy(col("lang"))
    }),
    "q45_hll_distinct" -> ((s, dir) => {
      // TRUE-gated sketch (the q67 pattern, per group): each group's HLL
      // estimate must land within 5% of its exact distinct count (p=12
      // ≈ 1.6% se), so the oracle predicts the verdict even though the raw
      // estimate is engine-internal. The sketch and exact sides run as two
      // SEPARATE single-aggregate passes joined on the 3-row group key:
      // mixing the sketch with countDistinct in ONE agg triggers the Expand
      // rewrite (every input row duplicated per aggregate group — a 2x row
      // multiplier at 100 TB; measured 2.20s combined vs 0.59s split at
      // sf0.1), and PlanSpec asserts the sketch side stays Expand-free.
      val lt = Tables.lineitem(s, dir)
      val sketch = lt.groupBy(col("l_returnflag"))
        .agg(graft.functions.HyperLogLog.hllDistinct(col("l_partkey")).as("hll_estimate"))
      val exact = lt.groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("exact"))
      sketch.join(exact, Seq("l_returnflag"))
        .select(col("l_returnflag"),
          (abs(col("hll_estimate").cast("double") / col("exact").cast("double") - 1.0)
            <= 0.05).as("within_tolerance"))
        .orderBy(col("l_returnflag"))
    }),
    "q74_approx_percentile" -> ((s, dir) => {
      // quantile-sketch gate (third sketch family beside HLL and bounded
      // top-k): percentile_approx's p50/p90 must land inside the exact
      // p45–p55 / p85–p95 bands — the oracle predicts TRUE/TRUE, so sketch
      // regressions flip the hash. At 100 TB the sketch is the only option:
      // exact percentiles need a global sort, the sketch one mergeable
      // aggregation.
      val lt = Tables.lineitem(s, dir)
      val approx = lt.agg(percentile_approx(col("l_quantity"),
        array(lit(0.5), lit(0.9)), lit(10000)).as("ap"))
      val exact = lt.agg(expr(
        "percentile(l_quantity, array(0.45, 0.55, 0.85, 0.95))").as("ex"))
      approx.crossJoin(exact).select(
        (col("ap")(0) >= col("ex")(0) && col("ap")(0) <= col("ex")(1)).as("p50_in_band"),
        (col("ap")(1) >= col("ex")(2) && col("ap")(1) <= col("ex")(3)).as("p90_in_band"))
    }),
    "q67_hll_merge" -> ((s, dir) => {
      // sketch-rollup gate: per-group sketches merged at query time must
      // (a) give BIT-IDENTICAL registers to one direct pass (merge = the
      // same element-wise max as partial aggregation), and (b) land within
      // 5% of the exact distinct count (p=12 ~ 1.6% se). This is the stored-
      // sketch pattern that answers 100 TB distinct-count rollups without
      // rescanning: 4 KiB per (group, day) instead of the raw keys.
      val lt = Tables.lineitem(s, dir)
      import graft.functions.HyperLogLog
      val merged = lt.groupBy(col("l_returnflag"))
        .agg(HyperLogLog.hllSketch(col("l_partkey")).as("sk"))
        .agg(HyperLogLog.hllMergeEstimate(col("sk")).as("est"))
      val direct = lt.agg(HyperLogLog.hllDistinct(col("l_partkey")).as("direct_est"))
      val exact = lt.agg(countDistinct(col("l_partkey")).as("exact"))
      merged.crossJoin(direct).crossJoin(exact)
        .select((col("est") === col("direct_est")).as("merge_consistent"),
          (abs(col("est").cast("double") / col("exact").cast("double") - 1.0) <= 0.05)
            .as("within_tolerance"))
    }),
    "q52_exact_distinct" -> ((s, dir) =>
      // the oracle-able half of q45: exact distinct counts, no sketch column
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("exact_distinct"))
        .orderBy(col("l_returnflag"))),
    // --- streaming (bounded drain of the structured-streaming pipeline) ---
    "q44_stream_windows" -> ((s, dir) =>
      graft.streaming.EventsStream.windowedCountsBounded(s, dir)),
    "q62_stream_dedup" -> ((s, dir) =>
      graft.streaming.EventsStream.dedupedWindowedCountsBounded(s, dir)),
    "q89_stream_enrichment" -> ((s, dir) =>
      // stream-static dimension join: per-batch broadcast of the customer
      // segment table onto the event stream (the stream never shuffles for
      // the join); complete-mode counts equal the batch join + GROUP BY
      graft.streaming.EventsStream.enrichedSegmentCountsBounded(s, dir)),
    "q87_stream_stream_join" -> ((s, dir) =>
      // watermarked stream-stream interval join (click → purchase within
      // 6h, same user): inner-join state buffered across micro-batches,
      // evicted by the time-bounded condition; counts equal the batch theta
      // join. The missing fourth streaming surface beside windows, dedup,
      // and custom state.
      graft.streaming.EventsStream.clickPurchaseJoinBounded(s, dir)),
    "q111_stream_update_mode" -> ((s, dir) =>
      // UPDATE emission semantics: only changed keys emit per batch; under
      // the fixed five-chunk staging each real type updates in exactly the
      // three tercile batches, and the max update equals the batch count
      graft.streaming.EventsStream.updateModeCountsBounded(s, dir)),
    "q110_stream_file_sink" -> ((s, dir) =>
      // the production sink: append windows to parquet + _spark_metadata
      // commit log (exactly-once file sink); the read-back lists files
      // from the log and must equal the batch windows (q44's oracle)
      graft.streaming.EventsStream.windowedCountsToFileSink(s, dir)),
    "q109_stream_hll" -> ((s, dir) =>
      // mergeable HLL registers as STREAMING aggregation state (complete
      // mode): per-type distinct users estimated from 4 KiB/group state,
      // gated within 5% of the batch-exact count; sketches and streams
      // compose — the 100 TB way to keep cardinalities on a stream
      graft.streaming.EventsStream.hllDistinctUsersBounded(s, dir)),
    "q108_stream_upsert" -> ((s, dir) =>
      // foreachBatch keyed MERGE into versioned parquet snapshots (the
      // lakehouse upsert pattern from primitives): final snapshot ==
      // chunking-independent batch argmax per user, replay-idempotent via
      // per-batch snapshot overwrite
      graft.streaming.EventsStream.upsertLatestBounded(s, dir)),
    "q102_sliding_windows" -> ((s, dir) =>
      // 10-min windows sliding every 5: each event in exactly two windows,
      // expanded map-side before the partial agg — the third member of the
      // window family beside q44's tumbling and q57's session windows
      graft.streaming.EventsStream.slidingWindowedCountsBounded(s, dir)),
    "q100_stream_left_outer_join" -> ((s, dir) =>
      // LEFT OUTER stream-stream interval join: the null-joined "abandoned
      // click" rows emit only when the watermark proves no purchase can
      // still match — state-eviction-as-emission, the outer half q87's
      // inner join doesn't exercise. The '__flush' sentinel fixes the final
      // watermark, so the emission boundary is deterministic and the batch
      // oracle mirrors it exactly.
      graft.streaming.EventsStream.clickPurchaseLeftOuterBounded(s, dir)),
    "q75_stream_restart" -> ((s, dir) =>
      // exactly-once across a checkpoint RESTART: the duplicated stream runs
      // as two query incarnations over one file checkpoint + parquet sink
      // (stop mid-stream, new files arrive, restart restores dedup state +
      // watermark); final windows must equal the same batch oracle as q44/q62
      graft.streaming.EventsStream.dedupedWindowedCountsRestart(s, dir)),
    // --- set operations: INTERSECT / EXCEPT (distinct set semantics) ---
    "q64_set_ops" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val f = o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      val p = o.filter(col("o_orderstatus") === "P").select(col("o_custkey"))
      f.intersect(p).withColumn("tag", lit("both"))
        .unionByName(f.except(p).withColumn("tag", lit("f_only")))
        .groupBy(col("tag")).agg(count(lit(1)).as("n_custs"))
        .orderBy(col("tag"))
    }),
    // --- analytic windows: running aggregate + lag over a high-cardinality
    //     partition key (user) — shuffles once by user, sorts within ---
    "q63_running_window" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir)
        .filter(col("user_id") < 100)
        .select(col("user_id"), col("event_id"), col("ts"), col("value"))
        .withColumn("running_sum",
          sum(col("value").cast("decimal(18,2)"))
            .over(w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0))
            .cast("double"))
        .withColumn("prev_value", lag(col("value"), 1).over(w))
        .select(col("user_id"), col("event_id"), col("running_sum"), col("prev_value"))
        .orderBy(col("user_id"), col("event_id"))
    }),
    "q38_percentiles" -> ((s, dir) =>
      Relational.quantityPercentiles(Tables.lineitem(s, dir))),
    "q39_string_funcs" -> ((s, dir) =>
      Relational.partNameProfile(Tables.part(s, dir))),
    // --- semi-structured / calendar / grouping-sets / pivot / as-of ---
    "q33_json_extract" -> ((s, dir) =>
      Relational.eventPropsProfile(Tables.events(s, dir))),
    "q34_calendar" -> ((s, dir) =>
      Relational.ordersByCalendar(Tables.orders(s, dir))),
    "q35_rollup" -> ((s, dir) =>
      Relational.lineitemRollup(Tables.lineitem(s, dir))),
    "q50_global_sort" -> ((s, dir) =>
      // full ORDER BY with no limit: range-partitioned exchange + sort
      Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))),
    "q51_cross_join" -> ((s, dir) =>
      // cartesian of two tiny dims — the one join shape where crossJoin is legal
      Tables.region(s, dir).crossJoin(Tables.nation(s, dir))
        .select(col("r_name"), col("n_name"))
        .orderBy(col("r_name"), col("n_name"))),
    "q48_cube" -> ((s, dir) =>
      Relational.lineitemCube(Tables.lineitem(s, dir))),
    "q49_token_freq" -> ((s, dir) =>
      Relational.tokenFrequency(Parallelize.ensure(Tables.documents(s, dir)), 25)),
    "q37_pivot" -> ((s, dir) =>
      Relational.ordersStatusPivot(Tables.orders(s, dir))),
    "q86_range_join" -> ((s, dir) => {
      // interval join with NO equi-key: per-day overlapping 30-hour
      // campaign windows × the event stream. The bucketed operator turns
      // the would-be BroadcastNestedLoop theta join into one hash equi-join
      // on a day bucket (RangeJoinSpec asserts the plan); intervals span
      // two buckets, so pairs meeting in exactly one bucket is exercised,
      // and each event matches up to two overlapping windows.
      val ev = Tables.events(s, dir).select(col("event_id"), col("ts"), col("value"))
      val iv = ev.select(date_trunc("day", col("ts")).as("w_start")).distinct()
        .withColumn("w_end", col("w_start") + expr("INTERVAL 30 HOURS"))
      operators.RangeJoin.bucketed(ev, iv, "ts", "w_start", "w_end",
          bucketSeconds = 86400L)
        .groupBy(col("w_start"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
        .orderBy(col("w_start"))
    }),
    "q36_asof_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(col("event_id"), col("user_id"), col("ts"))
      // project the right side to exactly (key, time, tie-break) BEFORE the
      // as-of merge-scan: AsOfJoin packs every right column into the struct
      // payload that rides the union's keyed exchange and the running
      // last() window, and Catalyst cannot prune struct fields through the
      // window — the unprojected form shipped six orders columns per row
      // where the query consumes one (guide §2.3: project before the
      // exchange). Result unchanged: only asof_o_orderkey is selected.
      operators.AsOfJoin.asof(ev,
          Tables.orders(s, dir)
            .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey")),
          leftKey = "user_id", rightKey = "o_custkey",
          leftTime = "ts", rightTime = "o_orderdate",
          rightTieBreak = "o_orderkey")
        .select(col("event_id"), col("asof_o_orderkey"))
        .orderBy(col("event_id"))
    }),
    // --- explicit skew handling (oracle = the unsalted equivalent) ---
    "q31_salted_distinct" -> ((s, dir) =>
      operators.Skew.saltedDistinctCount(
          Tables.lineitem(s, dir), "l_returnflag", "l_partkey", nSalts = 8)
        .orderBy(col("l_returnflag"))),
    "q32_salted_join" -> ((s, dir) =>
      operators.Skew.saltedJoin(
          Tables.lineitem(s, dir), Tables.supplier(s, dir).withColumnRenamed("s_suppkey", "l_suppkey"),
          "l_suppkey", nSalts = 4)
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("n_items"), sum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("s_name"))),
    // --- multimodal: REAL JDK PNG decode over opaque binary payloads.
    //     The fixture stages actual PNG bytes (javax.imageio encode) whose
    //     content is a closed-form function of (doc_id, n_chars); the query
    //     must parse the container and sum the raster per channel, and the
    //     oracle re-derives every statistic from the documents table alone.
    //     A wrong stride / channel order / filter reconstruction breaks the
    //     hash. Payloads stay narrow (scan → mapPartitions → small feature
    //     rows); only the fixed-width stats ever reach a shuffle. ---
    "q28_media_features" -> ((s, dir) => {
      import graft.multimodal.Multimodal.PngCodec
      import s.implicits._
      // ensure AFTER filter+select: the pushdown reaches the scan, and the
      // rebalance (staged fixture = 4 one-row-group files) carries only
      // (media_id, payload) so the decode runs on every core
      Parallelize.ensure(
        s.read.parquet(stagedPngMedia(s, dir))
          .filter(col("media_type") === "image")
          .select(col("media_id"), col("payload"))).as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, p) =>
          val st = PngCodec.decodeStats(p)
          (id, st.width, st.height, st.width.toLong * st.height,
            st.sum_r, st.sum_g, st.sum_b)
        })
        .toDF("media_id", "width", "height", "n_pixels", "sum_r", "sum_g", "sum_b")
        .orderBy(col("media_id"))
    }),
    "q29_frame_samples" -> ((s, dir) =>
      // "video" = PNG filmstrip (frames stacked vertically): decode the
      // container ONCE per row, then slice per-frame raster bands — the
      // frame-sampling shape of a real clip pipeline with the JDK as codec
      graft.multimodal.Multimodal
        .sampleFrames(Parallelize.ensure(s.read.parquet(stagedPngMedia(s, dir))))
        .orderBy(col("media_id"), col("frame_idx"))),
    "q139_audio_features" -> ((s, dir) => {
      // REAL JDK WAV decode over opaque binary payloads (the audio
      // analogue of q28): the fixture stages actual RIFF/WAV PCM whose
      // stereo samples are a closed-form modular ramp of (doc_id,
      // n_chars); the query must parse the container (fmt chunk, frame
      // layout, LE 16-bit sign extension) and sum real samples per
      // channel, and the oracle re-derives every statistic from the
      // documents table alone. A wrong frame size, channel order, or
      // sign bit breaks the hash. Payloads stay narrow (scan ->
      // mapPartitions -> fixed-width stats); only stats reach a shuffle.
      import graft.multimodal.Multimodal.WavCodec
      import s.implicits._
      // ensure AFTER filter+select (q28's discipline): the staged WAV dir
      // is 4 one-row-group files, so a bare read runs the decode on 4
      // tasks regardless of core count — the r8 bench's one kept flag
      Parallelize.ensure(
        s.read.parquet(stagedWavMedia(s, dir))
          .filter(col("media_type") === "audio")
          .select(col("media_id"), col("payload"))).as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, p) =>
          val st = WavCodec.decodeStats(p)
          (id, st.channels, st.sampleRate, st.frames, st.sumLeft, st.sumRight)
        })
        .toDF("media_id", "n_channels", "sample_rate", "n_frames",
          "sum_left", "sum_right")
        .orderBy(col("media_id"))
    }),
    "q156_audio_audit" -> ((s, dir) => {
      // audio QUALITY audit — the clip-level filter stage of a speech
      // corpus build: per clip, clipped/near-rail sample counts, silence-
      // floor counts, per-channel peak and exact integer energy, over the
      // same REAL WAV PCM payloads q139 decodes (container parse shared
      // with decodeStats). The oracle re-derives every count from the
      // closed-form sample ramp; a wrong threshold, sign bit, or channel
      // order breaks the hash. Same scale shape as q139: narrow scan ->
      // mapPartitions decode -> fixed-width stats.
      import graft.multimodal.Multimodal.WavCodec
      import s.implicits._
      Parallelize.ensure(
        s.read.parquet(stagedWavMedia(s, dir))
          .filter(col("media_type") === "audio")
          .select(col("media_id"), col("payload"))).as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, p) =>
          val a = WavCodec.decodeAudit(p)
          (id, a.frames, a.clipLeft, a.clipRight, a.silenceLeft,
            a.silenceRight, a.peakLeft.toLong, a.peakRight.toLong,
            a.energyLeft, a.energyRight)
        })
        .toDF("media_id", "n_frames", "clip_l", "clip_r", "silence_l",
          "silence_r", "peak_l", "peak_r", "energy_l", "energy_r")
        .orderBy(col("media_id"))
    }),
    "q157_snapshot_diff" -> ((s, dir) => {
      // dataset-versioning audit: classify every doc between corpus v1
      // (the table as-is) and a deterministically derived v2 (doc_id%13=5
      // removed, %7=3 text-edited, %17=2 cloned under +1e9 ids) as added/
      // removed/changed/unchanged, rolled up per (lang, status). ONE
      // co-partitioned full-outer join on the key; the oracle rebuilds v2
      // and replays the classification with null-safe equality.
      import graft.operators.SnapshotDiff
      val d = Parallelize.ensure(Tables.documents(s, dir))
      val v2 = d.filter(col("doc_id") % 13 =!= 5)
        .withColumn("text",
          when(col("doc_id") % 7 === 3, concat(col("text"), lit(" rev2 edit")))
            .otherwise(col("text")))
        .unionByName(
          d.filter(col("doc_id") % 17 === 2)
            .withColumn("doc_id", col("doc_id") + lit(1000000000L)))
      val diffed = SnapshotDiff.diff(d, v2, "doc_id",
        payloadCols = Seq("text", "lang", "source", "n_chars"),
        carryCols = Seq("lang"))
      SnapshotDiff.summary(diffed, Seq("lang"))
        .orderBy(col("lang"), col("status"))
    }),
    "q158_kmv_overlap" -> ((s, dir) =>
      // q96's corpus-overlap question answered from KMV (bottom-k)
      // sketches instead of the exact distinct-join: per-side k=128
      // minima of a deterministic engine-replayable key (rolling-31 text
      // hash spread through the Knuth constant), union sketch + Jaccard
      // estimate computed from the two sketches alone. Bottom-k state is
      // algebraic (map-side reduces every partition to 1 KiB before the
      // exchange); the oracle replays the exact same minima in SQL, so
      // every estimate matches to the integer. See functions.KmvSketch.
      graft.functions.KmvSketch.corpusOverlapSketch(
        Parallelize.ensure(Tables.documents(s, dir)), k = 128)),
    "q159_dsir_selection" -> ((s, dir) =>
      // DSIR domain-targeting selection (Xie NeurIPS'23): score every doc
      // by sum over tokens of ln p_target(bucket) - ln p_raw(bucket)
      // (hashed-unigram bag models, add-one smoothing, 512 buckets,
      // target = the 'en' slice), each ln quantized ONCE per bucket to
      // integer nanos via FLOOR — floor of a double is engine-exact, so
      // every score downstream is exact BIGINT and the oracle replays the
      // top-25 integer-for-integer. One token explode + two bucket-sized
      // aggs + a broadcast weight join; see operators.Dsir.
      graft.operators.Dsir.topByImportance(
        Parallelize.ensure(Tables.documents(s, dir)),
        isTarget = col("lang") === "en", n = 25)),
    "q160_mad_anomaly" -> ((s, dir) =>
      // Hampel median/MAD outlier gate per event type — q84's 3-sigma
      // gate made heavy-tail-proof: |x-med| > 3.5*MAD with every
      // statistic exact (doubled-cents integer medians, integer
      // deviations, half-integer MAD — no division/sqrt/rounding, the
      // verdict is a product of exact integers). Exact percentile state
      // is bounded by the distinct-cents domain (KB-scale, mergeable);
      // see operators.RobustAnomaly for the DDSketch swap at unbounded
      // domains.
      graft.operators.RobustAnomaly.madOutliers(
          Tables.events(s, dir), "event_type",
          round(col("value") * 100).cast("long"))
        .orderBy(col("event_type"))),
    "q161_quality_budget" -> ((s, dir) =>
      // budget-greedy curriculum cut: per lang, rank docs by the q155
      // quality margin (ties by doc_id) and keep the prefix whose
      // inclusive running token total fits an 8192-token budget — the
      // "best docs first, stop at the budget" selection that complements
      // the rate-based mixing family (q69/q114/q152). One running-sum
      // window per lang partition, all integer arithmetic; the oracle
      // replays margins, order and cumsum exactly.
      graft.operators.Mixing.budgetGreedySelect(
          Parallelize.ensure(Tables.documents(s, dir)), "lang",
          scoreCol = graft.functions.QualityExprs.qualityMargin(col("text")),
          tokensCol = TextFunctions.tokenCount(col("text")),
          budgetTokens = 8192L)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("_nt")).as("tokens"),
          min(col("_score")).as("cutoff_margin"),
          max(col("doc_id")).as("max_doc_id"))
        .orderBy(col("lang"))),
    "q162_template_canon" -> ((s, dir) =>
      // boilerplate/template collapse with quality-aware canonical pick:
      // docs sharing the same 8-token opening prefix (md5 — the q16/q21
      // hash contract) form a family; keep the member with the highest
      // q155 margin (ties: lowest doc_id). The argmax is an associative
      // max(struct(score, -id)) — ONE partial→final agg, no window sort;
      // the oracle replays families, margins and the pick exactly.
      graft.dedup.TemplateCanon.collapse(
          Parallelize.ensure(Tables.documents(s, dir)),
          scoreCol = graft.functions.QualityExprs.qualityMargin(col("text")),
          prefixTokens = 8)
        .orderBy(col("kept_id"))),
    "q163_epoch_expand" -> ((s, dir) =>
      // the execution half of the mixing plan: materialize fractional
      // epochs (en 2.5x, de 1.25x, fr 1.5x, es 1.0x, else 0.75x) — each
      // doc repeats floor(f) times plus one more iff its Knuth gate fires
      // at the dyadic fraction, so f < 1 degenerates to subsampling and
      // the SAME rows get the extra epoch on both engines. Map-only
      // explode, zero shuffle below the report agg; see
      // operators.Mixing.epochExpand.
      graft.operators.Mixing.epochExpand(
          Parallelize.ensure(Tables.documents(s, dir))
            .select(col("doc_id"), col("lang"),
              TextFunctions.tokenCount(col("text")).cast("bigint").as("nt")),
          "lang",
          factors = Map("en" -> 2.5, "de" -> 1.25, "fr" -> 1.5, "es" -> 1.0),
          defaultFactor = 0.75)
        .groupBy(col("lang"), col("epoch"))
        .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("tokens"))
        .orderBy(col("lang"), col("epoch"))),
    // --- planted-subset scale gates (q140–q146): sf1 evidence for the
    //     seven quadratic-oracle queries (q22/q65/q68/q76/q116/q133/q136),
    //     whose only direct oracle is the brute-force all-pairs scan the
    //     operator exists to replace (unaffordable in DuckDB beyond the
    //     sf0.01 scale). Each gate unions the deterministic Planted corpus
    //     (disjoint vocabulary -> provably isolated from organic docs; see
    //     graft.Planted scaladoc) into the REAL corpus, runs the REAL
    //     operator over the combined input at whatever scale the gate
    //     runs, and restricts the OUTPUT to planted ids — where the
    //     expected rows are closed-form arithmetic. At sf1 the banding/
    //     blocking/verify joins must therefore execute against the full
    //     50k-doc corpus and still recover every planted pair exactly. ---
    "q140_planted_neardup_pairs" -> ((s, dir) =>
      // q22's operator (MinHash LSH banding + exact-Jaccard verify) over
      // corpus+planted; expected planted pairs and their exact Jaccards
      // follow from the group construction
      MinHashLSH.nearDuplicates(
          Parallelize.ensure(Tables.documents(s, dir))
            .unionByName(Planted.docs(s)),
          threshold = 0.3)
        .filter(col("id1") >= Planted.base)
        .orderBy(col("id1"), col("id2"))),
    "q141_planted_components" -> ((s, dir) => {
      // q65's operator (label propagation over the LSH pair graph);
      // planted components can never merge with organic ones (exact
      // verification + disjoint vocabulary), so canonical = group base id
      val docs = Parallelize.ensure(Tables.documents(s, dir))
        .unionByName(Planted.docs(s))
      val pairs = MinHashLSH.nearDuplicatePairs(docs, threshold = 0.3)
        .select(col("id1"), col("id2"))
      graft.dedup.ConnectedComponents.canonicalAssignments(pairs)
        .filter(col("doc_id") >= Planted.base)
        .orderBy(col("doc_id"))
    }),
    "q142_planted_component_histogram" -> ((s, dir) => {
      // q116's aggregation over the planted slice: group sizes 2/3/4 by
      // construction + the 8 exact pairs in bucket 2 + 10 singletons
      val docs = Parallelize.ensure(Tables.documents(s, dir))
        .unionByName(Planted.docs(s))
      val pairs = MinHashLSH.nearDuplicatePairs(docs, threshold = 0.3)
        .select(col("id1"), col("id2"))
      val comp = graft.dedup.ConnectedComponents.canonicalAssignments(pairs)
        .filter(col("doc_id") >= Planted.base)
      val sizes = comp.groupBy(col("canonical_id"))
        .agg(count(lit(1)).as("size"))
      val nondup = Planted.docCount - comp.count()
      val hist = sizes.groupBy(col("size"))
        .agg(count(lit(1)).as("n_clusters"))
      import s.implicits._
      hist.unionByName(Seq((1L, nondup)).toDF("size", "n_clusters"))
        .groupBy(col("size"))
        .agg(sum(col("n_clusters")).as("n_clusters"))
        .orderBy(col("size"))
    }),
    "q143_planted_dedup_chain" -> ((s, dir) => {
      // q68's full chain (exact dedup -> LSH pairs -> components -> drop
      // non-canonical -> per-lang stats) over corpus+planted, sliced to
      // the planted language: 58 kept docs / 1441 tokens by construction
      val docs = Parallelize.ensure(Tables.documents(s, dir))
        .unionByName(Planted.docs(s))
      val exactDeduped = ExactDedup.deduplicate(docs)
      val pairs = MinHashLSH.nearDuplicatePairs(exactDeduped, threshold = 0.3)
        .select(col("id1"), col("id2"))
      val cleaned = graft.dedup.ConnectedComponents.deduplicate(exactDeduped, pairs)
      cleaned.filter(col("lang") === "planted")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(TextFunctions.tokenCount(col("text")).cast("bigint")).as("total_tokens"))
        .orderBy(col("lang"))
    }),
    "q144_planted_dedup_staged" -> ((s, dir) => {
      // q76's staged form of the same chain: the exact-deduped
      // corpus+planted is staged to the lang-partitioned parquet layout,
      // then LSH -> components -> stats run over the staged copy
      val deduped = s.read.parquet(stagedPlantedDedupedDocs(s, dir))
      val pairs = MinHashLSH.nearDuplicatePairs(deduped, threshold = 0.3)
        .select(col("id1"), col("id2"))
      val cleaned = graft.dedup.ConnectedComponents.deduplicate(deduped, pairs)
      cleaned.filter(col("lang") === "planted")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(TextFunctions.tokenCount(col("text")).cast("bigint")).as("total_tokens"))
        .orderBy(col("lang"))
    }),
    "q145_planted_prefix_join" -> ((s, dir) =>
      // q133's operator (PPJoin prefix filtering, exact recall theorem)
      // over corpus+planted at threshold 4/5 on word-5-gram shingles
      graft.dedup.PrefixFilterJoin
        .similarPairs(Tables.documents(s, dir).unionByName(Planted.docs(s)),
          num = 4, den = 5, shingleWords = 5)
        .filter(col("id1") >= Planted.base)
        .orderBy(col("id1"), col("id2"))),
    "q149_bpe_merges" -> ((s, dir) =>
      // tokenizer training: the first 8 BPE merge rules learned from the
      // corpus (frequency-weighted greedy pair merging over the DISTINCT
      // word table — one corpus pass, then vocab-sized rounds). The
      // oracle unrolls all 8 rounds in SQL (the q132 pattern) with
      // op-identical encoding, counting, tie-break and literal-replace
      // merge semantics — see operators.BpeTrainer scaladoc.
      graft.operators.BpeTrainer.learnMerges(
        Parallelize.ensure(Tables.documents(s, dir)), nMerges = 8)),
    "q152_temperature_mix" -> ((s, dir) => {
      // temperature-flattened language mixing (T=2, the multilingual
      // upsampling rule): rate_l ∝ sqrt(share_l), normalized so the
      // largest language keeps everything. The rates are COMPUTED from
      // corpus counts through sqrt/divide — both correctly-rounded IEEE
      // ops, so the driver-side doubles equal DuckDB's bit-for-bit — and
      // the keep-gate stays Mixing's exact-integer Knuth hash with a
      // TRUNCATING threshold (mirrored as floor() in the oracle; Spark's
      // double->long cast truncates). Stats collect is lang-count sized.
      val docs = Parallelize.ensure(Tables.documents(s, dir))
      val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("c"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val n = counts.values.sum
      val shares = counts.map { case (l, c) => l -> math.sqrt(c.toDouble / n) }
      val mx = shares.values.max
      val rates = shares.map { case (l, sh) => l -> sh / mx }
      operators.Mixing.sampleStrata(docs, "lang", rates)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(TextFunctions.tokenCount(col("text")).cast("bigint")).as("total_tokens"))
        .orderBy(col("lang"))
    }),
    "q153_corpus_build" -> ((s, dir) =>
      // the composed corpus-build capstone: temperature mix -> exact dedup
      // -> near-dup components -> decontaminate -> pack -> dataset card,
      // every stage staged to storage (IterState.copyOut) and every
      // stage's cardinality pinned in the one-row card — the integration
      // query a user of this engine runs first. See operators.CorpusBuild.
      operators.CorpusBuild.card(Parallelize.ensure(Tables.documents(s, dir)))),
    "q154_planted_corpus_build" -> ((s, dir) =>
      // q153's sf1 companion (the q143/q144 discipline): the SAME composed
      // operator over corpus+planted, card sliced to the planted stratum,
      // where every stage's cardinality is derivable from the construction
      // plus the corpus lang counts — no quadratic oracle stage. Planted
      // vocabulary is disjoint from the organic corpus, so planted docs
      // never pair, never contaminate, and their mix verdict is pure
      // Knuth-hash arithmetic on explicit ids.
      operators.CorpusBuild.card(
        Parallelize.ensure(Tables.documents(s, dir)).unionByName(Planted.docs(s)),
        slice = col("doc_id") >= lit(Planted.base))),
    "q155_quality_classifier" -> ((s, dir) =>
      // fastText-style hashed-n-gram quality filter (Joulin EACL'17): per
      // doc, the integer margin of a linear scorer over hashed unigram +
      // bigram features — rolling-31 feature hash mod 1000003, weight
      // (h mod 2001) - 1000, all exact integer arithmetic so DuckDB
      // replays every margin bit-for-bit (q98's micro-unit discipline);
      // keep ⟺ margin > 0 ⟺ sigmoid(margin) > 0.5 (monotone). ONE
      // codegen'd static call per row, no explode/UDF/shuffle — a
      // map-only scan at 100 TB. See functions.QualityKernels.
      Parallelize.ensure(Tables.documents(s, dir))
        .select(col("doc_id"), col("lang"),
          graft.functions.QualityExprs.qualityMargin(col("text"))
            .as("margin_units"))
        .withColumn("kept", col("margin_units") > 0)
        .orderBy(col("doc_id"))),
    "q151_int8_quant" -> ((s, dir) =>
      // embedding compression: symmetric per-vector int8 quantization +
      // the dequantized dot product of the compressed search path. The
      // codes are integers from ONE mirrored float expression, so code
      // sums and weighted sums compare exactly; the dequantization error
      // is TRUE-gated against 2x its analytic bound (Int8Quant scaladoc).
      graft.similarity.Int8Quant.audit(Tables.embeddings(s, dir))
        .orderBy(col("vec_id"))),
    "q150_bpe_encode" -> ((s, dir) => {
      // the encoding half of the tokenizer: train the 8 merges (q149),
      // then count each document's subword tokens under them. The merge
      // chain runs over the DISTINCT token table only, joined back onto
      // the token stream (vocab-join shape); the oracle re-derives the
      // merges AND the per-token subword sizes in SQL.
      val docs = Parallelize.ensure(Tables.documents(s, dir))
      // training via the DISTILLED path (one distributed word-table pass +
      // driver-side merge loop) instead of the batched cluster loop: the
      // two are bit-identical by construction (BpeTrainerSpec pins the
      // equality to exhaustion; q197 gates the distilled path against the
      // q192 closed-form schedule), and this query's subject is the
      // ENCODING — the batched trainer keeps its own dedicated gates
      // (q149/q181/q192). Saves the per-wave distributed pair-count jobs.
      val merges = graft.operators.BpeTrainer.learnMergesDistilled(docs, nMerges = 8)
        .collect().map(r => (r.getString(1), r.getString(2))).toSeq
      graft.operators.BpeTrainer.subwordCounts(docs, merges)
        .orderBy(col("doc_id"))
    }),
    "q148_hybrid_rrf" -> ((s, dir) => {
      // hybrid retrieval for RAG: a BM25 lexical ranking (q98's
      // exact-micros arithmetic, per-query terms = tokens 1/3/5/7/9 of
      // the query doc) and a dense cosine ranking (q24's brute-force
      // contract; vec_id ≡ doc_id parallel-array fixture) fused by
      // reciprocal-rank fusion in exact integer micro-units
      // (operators.Rrf — no float ever decides an order). Scale shape:
      // both rankers keep their own shapes (isin-pruned postings +
      // bounded top-k agg; broadcast query vectors); the fusion runs
      // over k-bounded per-query groups only.
      import graft.operators.Rrf
      val d = Parallelize.ensure(Tables.documents(s, dir))
        .select(col("doc_id"),
          TextFunctions.tokenCount(col("text")).cast("bigint").as("dl"),
          split(trim(col("text")), " +").as("toks"))
      val qterms = d.filter(col("doc_id") < 3)
        .select(col("doc_id").as("query_id"),
          explode(array(Seq(1, 3, 5, 7, 9)
            .map(p => element_at(col("toks"), p)): _*)).as("token"))
        .filter(col("token").isNotNull && length(col("token")) > 0)
        .distinct()
      val stats = d.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
      val tf = d.select(col("doc_id"), col("dl"), explode(col("toks")).as("token"))
        .join(broadcast(qterms), Seq("token"))
        .groupBy(col("query_id"), col("doc_id"), col("token"))
        .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
      val dfreq = tf.groupBy(col("query_id"), col("token"))
        .agg(count(lit(1)).as("df"))
      val nd = col("n_docs").cast("double")
      val micros = tf.join(broadcast(dfreq), Seq("query_id", "token"))
        .crossJoin(broadcast(stats))
        .withColumn("idf", log(lit(1.0)
          + (nd - col("df").cast("double") + 0.5)
            / (col("df").cast("double") + 0.5)))
        .withColumn("contrib", col("idf") * (col("tf").cast("double") * lit(2.2))
          / (col("tf").cast("double")
            + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl").cast("double")
              / (col("sum_dl").cast("double") / nd))))
        .select(col("query_id"), col("doc_id"),
          round(col("contrib") * 1e6).cast("bigint").as("m"))
      // per-query bounded top-20 via the algebraic aggregator (map-side
      // partial top-k): micros are exact in double far beyond this range
      val bm25 = micros.groupBy(col("query_id"), col("doc_id"))
        .agg(sum(col("m")).as("score_micros"))
        .groupBy(col("query_id"))
        .agg(graft.similarity.TopKAggregator.topK(20)(
          col("doc_id"), col("score_micros").cast("double")).as("top"))
        .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "s")))
        .select(col("query_id"), col("s.id").as("doc_id"),
          (col("pos") + 1).cast("int").as("rank"))
      val dense = graft.similarity.Knn.bruteForce(Tables.embeddings(s, dir),
          Tables.embeddings(s, dir).filter(col("vec_id") < 3), k = 20)
        .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rank"))
      Rrf.fuse(Seq(bm25, dense), topN = 10)
        .join(bm25.withColumnRenamed("rank", "r_bm25"),
          Seq("query_id", "doc_id"), "left")
        .join(dense.withColumnRenamed("rank", "r_dense"),
          Seq("query_id", "doc_id"), "left")
        .select(col("query_id"), col("doc_id"), col("r_bm25"), col("r_dense"),
          col("rrf_micros"), col("n_lists"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),
    "q147_bigstar_components" -> ((s, dir) => {
      // the alternating large-star/small-star component algorithm
      // (Kiveris et al., SoCC'14) over the SAME pair graph as q141 PLUS
      // three planted long-chain components (paths of 40/50/60 vertices,
      // explicit arithmetic edges): min-label propagation would need
      // ~length rounds on those; star rewriting closes them in ~log
      // rounds and must land on identical canonicals. Gated like q141:
      // closed-form expected rows, real operator over the full corpus.
      val docs = Parallelize.ensure(Tables.documents(s, dir))
        .unionByName(Planted.docs(s))
      val pairs = MinHashLSH.nearDuplicatePairs(docs, threshold = 0.3)
        .select(col("id1"), col("id2"))
      graft.dedup.BigStar
        .canonicalAssignments(pairs.unionByName(Planted.chainEdges(s)))
        .filter(col("doc_id") >= Planted.base)
        .orderBy(col("doc_id"))
    }),
    "q146_planted_editdist" -> ((s, dir) =>
      // q136's operator (SymSpell deletion-variant blocking + exact
      // levenshtein verify) over customer+planted names; tripled 2-digit
      // group tags keep cross-group distances >= 2
      graft.dedup.EditDistanceJoin
        .similarPairs(Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_name"))
          .unionByName(Planted.customers(s)), "c_custkey", "c_name")
        .filter(col("id1") >= Planted.base)
        .orderBy(col("id1"), col("id2"))),
    // --- full iterative K-means + elbow (rows-only: not SQL-expressible) ---
    "q40_kmeans_full" -> ((s, dir) => {
      val pts = eventPoints(s, dir)
      val res = KMeansMR.fit(pts, Seq("hour", "dow"), kmCentroids, maxIter = 10)
      import s.implicits._
      res.centroids.zipWithIndex
        .map { case (c, i) => (i, c(0), c(1), res.iterations, res.converged) }
        .toSeq.toDF("cluster", "hour", "dow", "iterations", "converged")
    }),
    "q43_kmeans_rdd" -> ((s, dir) => {
      // the reference's literal MapReduce form; must agree with q40
      val pts = eventPoints(s, dir)
      val res = graft.segmentation.KMeansRDD.fit(pts, Seq("hour", "dow"), kmCentroids, maxIter = 10)
      import s.implicits._
      res.centroids.zipWithIndex
        .map { case (c, i) => (i, c(0), c(1), res.iterations, res.converged) }
        .toSeq.toDF("cluster", "hour", "dow", "iterations", "converged")
    }),
    "q41_elbow_sweep" -> ((s, dir) => {
      // WCSS-per-k + elbow pick over FIXED exported centroids (see
      // [[sweepCentroids]]) — the oracle-able recomputation half of the elbow
      // method. All six per-k WCSS sums run as ONE single-pass aggregate (6
      // codegen'd min-sq-dist sums, no per-k jobs); the collect is one row of
      // six doubles, and the diff2/argmin arithmetic reuses Elbow.elbowK.
      // The MLlib fit half (centroid training) stays covered by ElbowSpec +
      // the Pipelines driver — its seed-internal centroids are exactly what
      // a SQL oracle cannot replay.
      val pts = eventPoints(s, dir)
      val aggs = sweepCentroids.map { case (k, cs) =>
        sum(KMeansMR.minSqDistExpr(Seq(col("hour")), cs)).as(s"wcss_$k") }
      val row = pts.agg(aggs.head, aggs.tail: _*).collect()(0)
      val wcss = sweepCentroids.map { case (k, _) => row.getAs[Double](s"wcss_$k") }
      val elbow = Elbow.elbowK(wcss)
      import s.implicits._
      sweepCentroids.map(_._1).zip(wcss)
        .map { case (k, w) => (k, w, elbow) }
        .toDF("k", "wcss", "elbow_k")
        .orderBy(col("k"))
    }),
    "q42_segmentation_pipeline" -> ((s, dir) => {
      val feats = Pipelines.ordersFeatures(s, dir)
      feats.groupBy(col("days"), col("order_dow_updated"))
        .agg(count(lit(1)).as("n")).orderBy(col("days"))
    }),
    "q57_session_windows" -> ((s, dir) =>
      graft.streaming.EventsStream.sessionWindows(Tables.events(s, dir))),
    "q72_stream_milestones" -> ((s, dir) =>
      graft.streaming.EventsStream.milestoneCountsBounded(s, dir)),
    "q81_milestones_restart" -> ((s, dir) =>
      // q75's custom-state sibling: the flatMapGroupsWithState running-cents
      // state must survive a checkpoint restart — lost state re-emits
      // crossed milestones, so the per-user counts (q72's oracle) catch it
      graft.streaming.EventsStream.milestoneCountsRestart(s, dir)),
    // --- reproducible split + quality gating (training-data pipeline ops) ---
    "q58_train_val_split" -> ((s, dir) =>
      // deterministic mod-split: the reproducible train/val/test assignment a
      // pipeline needs (same row -> same split on every run and every engine)
      Parallelize.ensure(Tables.documents(s, dir))
        .withColumn("split",
          when(pmod(col("doc_id"), lit(10)) < 8, "train")
            .when(pmod(col("doc_id"), lit(10)) === 8, "val")
            .otherwise("test"))
        .groupBy(col("split"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(TextFunctions.tokenCount(col("text")).cast("bigint")).as("total_tokens"))
        .orderBy(col("split"), col("lang"))),
    "q59_quality_topk" -> ((s, dir) => {
      // quality filtering: keep the top-5 docs per language by heuristic
      // quality score (rounded before ranking so the oracle ranks the same
      // values; ties break by doc_id). Uses the bounded top-k AGGREGATE, not
      // a ranking window: lang has a handful of values, so a window would
      // sort a few giant partitions at scale — the algebraic aggregate
      // reduces every map partition to k rows before the exchange.
      val d = Parallelize.ensure(Tables.documents(s, dir))
      d.select(col("doc_id"), col("lang"),
          TextFunctions.qualityScore(col("text")).as("quality"))
        .groupBy(col("lang"))
        .agg(graft.similarity.TopKAggregator.topK(5)(col("doc_id"), col("quality")).as("top"))
        .select(col("lang"), posexplode(col("top")).as(Seq("pos", "s")))
        .select(col("s.id").as("doc_id"), col("lang"),
          col("s.score").as("quality"), (col("pos") + 1).cast("int").as("rank"))
        .orderBy(col("lang"), col("rank"))
    }),
    "q78_repetition_filter" -> ((s, dir) => {
      // Gopher-style repetition gate: the fraction of a doc's word 2-grams
      // that are repeats (1 - distinct/total) flags boilerplate and
      // degenerate generations. The distinct count rides the codegen'd
      // shingle kernel (64-bit hashes — collision odds ~(grams²)/2⁶⁴ per
      // doc, nil at any corpus size); total is just n_tokens - 1. Narrow
      // per-row compute, one lang-keyed agg: zero extra shuffles at 100 TB.
      // Both engines compute ratio as the SAME two-int division, so the
      // double (and the 0.2 threshold verdict) is bit-identical. Every 13th
      // doc is replaced by a degenerate one-token-repeated text (planted
      // identically in the oracle) so the >0.2 flag is non-vacuous on a
      // corpus whose natural docs are all below it.
      // staged projections (ptext/toks/n_tok): each is referenced more than
      // once downstream, and inlining them would re-evaluate the planted-
      // text CASE + regex split 4x per row (the round-1 CollapseProject
      // lesson — multi-referenced non-cheap aliases survive as a Project)
      val d = Parallelize.ensure(Tables.documents(s, dir))
        .withColumn("ptext", when(pmod(col("doc_id"), lit(13)) === 0,
          trim(repeat(concat(lit("rep"), pmod(col("doc_id"), lit(5)).cast("string"),
            lit(" ")), 40)))
          .otherwise(col("text")))
        .withColumn("toks", split(trim(col("ptext")), " +"))
        .withColumn("n_tok", when(length(trim(col("ptext"))) === 0, 0)
          .otherwise(size(col("toks"))))
      val ratio = when(col("n_tok") >= 2,
        lit(1.0) - size(MinHashExprs.shingleHashes(col("toks"), 2)).cast("double")
          / (col("n_tok") - 1).cast("double"))
        .otherwise(lit(0.0))
      d.select(col("lang"), ratio.as("ratio"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum((col("ratio") > 0.2).cast("long")).as("n_flagged"),
          round(max(col("ratio")), 6).as("max_ratio"))
        .orderBy(col("lang"))
    }),
    "q79_pii_scrub" -> ((s, dir) => {
      // PII scrubbing pass: count and redact email addresses. Every 5th doc
      // gets a deterministic planted address (both engines plant the SAME
      // string) so the gate is non-vacuous regardless of corpus content.
      // The pattern avoids Java-vs-RE2 divergence (char classes + greedy
      // quantifiers only). Narrow per-row regex + one lang agg — the scrub
      // itself is shuffle-free at any scale.
      val pii = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val planted = when(pmod(col("doc_id"), lit(5)) === 0,
        concat(col("text"), lit(" contact: user"),
          col("doc_id").cast("string"), lit("@example.com")))
        .otherwise(col("text"))
      Parallelize.ensure(Tables.documents(s, dir))
        .select(col("lang"),
          regexp_count(planted, lit(pii)).as("n_pii"),
          (length(planted) - length(regexp_replace(planted, pii, "[EMAIL]")))
            .as("redacted"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum((col("n_pii") > 0).cast("long")).as("n_docs_with_pii"),
          sum(col("n_pii").cast("long")).as("n_matches"),
          sum(col("redacted").cast("long")).as("chars_redacted"))
        .orderBy(col("lang"))
    }),
    "q80_contamination" -> ((s, dir) => {
      // benchmark-decontamination check: a "training" doc (doc_id >= 50) is
      // contaminated if it shares any word 8-gram with the "eval" set
      // (doc_id < 50) — the standard n-gram-overlap rule. Spark side joins
      // 64-bit shingle hashes from the codegen kernel (short docs fall back
      // to the whole joined text, mirroring q22's shingle contract); the
      // eval side is tiny by nature, so the semi-join BROADCASTS — the scan
      // of the 100 TB training side never shuffles. The oracle joins the
      // gram strings themselves; 64-bit collisions across eval×train gram
      // pairs are ~1e-9 at any tested scale.
      val d = Parallelize.ensure(Tables.documents(s, dir))
      val grams = explode(MinHashExprs.shingleHashes(
        split(trim(col("text")), " +"), 8)).as("g")
      val evalGrams = d.filter(col("doc_id") < 50).select(grams).distinct()
      val trainHits = d.filter(col("doc_id") >= 50)
        .select(col("doc_id"), grams)
        .join(broadcast(evalGrams), Seq("g"), "left_semi")
        .select(col("doc_id")).distinct()
        .withColumn("hit", lit(1L))
      d.filter(col("doc_id") >= 50).select(col("doc_id"), col("lang"))
        .join(trainHits, Seq("doc_id"), "left")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_train_docs"),
          sum(coalesce(col("hit"), lit(0L))).as("n_contaminated"))
        .orderBy(col("lang"))
    }),
    "q85_incremental_dedup" -> ((s, dir) => {
      // incremental ingestion: a new batch (doc_id >= 250 here) lands only
      // if its content hash is unseen in the already-ingested corpus
      // (doc_id < 250) and unseen within the batch itself (min-id
      // canonical). Anti-join on md5 — the O(new-batch) incremental form of
      // exact dedup: the ingested side ships only its hash column (16
      // bytes/doc), never its payload, so daily increments against a 100 TB
      // corpus stay cheap.
      val docs = Parallelize.ensure(Tables.documents(s, dir))
      val ingested = docs.filter(col("doc_id") < 250)
        .select(md5(col("text")).as("h")).distinct()
      val batch = ExactDedup.deduplicate(docs.filter(col("doc_id") >= 250))
        .withColumn("h", md5(col("text")))
      batch.join(ingested, Seq("h"), "left_anti")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_new_docs"),
          sum(col("n_chars").cast("bigint")).as("sum_chars"))
        .orderBy(col("lang"))
    }),
    "q90_bloom_incremental_dedup" -> ((s, dir) => {
      // q85's incremental dedup with a Bloom-prefilter index: the ingested
      // side is summarized into an 8 KiB bitset (vs 16 B/doc hashes), rows
      // the filter rejects are DEFINITELY new and skip the anti-join
      // entirely, and the exact verify runs only over the flagged sliver
      // (true dups + false positives). Bloom filters have no false
      // negatives, so the result is exactly q85's — same oracle SQL, hash
      // compared. The bitset collect is one k-sized row (the same driver
      // pattern as broadcast centroids); at 100 TB the filter is built once
      // per increment and OR-merged forward, never rescanning the corpus.
      val docs = Parallelize.ensure(Tables.documents(s, dir))
      val ingested = docs.filter(col("doc_id") < 250)
        .select(md5(col("text")).as("h")).distinct()
      val bits = ingested
        .agg(BloomFilter.bloomAgg(xxhash64(col("h")), 1 << 16).as("bf"))
        .collect()(0).getAs[Array[Byte]](0)
      val batch = ExactDedup.deduplicate(docs.filter(col("doc_id") >= 250))
        .withColumn("h", md5(col("text")))
      val probe = BloomFilter.mightContain(lit(bits), xxhash64(col("h")))
      val definitelyNew = batch.filter(!probe)
      val verifiedNew = batch.filter(probe).join(ingested, Seq("h"), "left_anti")
      definitelyNew.unionByName(verifiedNew)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_new_docs"),
          sum(col("n_chars").cast("bigint")).as("sum_chars"))
        .orderBy(col("lang"))
    }),
    "q91_cms_heavy_hitters" -> ((s, dir) => {
      // count-min sketch frequency estimates for a fixed probe vocabulary —
      // the mergeable-sketch form of heavy-hitter counting (token counts
      // at 100 TB are a groupBy over billions of distinct tokens; a CMS is
      // a few KB of algebraic state that partial-aggregates map-side, and
      // stored sketches merge across days like the HLL rollup in q67).
      // Spark's built-in count_min_sketch aggregate (org.apache.spark.util
      // .sketch) builds the table; the TRUE-gate asserts the CMS contract
      // per probe: estimate >= exact (one-sided error, always) and
      // estimate <= exact + eps*N (within the sketch's additive bound).
      // Exact per-probe counts ship alongside so the oracle re-derives
      // them from its own tokenization — booleans AND counts hash-compare.
      val probes = Seq("join", "hash", "row", "batch", "scan", "filter",
        "vector", "data", "merge", "order", "zz_absent_token")
      val toks = Parallelize.ensure(Tables.documents(s, dir))
        .select(explode(split(trim(col("text")), " +")).as("token"))
      val eps = 0.0005
      val agg = toks.agg(
        count_min_sketch(col("token"), lit(eps), lit(0.99), lit(42)).as("cms"),
        count(lit(1)).as("n")).collect()(0)
      val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
        new java.io.ByteArrayInputStream(agg.getAs[Array[Byte]]("cms")))
      val nTotal = agg.getAs[Long]("n")
      val exact = toks.filter(col("token").isin(probes: _*))
        .groupBy(col("token")).count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val rows = probes.sorted.map { t =>
        val ex = exact.getOrElse(t, 0L)
        val est = cms.estimateCount(t)
        (t, ex, est >= ex, est <= ex + (eps * nTotal).toLong)
      }
      import s.implicits._
      rows.toDF("token", "n_exact", "lower_ok", "upper_ok")
        .orderBy(col("token"))
    }),
    "q92_weighted_sample" -> ((s, dir) => {
      // quality-weighted stratified sampling (Efraimidis–Spirakis): docs
      // with more content get a higher inclusion weight {1,2,4}; exactly
      // 10 winners per language by the deterministic A-ES key. sqrt-chain
      // keys are bit-exact cross-engine (see operators.WeightedSample), so
      // the oracle mirrors score AND pick hash-exactly — no rounding.
      val d = Parallelize.ensure(Tables.documents(s, dir))
      val weight = when(col("n_chars") > 500, lit(4))
        .when(col("n_chars") > 200, lit(2)).otherwise(lit(1))
      graft.operators.WeightedSample.topKPerStratum(
        d.select(col("doc_id"), col("lang"), col("n_chars")),
        "lang", weight, k = 10)
    }),
    "q93_semantic_dedup" -> ((s, dir) => {
      // semantic dedup (SemDeDup-style): embedding-space near-duplicate
      // pairs from sign-LSH + exact-cosine verify (q55's kernel), resolved
      // to one canonical representative per semantic cluster by min-label
      // connected components (q65's kernel) — the embedding-space composed
      // pipeline a training corpus runs after exact/text dedup. Planted
      // exact copies (vec_id+1000000) make recall deterministic; the
      // oracle recomputes pairs brute-force and closes them with a
      // recursive CTE. Scale shape: both stages are the already-audited
      // banded-bucket join and 1-join-per-round propagation; nothing new
      // shuffles all-pairs.
      val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
      val planted = emb.filter(col("vec_id") < 20)
        .select((col("vec_id") + 1000000).as("vec_id"), col("embedding"))
      val pairs = graft.similarity.CosineLSH.nearDuplicatePairs(
        emb.unionByName(planted), threshold = 0.99)
      graft.dedup.ConnectedComponents.canonicalAssignments(pairs)
        .select(col("doc_id").as("vec_id"), col("canonical_id"))
        .orderBy(col("vec_id"))
    }),
    "q115_feature_correlation" -> ((s, dir) => {
      // per-type Pearson correlation between event value (cents) and hour
      // of day, derived ENTIRELY from exact long sums (n, sx, sy, sxy,
      // sxx, syy) in one partial-agg pass — q84's exact-moment rule
      // extended to covariance. The final rho is the same double
      // expression over the same exact integers on both engines, rounded
      // to 6dp. One shuffle of six-long rows per type at any scale.
      val ev = Tables.events(s, dir)
        .select(col("event_type"),
          round(col("value") * 100).cast("long").as("x"),
          hour(col("ts")).cast("long").as("y"))
      // q84's rule: product sums accumulate in DECIMAL — long x*x already
      // wraps silently at ~1e12 rows of 5-digit cents; decimal(19,0)
      // operands make the sums decimal(38,0) exact (DuckDB's HUGEINT sums
      // are exact already, and only the derived rho is compared)
      val xd = col("x").cast("decimal(19,0)")
      val yd = col("y").cast("decimal(19,0)")
      ev.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(xd).as("sx"), sum(yd).as("sy"),
          sum(xd * yd).as("sxy"),
          sum(xd * xd).as("sxx"),
          sum(yd * yd).as("syy"))
        .withColumn("rho", round(
          (col("n").cast("double") * col("sxy").cast("double")
            - col("sx").cast("double") * col("sy").cast("double"))
            / sqrt((col("n").cast("double") * col("sxx").cast("double")
                - col("sx").cast("double") * col("sx").cast("double"))
              * (col("n").cast("double") * col("syy").cast("double")
                - col("sy").cast("double") * col("sy").cast("double"))), 6))
        .select(col("event_type"), col("n"), col("rho"))
        .orderBy(col("event_type"))
    }),
    "q113_rolling_anomaly" -> ((s, dir) => {
      // ROLLING-window anomaly gate — q84's exact-moment z-score in its
      // trailing-100-events form (the batch shape of online anomaly
      // detection): per type, ordered by (ts, event_id), a row is
      // anomalous when it sits 3 sigma outside ITS OWN trailing window's
      // moments. Sums and square-sums accumulate as exact longs inside
      // the frame (cents <= 1e4, 100-row frame — far inside long), so
      // both engines derive identical doubles and identical verdicts.
      // Only full frames judge (n = 100), keeping the gate warm-up-free.
      // SCALE: the naive form partitions the window by event_type (~5
      // distinct values) — cardinality-bounded parallelism, each type's
      // full history sorted in ONE task. This is the frame-carryover
      // split instead (operators.RollingWindow): rows chunk by a
      // data-derived time width, each chunk replays its trailing 99 rows
      // into the next, the window runs per (type, chunk) — bit-identical
      // moments (RollingWindowSpec proves it against the naive plan),
      // task count grows with the data. The oracle keeps the naive SQL
      // formulation, so the gate cross-checks the split every run.
      val ev = Tables.events(s, dir)
        .select(col("event_type"), col("event_id"), col("ts"), col("ts_ns"),
          round(col("value") * 100).cast("long").as("cents"))
      val stats = graft.operators.RollingWindow.trailingMoments(
          ev, "event_type", "ts", "event_id", "ts_ns", "cents", 100)
        .filter(col("n") === 100)
        .withColumn("mean", col("sm").cast("double") / col("n").cast("double"))
        .withColumn("variance",
          (col("sq").cast("double")
            - col("sm").cast("double") * col("sm").cast("double") / col("n").cast("double"))
            / col("n").cast("double"))
      stats.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_windows"),
          sum((abs(col("cents").cast("double") - col("mean"))
            > lit(3.0) * sqrt(col("variance"))).cast("long")).as("n_anomalies"))
        .orderBy(col("event_type"))
    }),
    "q118_gdpr_purge" -> ((s, dir) => {
      // right-to-be-forgotten sweep with reconciliation: a deterministic
      // deletion list (user_id % 17 == 0) anti-joins the event store, and
      // a derived daily rollup is recomputed post-purge — the output
      // reconciles all three (before, purged, after == rollup total) so a
      // purge that missed a derived table shows up as an inequality, not
      // a silent pass. The deletion list ships as ids only (the q85
      // hash-index rule: the purge side never carries payloads).
      val ev = Tables.events(s, dir)
      val dels = ev.filter(pmod(col("user_id"), lit(17)) === 0)
        .select(col("user_id")).distinct()
      val purged = ev.join(dels, Seq("user_id"), "left_anti")
      val rollup = purged.groupBy(col("event_type"), to_date(col("ts")).as("d"))
        .agg(count(lit(1)).as("n"))
      val after = purged.groupBy(col("event_type")).agg(count(lit(1)).as("n_after"))
      val before = ev.groupBy(col("event_type")).agg(count(lit(1)).as("n_before"))
      val viaRollup = rollup.groupBy(col("event_type"))
        .agg(sum(col("n")).as("n_after_rollup"))
      before.join(after, Seq("event_type")).join(viaRollup, Seq("event_type"))
        .select(col("event_type"), col("n_before"),
          (col("n_before") - col("n_after")).as("n_purged"),
          col("n_after"), col("n_after_rollup"))
        .orderBy(col("event_type"))
    }),
    "q119_user_sessions" -> ((s, dir) => {
      // batch gaps-and-islands sessionization (the batch twin of q57's
      // session_window): a session breaks when a user's gap from their
      // previous event reaches 30 minutes. lag + cumulative-sum windows
      // partition BY USER — per-user state only, no global sort; the
      // (ts, event_id) tiebreak keeps the island numbering engine-agreed,
      // and microsecond timestamp arithmetic is exact on both engines.
      val byUser = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("ts"))
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("new_session",
          (col("prev_ts").isNull ||
            col("ts") >= col("prev_ts") + expr("INTERVAL 30 MINUTES")).cast("long"))
        .withColumn("session_id", sum(col("new_session")).over(byUser))
      ev.groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_ev"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_sessions"),
          sum(col("n_ev")).as("n_events"),
          max(col("n_ev")).as("longest_session_events"))
        .orderBy(col("user_id"))
    }),
    "q120_cohort_retention" -> ((s, dir) => {
      // acquisition-cohort retention matrix: a user's cohort is the week
      // of their FIRST signup event; retention is the share of that
      // cohort active (any event) in each week at or after signup. Scale
      // shape: two user_id-keyed shuffles (per-user signup min, per-
      // (user, week) distinct) do all the heavy lifting; the cohort-size
      // join touches only week-count-sized aggregates. The division is
      // one deterministic double op rounded to 6dp on both engines.
      val ev = Tables.events(s, dir)
      val wk = to_date(date_trunc("week", col("ts")))
      val su = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(wk).as("cohort_week"))
      val act = ev.select(col("user_id"), wk.as("active_week")).distinct()
        .join(su, Seq("user_id"))
        .filter(col("active_week") >= col("cohort_week"))
      val cs = su.groupBy(col("cohort_week")).agg(count(lit(1)).as("cohort_users"))
      act.groupBy(col("cohort_week"), col("active_week"))
        .agg(count(lit(1)).as("active_users"))
        .join(cs, Seq("cohort_week"))
        .select(col("cohort_week"),
          expr("CAST(datediff(active_week, cohort_week) / 7 AS BIGINT)").as("week_no"),
          col("active_users"), col("cohort_users"),
          round(col("active_users").cast("double") / col("cohort_users"), 6)
            .as("retention"))
        .orderBy(col("cohort_week"), col("week_no"))
    }),
    "q121_scd2_runs" -> ((s, dir) => {
      // SCD-2 style change-history compaction: consecutive events with
      // the same event_type per user collapse into one validity interval
      // [valid_from, valid_to] with an is_current flag on the final run —
      // gaps-and-islands on VALUE CHANGE (q119 is the time-gap twin, and
      // the same (ts, event_id) tiebreak keeps both engines' numbering
      // identical). All three windows partition by user_id: per-user
      // state only, never a global sort.
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val byUser = Window.partitionBy(col("user_id"))
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .withColumn("chg",
          (col("prev_type").isNull || col("prev_type") =!= col("event_type"))
            .cast("long"))
        .withColumn("run_seq", sum(col("chg")).over(w))
        .groupBy(col("user_id"), col("run_seq"), col("event_type"))
        .agg(min(col("ts")).as("valid_from"), max(col("ts")).as("valid_to"),
          count(lit(1)).as("n_ev"))
        .withColumn("is_current",
          col("valid_to") === max(col("valid_to")).over(byUser))
        .orderBy(col("user_id"), col("run_seq"))
    }),
    "q122_hourly_gap_fill" -> ((s, dir) => {
      // time-series gap-fill: the per-type hourly count series with
      // missing hours zero-filled. Raw events are touched by exactly one
      // aggregation; the dense (type x hour) grid grows only with the
      // time range (never with event volume), generated from a 1-row
      // bounds aggregate via sequence() — the span/step ratio is bounded
      // by the data's own time range, so the explode cannot run away
      // (the RangeJoin.bucketed concern does not apply). The fill join's
      // small side stays broadcastable at any corpus scale.
      val ev = Tables.events(s, dir)
      val hourly = ev
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
        .agg(count(lit(1)).as("n"))
      val bounds = ev.agg(date_trunc("hour", min(col("ts"))).as("h0"),
        date_trunc("hour", max(col("ts"))).as("h1"))
      val grid = ev.select(col("event_type")).distinct()
        .crossJoin(broadcast(bounds))
        .select(col("event_type"),
          explode(expr("sequence(h0, h1, interval 1 hour)")).as("h"))
      grid.join(hourly, Seq("event_type", "h"), "left")
        .select(col("event_type"), col("h"),
          coalesce(col("n"), lit(0L)).as("n"))
        .orderBy(col("event_type"), col("h"))
    }),
    "q123_triangle_count" -> ((s, dir) => {
      // triangle counting over the part co-purchase graph (parts sharing
      // an order). The edge build groups lineitems by order and emits the
      // sorted-distinct part pairs MAP-SIDE (one narrow groupBy exchange;
      // per-order fan-out is quadratic only in ORDER SIZE, capped at 7
      // lineitems by TPC-H) — the r11 order-keyed self-join read lineitem
      // twice and shuffled both sides to produce the same pair set. Edges
      // are then oriented low→high under the total order (degree, id) —
      // the classic wedge bound: every wedge apex is the LOWEST-degree
      // vertex of its triangle, so hub vertices never enumerate their
      // neighbor pairs and the wedge join stays ~O(m^1.5) instead of
      // sum-of-degree-squares. The oracle counts the same triangles under
      // plain id orientation — orientation choice cannot change the set
      // of triangles, only the join cost.
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      val pairs = li.groupBy(col("ok"))
        .agg(sort_array(collect_set(col("pk"))).as("ps"))
        .select(explode(flatten(transform(col("ps"), (x, i) =>
          transform(slice(col("ps"), i + lit(2), size(col("ps")) - i - lit(1)),
            y => struct(x.as("a"), y.as("b")))))).as("p"))
        .select(col("p.a").as("a"), col("p.b").as("b"))
      val perVertex = graft.operators.Triangles.perVertexCounts(pairs)
        .withColumnRenamed("v", "part")
      val total = perVertex.agg((sum(col("n_tri")) / 3).cast("long")
        .as("total_triangles"))
      perVertex.crossJoin(broadcast(total))
        .orderBy(col("n_tri").desc, col("part")).limit(20)
    }),
    "q124_trend_fit" -> ((s, dir) => {
      // per-type OLS trend of event value (cents) over hour-index:
      // closed-form slope/intercept from the same exact-moment rule as
      // q115 — one partial-agg pass of five DECIMAL sums per type, the
      // hour index anchored to a broadcast 1-row global-min aggregate so
      // x stays a small integer and every product is exact. Slope and
      // intercept are single double expressions over exact integers,
      // 6dp-rounded identically on both engines.
      val ev0 = Tables.events(s, dir)
      val h0 = ev0.agg(date_trunc("hour", min(col("ts"))).as("h0"))
      val ev = ev0.crossJoin(broadcast(h0))
        .select(col("event_type"),
          ((unix_timestamp(date_trunc("hour", col("ts")))
            - unix_timestamp(col("h0"))) / 3600).cast("long").as("x"),
          round(col("value") * 100).cast("long").as("y"))
      val xd = col("x").cast("decimal(19,0)")
      val yd = col("y").cast("decimal(19,0)")
      val nD = col("n").cast("double")
      val denom = nD * col("sxx").cast("double") -
        col("sx").cast("double") * col("sx").cast("double")
      ev.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(xd).as("sx"), sum(yd).as("sy"),
          sum(xd * yd).as("sxy"), sum(xd * xd).as("sxx"))
        .select(col("event_type"), col("n"),
          round((nD * col("sxy").cast("double")
            - col("sx").cast("double") * col("sy").cast("double")) / denom, 6)
            .as("slope_cents_per_hour"),
          round((col("sy").cast("double") * col("sxx").cast("double")
            - col("sx").cast("double") * col("sxy").cast("double")) / denom, 6)
            .as("intercept_cents"))
        .orderBy(col("event_type"))
    }),
    "q125_lang_drift" -> ((s, dir) => {
      // corpus distribution drift: Laplace-smoothed language distributions
      // of two sources (lexicographic min/max source name, derived from a
      // broadcast 1-row aggregate — no hardcoded source list) compared
      // per-language by KL contribution p*ln(p/q). Emitting PER-LANGUAGE
      // terms instead of their float sum keeps the output order-
      // independent: each row is integer counts + one division + one ln,
      // bit-identical on both engines (the q82 ln-parity precedent).
      val d = Tables.documents(s, dir)
      val srcs = d.agg(min(col("source")).as("sa"), max(col("source")).as("sb"))
      val counts = d.groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("c"))
        .crossJoin(broadcast(srcs))
      val cA = counts.filter(col("source") === col("sa"))
        .select(col("lang"), col("c").as("ca"))
      val cB = counts.filter(col("source") === col("sb"))
        .select(col("lang"), col("c").as("cb"))
      val joined = d.select(col("lang")).distinct()
        .join(cA, Seq("lang"), "left").join(cB, Seq("lang"), "left")
        .na.fill(0L, Seq("ca", "cb"))
      val tot = joined.agg(sum(col("ca")).as("ta"), sum(col("cb")).as("tb"),
        count(lit(1)).as("k"))
      val p = (col("ca") + 1).cast("double") / (col("ta") + col("k")).cast("double")
      val q = (col("cb") + 1).cast("double") / (col("tb") + col("k")).cast("double")
      joined.crossJoin(broadcast(tot))
        .select(col("lang"), col("ca"), col("cb"),
          round(p, 6).as("p_smoothed"), round(q, 6).as("q_smoothed"),
          round(p * log(p / q), 6).as("kl_term"))
        .orderBy(col("lang"))
    }),
    "q126_dq_audit" -> ((s, dir) => {
      // data-quality expectation audit (the deequ-style contract check a
      // pipeline runs before training): referential integrity via anti-
      // joins that ship only key columns, uniqueness via a count-vs-
      // distinct pass, and domain checks as single filters — each check
      // is one k-row aggregate, unioned into a fixed-schema report. A
      // violated expectation surfaces as pass=false, not a thrown error,
      // so the report is itself testable.
      def report(name: String, violations: DataFrame, total: DataFrame) =
        violations.crossJoin(total)
          .select(lit(name).as("check_name"), col("violations"), col("total"),
            (col("violations") === 0).as("pass"))
      val cust = Tables.customer(s, dir)
      val ords = Tables.orders(s, dir)
      val ev = Tables.events(s, dir)
      val docs = Tables.documents(s, dir)
      val cnt = count(lit(1))
      val fkOrders = report("fk_orders_customer",
        ords.select(col("o_custkey"))
          .join(cust.select(col("c_custkey")),
            col("o_custkey") === col("c_custkey"), "left_anti")
          .agg(cnt.as("violations")),
        ords.agg(cnt.as("total")))
      val uniqCust = report("unique_customer_key",
        cust.groupBy(col("c_custkey")).agg(cnt.as("n"))
          .filter(col("n") > 1).agg(cnt.as("violations")),
        cust.agg(cnt.as("total")))
      val valDomain = report("event_value_nonneg",
        ev.filter(col("value").isNull || col("value") < 0)
          .agg(cnt.as("violations")),
        ev.agg(cnt.as("total")))
      val docText = report("document_text_nonempty",
        docs.filter(col("text").isNull || length(col("text")) === 0)
          .agg(cnt.as("violations")),
        docs.agg(cnt.as("total")))
      val tsRange = report("event_ts_in_2024",
        ev.filter(year(col("ts")) =!= 2024).agg(cnt.as("violations")),
        ev.agg(cnt.as("total")))
      fkOrders.unionByName(uniqCust).unionByName(valDomain)
        .unionByName(docText).unionByName(tsRange)
        .orderBy(col("check_name"))
    }),
    "q127_incremental_rollup" -> ((s, dir) => {
      // incremental materialized-view maintenance: the daily per-type
      // rollup is maintained as stored-base-rollup MERGE delta-rollup —
      // the base event store is never re-scanned for an increment, only
      // the delta partition (here the date split stands in for partition
      // pruning on a date-partitioned store; q85/q90's incremental-dedup
      // precedent, lifted to aggregates). Counts and cent-sums are the
      // mergeable state. The oracle recomputes the rollup FROM SCRATCH —
      // hash equality IS the maintenance-correctness proof.
      val ev = Tables.events(s, dir)
        .select(col("event_type"), to_date(col("ts")).as("d"),
          round(col("value") * 100).cast("long").as("cents"))
      def rollup(df: DataFrame) = df.groupBy(col("event_type"), col("d"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
      val cut = lit("2024-01-25").cast("date")
      val base = rollup(ev.filter(col("d") < cut))
      val delta = rollup(ev.filter(col("d") >= cut))
      base.unionByName(delta)
        .groupBy(col("event_type"), col("d"))
        .agg(sum(col("n")).cast("long").as("n"),
          sum(col("sum_cents")).cast("long").as("sum_cents"))
        .orderBy(col("event_type"), col("d"))
    }),
    "q128_attribution" -> ((s, dir) => {
      // last-touch revenue attribution: each purchase credits the most
      // recent click/view by the same user within 7 days, else 'direct' —
      // the as-of operator reused as a marketing primitive. The merge-
      // scan ships |purchases| + |touches| rows through ONE user-keyed
      // shuffle (AsOfJoin scaladoc has the 100 TB argument); purchases
      // with no prior touch at all rejoin as 'direct' via a keys-only
      // anti-join. Exact microsecond interval arithmetic on both engines.
      val ev = Tables.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts"),
          round(col("value") * 100).cast("long").as("cents"))
      val touches = ev.filter(col("event_type").isin("click", "view"))
        .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
      val joined = graft.operators.AsOfJoin.asof(
        purchases, touches, "user_id", "user_id", "ts", "ts", "event_id")
      val attributed = joined.select(col("event_id"), col("cents"),
        when(col("ts") <= col("asof_ts") + expr("INTERVAL 7 DAYS"),
          col("asof_event_type")).otherwise(lit("direct")).as("channel"))
      val noTouch = purchases
        .join(joined.select(col("event_id")), Seq("event_id"), "left_anti")
        .select(col("event_id"), col("cents"), lit("direct").as("channel"))
      attributed.unionByName(noTouch)
        .groupBy(col("channel"))
        .agg(count(lit(1)).as("n_purchases"),
          sum(col("cents")).as("revenue_cents"))
        .orderBy(col("channel"))
    }),
    "q129_sliding_distinct" -> ((s, dir) => {
      // trailing-7-day distinct users per day — the sliding-window
      // distinct that exact methods can't do incrementally at 100 TB
      // (distinct doesn't decompose over overlapping windows; each day
      // would rescan a week of raw events). The scale path: ONE pass
      // builds a 4 KiB mergeable HLL sketch per day, then the trailing
      // window is a day-grid self-join over k-sized rows merging 7
      // sketches — raw events are never revisited. The exact side exists
      // only to power the 5% TRUE-gate (q45/q67's pattern) and is itself
      // computed from the (day, user) distinct pairs, not raw events.
      import graft.functions.HyperLogLog
      val ev = Tables.events(s, dir)
        .select(to_date(col("ts")).as("d"), col("user_id"))
      val daily = ev.groupBy(col("d"))
        .agg(HyperLogLog.hllSketch(col("user_id")).as("sk"))
      val est = daily.as("a").join(daily.as("b"),
          col("b.d") >= date_sub(col("a.d"), 6) && col("b.d") <= col("a.d"))
        .groupBy(col("a.d").as("d"))
        .agg(HyperLogLog.hllMergeEstimate(col("b.sk")).as("est_users"))
      // GATE SIDE — DO NOT SHIP: this range join replicates the distinct
      // (day,user) pairs 7x purely to power the 5% tolerance check below.
      // The production path is the sketch side above (one pass, k-sized
      // day-grid merges); a user lifting this query should delete from
      // here down and keep `est`.
      val pairs = ev.distinct()
      val exact = daily.select(col("d")).as("g").join(pairs.as("p"),
          col("p.d") >= date_sub(col("g.d"), 6) && col("p.d") <= col("g.d"))
        .groupBy(col("g.d").as("d"))
        .agg(countDistinct(col("p.user_id")).as("exact_users"))
      est.join(exact, Seq("d"))
        .select(col("d"), col("exact_users"),
          (abs(col("est_users").cast("double")
            / col("exact_users").cast("double") - 1.0) <= 0.05)
            .as("within_tolerance"))
        .orderBy(col("d"))
    }),
    "q130_bloom_join" -> ((s, dir) => {
      // runtime Bloom-filter join pruning: monthly revenue of lineitems
      // belonging to 1995's URGENT orders. The dimension filter keeps ~3%
      // of orders, so ~97% of lineitem rows cannot join — but a plain plan
      // still shuffles ALL of them on l_orderkey. BloomJoin builds a ~KB
      // bitset over the filtered orderkeys and probes it AT THE SCAN, so
      // the exchange carries only true matches plus the sub-1%
      // false-positive sliver; the join then removes the sliver —
      // bit-identical to the plain join the oracle runs.
      val urgent = Tables.orders(s, dir)
        .filter(col("o_orderpriority") === "1-URGENT"
          && year(col("o_orderdate")) === 1995)
        .select(col("o_orderkey"), col("o_orderdate"))
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      graft.operators.BloomJoin
        .prunedInnerJoin(li, "l_orderkey", urgent, "o_orderkey")
        .groupBy(month(col("o_orderdate")).as("month"))
        .agg(count(lit(1)).as("n_lines"),
          (sum(round(col("l_extendedprice") * 100).cast("long")
            * (lit(100L) - round(col("l_discount") * 100).cast("long")))
            / lit(10000.0)).as("revenue"))
        .orderBy(col("month"))
    }),
    "q131_sketch_quantiles" -> ((s, dir) => {
      // trailing-7-day p50/p95 per day from STORED daily histogram
      // sketches: the log-bucket histogram (eps = 1% guaranteed relative
      // error, the DDSketch construction) is kept as plain
      // (day, bucket, cnt) rows, so the trailing window is a day-grid
      // merge over metadata-sized sketch rows — raw events are scanned
      // ONCE, never per window (q129's sliding-sketch pattern, for
      // quantiles instead of distincts).
      import graft.operators.HistogramQuantile
      val eps = 0.01
      val ev = Tables.events(s, dir)
        .select(to_date(col("ts")).as("d"), col("value"))
      // log bucketing is defined on POSITIVE values only and the sketch
      // now raises on violations (sf0.1 carries 6 zero-value rows in 1M,
      // sf1 sixty): exclude them from the SKETCH side explicitly. The
      // exact/gate side below keeps every row, so the estimates face the
      // full-distribution quantiles and the ppm-level rank shift is
      // absorbed by the 3*eps tolerance.
      val daily = HistogramQuantile.sketch(
        ev.filter(col("value") > 0), Seq("d"), col("value"), eps)
      val dayGrid = ev.select(col("d")).distinct()
      val merged = dayGrid.as("g").join(daily.as("s"),
          col("s.d") >= date_sub(col("g.d"), 6) && col("s.d") <= col("g.d"))
        .groupBy(col("g.d").as("d"), col("bucket"))
        .agg(sum(col("cnt")).as("cnt"))
      val est = HistogramQuantile.quantiles(merged, "d", eps, Seq(0.5, 0.95))
      // GATE SIDE — DO NOT SHIP: replicates raw values 7x and sorts every
      // window, purely to power the tolerance booleans below; the
      // production path is the sketch side above.
      val exact = dayGrid.as("g").join(ev.as("e"),
          col("e.d") >= date_sub(col("g.d"), 6) && col("e.d") <= col("g.d"))
        .groupBy(col("g.d").as("d"))
        .agg(count(lit(1)).as("n_exact"),
          array_sort(collect_list(col("value"))).as("xs"))
        .select(col("d"), col("n_exact"),
          element_at(col("xs"), ceil(lit(0.5) * col("n_exact")).cast("int"))
            .as("exact_p50"),
          element_at(col("xs"), ceil(lit(0.95) * col("n_exact")).cast("int"))
            .as("exact_p95"))
      est.join(exact, Seq("d"))
        .select(col("d"), col("n_exact").as("n"),
          col("exact_p50"), col("exact_p95"),
          (abs(col("est_p50") / col("exact_p50") - 1.0) <= 3 * eps).as("p50_ok"),
          (abs(col("est_p95") / col("exact_p95") - 1.0) <= 3 * eps).as("p95_ok"))
        .orderBy(col("d"))
    }),
    "q132_kcore_peeling" -> ((s, dir) => {
      // k-core peeling trace over the WEIGHTED part co-purchase graph
      // (pairs sharing >= 2 orders — the weight cut keeps the graph sparse
      // and gives the peel real multi-round dynamics; the unweighted graph
      // collapses in one round). 5 fixed rounds of "drop vertices with
      // induced degree < 3": each round is one degree agg + two
      // semi-joins (q105's Pregel-as-joins discipline), and the per-round
      // survivor counts are the term-for-term-oracleable output.
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      val edges = li.as("x").join(li.as("y"), col("x.ok") === col("y.ok")
          && col("x.pk") < col("y.pk"))
        .groupBy(col("x.pk").as("a"), col("y.pk").as("b"))
        .agg(count(lit(1)).as("w"))
        .filter(col("w") >= 2)
        .select(col("a"), col("b"))
      graft.operators.KCore.peelRounds(edges, k = 3, rounds = 5)
    }),
    "q133_prefix_filter_join" -> ((s, dir) =>
      // EXACT Jaccard >= 4/5 similarity self-join via df-ordered prefix
      // filtering (PPJoin) over word-5-gram shingles — the
      // recall-GUARANTEED near-dup join: unlike the LSH family
      // (q22/q23/q55) the candidate set provably contains every
      // qualifying pair, so the oracle is the full brute-force all-pairs
      // join and the compare is exact equality, not a recall gate. Sizes
      // stay integers; no float decides membership. (Word shingles, not
      // char n-grams: prefix filtering needs token cardinality — see the
      // operator's scaladoc for the measured 4-orders-of-magnitude gap.)
      graft.dedup.PrefixFilterJoin
        .similarPairs(Tables.documents(s, dir), num = 4, den = 5,
          shingleWords = 5)
        .orderBy(col("id1"), col("id2"))),
    "q134_unigram_perplexity" -> ((s, dir) =>
      // CCNet-style statistical quality scoring: every document's
      // cross-entropy under the corpus's own unigram LM — the classic
      // perplexity filter of LLM data pipelines. Cross-engine determinism:
      // per-token-type surprisal is rounded to 9dp ONCE and summed as
      // tf-weighted exact DECIMALs (order-independent), so the only float
      // step is the final division of already-equal operands (see
      // operators.UnigramLM scaladoc for the scale shape: tf-row join,
      // vocab join unhinted so AQE sizes it, no data-sized windows).
      graft.operators.UnigramLM
        .crossEntropy(Parallelize.ensure(Tables.documents(s, dir)))
        .orderBy(col("doc_id"))),
    "q135_zorder_layout" -> ((s, dir) => {
      // Z-order (Morton) layout clustering: events written as 16
      // disjoint-z-range files on (user_id, minute-since-corpus-start) vs
      // a hash-scattered control layout of the same rows. A 2-D box
      // predicate (low-eighth user band x 2-day span, bounds derived from
      // a broadcast 1-row aggregate) then finds all its rows in a few
      // z-files but is sprayed across the control files — the min/max
      // file-skipping story that makes multi-dim point/range lookups
      // feasible at 100 TB. The aggregates are layout-invariant (oracle
      // computes them from the source table); the layout evidence is the
      // TRUE-gated file-locality booleans, deterministic per dataset.
      val (zDir, pDir, nFiles) = stagedZOrderEvents(s, dir)
      def boxAgg(path: String, tag: String): DataFrame = {
        val df = s.read.parquet(path)
        val b = df.agg(max(col("user_id")).as("mu"), min(col("ts")).as("t0"))
        // input_file_name() is nondeterministic to Catalyst: project it to
        // a plain column BEFORE the aggregate or the agg is rejected
        df.withColumn("fname", input_file_name())
          .crossJoin(broadcast(b))
          .filter(col("user_id") * 8 <= col("mu")
            && col("ts") >= col("t0") + expr("INTERVAL 2 DAYS")
            && col("ts") < col("t0") + expr("INTERVAL 4 DAYS"))
          .agg(count(lit(1)).as(s"n_rows_$tag"),
            sum(col("value").cast("decimal(18,2)")).cast("double")
              .as(s"sum_$tag"),
            countDistinct(col("fname")).as(s"nf_$tag"))
      }
      boxAgg(zDir, "z").crossJoin(boxAgg(pDir, "p"))
        .select(col("n_rows_z").as("n_rows"), col("sum_z").as("sum_value"),
          // decimal-exact sums of the same rows: bit-equal across layouts
          (col("n_rows_z") === col("n_rows_p")
            && col("sum_z") === col("sum_p")).as("layouts_agree"),
          (col("nf_z") * 4 <= lit(nFiles)).as("z_clustered"),
          (col("nf_z") <= col("nf_p")).as("z_no_worse"))
    }),
    "q136_editdist_dedup" -> ((s, dir) =>
      // entity-resolution near-dup join: customer names within Levenshtein
      // distance 1 via SymSpell deletion-neighborhood blocking — recall is
      // a THEOREM (dedup.EditDistanceJoin scaladoc), so the oracle is the
      // full all-pairs brute force and the compare is exact equality
      // (q133's discipline, for edit distance instead of shingle sets).
      // NO final orderBy (round 12): the answer is SET-valued and the gate
      // compare sorts rows itself; the output grows 12x per decade
      // (39.75M pairs at sf10 — measured, THREESCALE.md) and a global
      // range-sort of the result was a third of the query's sf10 cost for
      // nothing a consumer needs.
      graft.dedup.EditDistanceJoin
        .similarPairs(Tables.customer(s, dir), "c_custkey", "c_name")),
    "q137_ks_drift" -> ((s, dir) => {
      // two-sample Kolmogorov-Smirnov drift gate between the value
      // distributions of the lexicographic min/max event types (q125's
      // derived-slices pattern — no hardcoded type list). Integer-exact:
      // cents bucketing by integer floor-division and the |ca*nb - cb*na|
      // DECIMAL maximum; the only float is the final division of
      // bit-equal operands (operators.KsDrift scaladoc).
      val ev = Tables.events(s, dir).select(col("event_type"), col("value"))
      val sides = ev.agg(min(col("event_type")).as("sa"),
        max(col("event_type")).as("sb"))
      val labeled = ev.crossJoin(broadcast(sides))
        .filter(col("event_type") === col("sa")
          || col("event_type") === col("sb"))
        .withColumn("side",
          when(col("event_type") === col("sa"), lit("A")).otherwise(lit("B")))
      graft.operators.KsDrift.ks(labeled, "side", "A", "B", "value",
        centsPerBucket = 100)
    }),
    "q138_image_phash_dedup" -> ((s, dir) => {
      // image near-dup grouping by 64-bit perceptual average-hash: the
      // engine DECODES real PNG pixels (zlib + filters + raster) and
      // hashes the 8x8 coarse light/dark layout with strict integer
      // cross-product thresholds (PngCodec.aHash64); images with the same
      // band structure collide — SimHash for the image modality. The
      // oracle re-derives every hash from the closed-form image
      // construction (q28's discipline), so a decode or grid-boundary bug
      // breaks the gate. Narrow mapPartitions decode, then one k-sized
      // hash agg; payloads never shuffle.
      import graft.multimodal.Multimodal.PngCodec
      import s.implicits._
      Parallelize.ensure(
        s.read.parquet(stagedPngMedia(s, dir))
          .filter(col("media_type") === "image")
          .select(col("media_id"), col("payload"))).as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, p) => (id, PngCodec.aHash64(p)) })
        .toDF("media_id", "ahash")
        .groupBy(col("ahash"))
        .agg(count(lit(1)).as("n_images"),
          min(col("media_id")).as("first_id"),
          max(col("media_id")).as("last_id"))
        .orderBy(col("ahash"))
    }),
    "q107_event_transitions" -> ((s, dir) => {
      // per-user event-sequence transition counts (the Markov-bigram
      // features session-based training data needs): each user's events
      // ordered by (ts, event_id) — the id tiebreak makes the sequence a
      // total order both engines agree on — consecutive type pairs via a
      // per-user LAG, counted per (prev, next). The window partitions by
      // user, so its state is one user's events, never a global sort; the
      // output is |types|^2 rows.
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      ev.withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNotNull)
        .groupBy(col("prev_type"), col("event_type"))
        .agg(count(lit(1)).as("n_transitions"))
        .orderBy(col("prev_type"), col("event_type"))
    }),
    "q112_mmr_retrieval" -> ((s, dir) => {
      // Maximal-Marginal-Relevance diversified retrieval in EXACT integer
      // arithmetic: embeddings quantize to round(e*1000) longs, relevance
      // and redundancy are integer dot products, and the greedy chain
      // (lambda = 0.7 as the scale-free 7*rel - 3*maxSim) never touches a
      // float — the oracle replays all five greedy stages term for term,
      // ties broken by vec_id as exact-integer ties on both engines.
      // Scale shape: relevance is a narrow codegen'd zip_with/aggregate
      // over the corpus scan; the shortlist is a TakeOrdered top-20; only
      // those 20 rows (k-sized, the broadcast-centroid precedent) reach
      // the driver for the greedy chain.
      val quant = expr("transform(embedding, x -> cast(round(x * 1000) as bigint))")
      val emb = Tables.embeddings(s, dir)
      val qv = emb.filter(col("vec_id") === 0).select(quant.as("qv"))
        .collect()(0).getSeq[Long](0).toArray
      val rel = aggregate(
        zip_with(quant, lit(qv), (x, y) => x * y), lit(0L), (a, x) => a + x)
      val top = emb.filter(col("vec_id") =!= 0)
        .select(col("vec_id"), rel.as("rel"), quant.as("ev"))
        .orderBy(col("rel").desc, col("vec_id")).limit(20)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2).toArray))
      def dot(a: Array[Long], b: Array[Long]): Long = {
        var s0 = 0L; var i = 0
        while (i < a.length) { s0 += a(i) * b(i); i += 1 }
        s0
      }
      val picked = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long, Long)]
      var selected = List.empty[(Long, Array[Long])]
      var remaining = top.toList
      for (rank <- 1 to 5) {
        val scoredCands = remaining.map { case (id, r0, v) =>
          val maxSim = if (selected.isEmpty) 0L
            else selected.map(sv => dot(v, sv._2)).max
          (id, r0, v, 7L * r0 - 3L * maxSim)
        }
        val (id, r0, v, mmr) = scoredCands.sortBy(t => (-t._4, t._1)).head
        picked += ((rank, id, r0, mmr))
        selected ::= (id, v)
        remaining = remaining.filterNot(_._1 == id)
      }
      import s.implicits._
      picked.toSeq.toDF("rank", "vec_id", "rel", "mmr_score")
        .orderBy(col("rank"))
    }),
    "q105_pagerank" -> ((s, dir) => {
      // damped PageRank, 5 exact integer rounds (operators.PageRank), over
      // the bipartite user-activity graph: users one side, event types
      // (stable negative ids) the other, an edge per DISTINCT (user, type)
      // incidence in both directions. Ranks in millionths with truncating
      // integer division make every round order-independent long
      // arithmetic, so the oracle replays all 5 rounds term for term —
      // the graph-centrality member of the Pregel-as-joins family beside
      // q65's label propagation.
      val typeId = when(col("event_type") === "click", -1L)
        .when(col("event_type") === "view", -2L)
        .when(col("event_type") === "purchase", -3L)
        .when(col("event_type") === "signup", -4L)
        .otherwise(-5L)
      val inc = Tables.events(s, dir)
        .select(col("user_id").as("u"), typeId.as("t")).distinct()
      val edges = inc.select(col("u").as("s"), col("t").as("d"))
        .unionByName(inc.select(col("t").as("s"), col("u").as("d")))
      graft.operators.PageRank.ranksMillionths(edges, 5)
        .orderBy(col("id"))
    }),
    "q94_event_funnel" -> ((s, dir) => {
      // ordered first-touch funnel view -> click -> purchase: stage i+1
      // counts a user iff a qualifying event lands strictly after their
      // stage-i first-touch time. One shrinking user-keyed agg+join per
      // stage (operators.Funnel scaladoc has the 100 TB shape); conversion
      // is one exact-long double division so it hash-compares.
      graft.operators.Funnel.stages(Tables.events(s, dir),
        Seq("view", "click", "purchase"))
    }),
    "q95_pq_ann" -> ((s, dir) => {
      // recall-GATED product-quantization ANN (the memory-compression scale
      // path: 64 floats -> 8 byte-codes per vector), in the production
      // ADC-with-refinement form: the code scan prunes to a 150-candidate
      // shortlist per query, exact cosine re-ranks ONLY those rows.
      // Deterministic first-k-by-id training like q46 so the gate replays;
      // floor: refined top-10 recovers >= 6 of the exact cosine top-10 per
      // query — measured min 9/10 at sf0.01 AND sf0.1 (m=8, k=64, L=150).
      val emb = Tables.embeddings(s, dir)
      val cb = graft.similarity.ProductQuantization.train(
        emb, "embedding", m = 8, k = 64, maxIter = 3)
      val codes = graft.similarity.ProductQuantization.encode(emb, "embedding", cb)
      val queries = graft.similarity.ProductQuantization
        .normalized(emb.filter(col("vec_id") < 5), "embedding", "nvec")
        .orderBy(col("vec_id")).select(col("vec_id"), col("nvec")).collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toSeq
      val approx = graft.similarity.ProductQuantization
        .searchRefined(codes, emb, queries, cb, k = 10, shortlist = 150)
        .select(col("query_id"), col("neighbor_id"))
      val exact = Knn.bruteForce(emb, emb.filter(col("vec_id") < 5), k = 10)
        .select(col("query_id"), col("neighbor_id"))
      val hits = approx.join(exact, Seq("query_id", "neighbor_id"), "left_semi")
        .groupBy(col("query_id")).agg(count(lit(1)).as("n_hits"))
      exact.groupBy(col("query_id")).agg(count(lit(1)).as("n_exact"))
        .join(hits, Seq("query_id"), "left")
        .select(col("query_id"),
          (coalesce(col("n_hits"), lit(0L)) * 10 >= col("n_exact") * 6).as("meets_floor"))
        .orderBy(col("query_id"))
    }),
    "q96_corpus_overlap" -> ((s, dir) => {
      // corpus-level overlap: "how much of crawl B is already in crawl A?"
      // via 256-hash MinHash sketches (2 KiB mergeable state per corpus, no
      // cross-corpus distinct join — dedup.CorpusOverlap scaladoc). Corpus A
      // = even-numbered sources; B = odd sources + planted copies of A docs
      // (the testdata corpora share no text naturally). The estimate is
      // engine-internal; the gate emits the EXACT set sizes/Jaccard (both
      // engines derive them from the same normalization) plus the
      // estimate-within-±0.1 boolean (6.7 sigma at H=256 — deterministic
      // TRUE, same band-gate pattern as q45's HLL).
      val docs = Parallelize.ensure(Tables.documents(s, dir))
      val srcNum = regexp_extract(col("source"), "(\\d+)", 1).cast("int")
      val a = docs.filter(srcNum % 2 === 0)
      val b = docs.filter(srcNum % 2 === 1).unionByName(
        a.filter(col("doc_id") < 60)
          .withColumn("doc_id", col("doc_id") + 1000000))
      val labeled = a.withColumn("corpus", lit("A"))
        .unionByName(b.withColumn("corpus", lit("B")))
      val sk = graft.dedup.CorpusOverlap.sketches(labeled, "corpus", "text", 256)
      val est = graft.dedup.CorpusOverlap.estimate(sk, "corpus", "A", "B")
      val normA = a.select(NgramJaccard.normalized(col("text")).as("t")).distinct()
      val normB = b.select(NgramJaccard.normalized(col("text")).as("t")).distinct()
      val counts = normA.agg(count(lit(1)).as("n_a"))
        .crossJoin(normB.agg(count(lit(1)).as("n_b")))
        .crossJoin(normA.join(normB, Seq("t"), "left_semi")
          .agg(count(lit(1)).as("n_common")))
        .withColumn("j_exact", col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common")).cast("double"))
      counts.crossJoin(est)
        .select(col("n_a"), col("n_b"), col("n_common"), col("j_exact"),
          (abs(col("est_jaccard") - col("j_exact")) <= 0.1).as("est_in_band"))
    }),
    "q97_containment_dedup" -> ((s, dir) => {
      // containment dedup: truncated re-crawls (first 40% of a doc) are
      // near-invisible to Jaccard (~0.4) but have containment exactly 1.0 —
      // the asymmetric measure catches what the symmetric one misses. 20
      // planted truncations + 20 untruncated control pairs; raw doubles
      // hash-compare because both engines do identical integer set
      // arithmetic (q26 precedent), and the planted rows must flag
      // is_contained while controls must not.
      val docs = Parallelize.ensure(Tables.documents(s, dir))
      val trunc = docs.filter(col("doc_id") < 20)
        .select((col("doc_id") + 2000000).as("doc_id"),
          col("text").substr(lit(1), (col("n_chars") * 0.4).cast("int")).as("text"))
      val corpus = docs.select(col("doc_id"), col("text")).unionByName(trunc)
      val pairs = docs.filter(col("doc_id") < 20)
        .select((col("doc_id") + 2000000).as("id1"), col("doc_id").as("id2"))
        .unionByName(docs.filter(col("doc_id") >= 20 && col("doc_id") < 40)
          .select(col("doc_id").as("id1"), (col("doc_id") + 1).as("id2")))
      NgramJaccard.forPairsWithContainment(pairs, corpus)
        .withColumn("is_contained", col("containment_1_in_2") >= 1.0)
        .orderBy(col("id1"))
    }),
    "q98_bm25_retrieval" -> ((s, dir) => {
      // BM25 top-10 retrieval (k1=1.2, b=0.75, idf = ln(1 + (N-df+0.5)/
      // (df+0.5))) for a fixed 5-term query. Scale shape: doc length is a
      // NARROW per-row tokenCount (no doc-length shuffle); the isin() on
      // the query terms prunes the exploded token stream BEFORE the
      // (doc,token) aggregate, so the posting shuffle carries 5 terms'
      // postings, not the corpus vocabulary; df is a 5-row broadcast; the
      // final top-10 is a TakeOrdered, never a global sort. Per-term
      // contributions round to 6dp and sum as exact integer micro-units
      // (q72's exact-cents rule) so the cross-term sum — the one
      // order-sensitive float reduction — is engine-agnostic.
      val terms = Seq("data", "hash", "join", "scan", "vector")
      val d = Parallelize.ensure(Tables.documents(s, dir))
        .select(col("doc_id"),
          TextFunctions.tokenCount(col("text")).cast("bigint").as("dl"),
          split(trim(col("text")), " +").as("toks"))
      val stats = d.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
      val tf = d.select(col("doc_id"), col("dl"), explode(col("toks")).as("token"))
        .filter(col("token").isin(terms: _*))
        .groupBy(col("doc_id"), col("token"))
        .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
      val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
      val nd = col("n_docs").cast("double")
      val micros = tf.join(broadcast(dfreq), Seq("token"))
        .crossJoin(broadcast(stats))
        .withColumn("avgdl", col("sum_dl").cast("double") / nd)
        .withColumn("idf", log(lit(1.0)
          + (nd - col("df").cast("double") + 0.5) / (col("df").cast("double") + 0.5)))
        .withColumn("contrib", col("idf") * (col("tf").cast("double") * lit(2.2))
          / (col("tf").cast("double")
            + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl").cast("double") / col("avgdl"))))
        .select(col("doc_id"), round(col("contrib") * 1e6).cast("bigint").as("micros"))
      val top = micros.groupBy(col("doc_id"))
        .agg(sum(col("micros")).as("score_micros"), count(lit(1)).as("n_terms"))
        .orderBy(col("score_micros").desc, col("doc_id"))
        .limit(10)
      // rank over the already-taken 10 rows only — the empty-frame window
      // is fine at k=10 and never touches the corpus
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("score_micros").desc, col("doc_id"))
      top.withColumn("rank", row_number().over(w).cast("int"))
        .select(col("doc_id"),
          (col("score_micros").cast("double") / 1e6).as("score"),
          col("n_terms"), col("rank"))
        .orderBy(col("rank"))
    }),
    "q106_vocab_coverage" -> ((s, dir) => {
      // tokenizer-planning curve: what fraction of the corpus token stream
      // the top-k vocabulary covers, at k = 5 / 15 / 1000 (the last one
      // past this corpus's whole vocabulary, pinning the 1.0 boundary).
      // Scale shape: ONE (token) aggregate — vocab-sized, not corpus-sized
      // — then a TakeOrdered top-1000; the rank window and the k-threshold
      // join run over AT MOST 1000 rows, so the nested-loop there is
      // k-bounded by construction, never data-bound.
      val toks = Parallelize.ensure(Tables.documents(s, dir))
        .select(explode(split(trim(col("text")), " +")).as("token"))
        .filter(length(col("token")) > 0)
      val counts = toks.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      val total = toks.agg(count(lit(1)).as("total"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("cnt").desc, col("token"))
      val top = counts.orderBy(col("cnt").desc, col("token")).limit(1000)
        .withColumn("rk", row_number().over(w))
      import s.implicits._
      val ks = Seq(5, 15, 1000).toDF("k")
      broadcast(ks).join(top, col("rk") <= col("k"))
        .groupBy(col("k")).agg(sum(col("cnt")).as("covered_tokens"))
        .crossJoin(broadcast(total))
        .select(col("k"), col("covered_tokens"),
          col("total").as("total_tokens"),
          round(col("covered_tokens").cast("double")
            / col("total").cast("double"), 6).as("coverage"))
        .orderBy(col("k"))
    }),
    "q103_quantile_buckets" -> ((s, dir) => {
      // sketch-derived quantile bucketing: per-lang quartile boundaries
      // from percentile_approx (mergeable sketch state — the same
      // boundaries-from-a-sketch pattern Spark's own range partitioner
      // uses), broadcast back onto the scan for a NARROW bucket
      // assignment; no global sort, no per-lang ranking window anywhere.
      // The sketch values are engine-internal, so the gate is q45's band
      // style: exact per-lang totals hash-compare, and the TRUE-gated
      // booleans assert each quartile holds 25% +/- 10% of its lang's
      // docs and the boundaries are nondecreasing.
      val d = Parallelize.ensure(Tables.documents(s, dir))
        .select(col("lang"), col("n_chars").cast("double").as("x"))
      val bounds = d.groupBy(col("lang"))
        .agg(percentile_approx(col("x"),
          array(lit(0.25), lit(0.5), lit(0.75)), lit(10000)).as("b"))
      val bucketed = d.join(broadcast(bounds), Seq("lang"))
        .withColumn("bucket", when(col("x") <= col("b")(0), 1)
          .when(col("x") <= col("b")(1), 2)
          .when(col("x") <= col("b")(2), 3)
          .otherwise(4))
      val frac = (i: Int) =>
        sum(when(col("bucket") === i, 1L).otherwise(0L)).cast("double")
          ./(count(lit(1)).cast("double"))
      bucketed.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          ((abs(frac(1) - 0.25) <= 0.10) && (abs(frac(2) - 0.25) <= 0.10)
            && (abs(frac(3) - 0.25) <= 0.10) && (abs(frac(4) - 0.25) <= 0.10))
            .as("balanced"),
          ((max(col("b")(0)) <= max(col("b")(1)))
            && (max(col("b")(1)) <= max(col("b")(2)))).as("monotone"))
        .orderBy(col("lang"))
    }),
    "q117_corpus_card" -> ((s, dir) => {
      // the dataset-card headline row: corpus size, language/source
      // breadth, exact-dup rate, token-length profile — every number a
      // data card quotes. Deliberately NOT one agg mixing countDistincts:
      // that plans the Expand rewrite (every input row duplicated per
      // distinct aggregate — q45's measured 2x+ row multiplier). Instead
      // one plain pass + three distinct→count passes, each a narrow
      // column-pruned scan, crossJoined as 1-row frames; PlanSpec asserts
      // the whole card stays Expand-free. Ratios derive from exact longs.
      val nt = TextFunctions.tokenCount(col("text")).cast("bigint")
      val d = Parallelize.ensure(Tables.documents(s, dir))
        .select(col("lang"), col("source"), nt.as("nt"), md5(col("text")).as("h"))
      val base = d.agg(count(lit(1)).as("n_docs"),
        sum(col("nt")).as("total_tokens"), max(col("nt")).as("max_tokens"))
      val texts = d.select(col("h")).distinct()
        .agg(count(lit(1)).as("n_distinct_texts"))
      val langs = d.select(col("lang")).distinct()
        .agg(count(lit(1)).as("n_langs"))
      val srcs = d.select(col("source")).distinct()
        .agg(count(lit(1)).as("n_sources"))
      base.crossJoin(texts).crossJoin(langs).crossJoin(srcs)
        .withColumn("dup_rate", round(
          (col("n_docs") - col("n_distinct_texts")).cast("double")
            / col("n_docs").cast("double"), 6))
        .withColumn("mean_tokens", round(
          col("total_tokens").cast("double") / col("n_docs").cast("double"), 6))
    }),
    "q114_mixing_plan" -> ((s, dir) => {
      // training-mix PLANNING (the sampling-table derivation step ahead of
      // q69's rate application): given per-lang target shares and a total
      // token budget, derive each lang's keep-rate (undersample) or epoch
      // factor (oversample when the target exceeds supply). Everything is
      // closed-form from ONE per-lang token aggregate — the budget/share
      // literals and the derived doubles are computed op-for-op on both
      // engines from exact long token counts.
      val share = when(col("lang") === "en", 0.4)
        .when(col("lang") === "de", 0.2).when(col("lang") === "es", 0.2)
        .when(col("lang") === "fr", 0.1).otherwise(0.1)
      val budget = 200000L
      Parallelize.ensure(Tables.documents(s, dir))
        .select(col("lang"),
          TextFunctions.tokenCount(col("text")).cast("bigint").as("nt"))
        .groupBy(col("lang"))
        .agg(sum(col("nt")).as("available_tokens"))
        .withColumn("target_tokens",
          round(lit(budget.toDouble) * share).cast("bigint"))
        .withColumn("keep_rate", round(
          least(lit(1.0), col("target_tokens").cast("double")
            / col("available_tokens").cast("double")), 6))
        .withColumn("epochs", round(
          greatest(lit(1.0), col("target_tokens").cast("double")
            / col("available_tokens").cast("double")), 6))
        .orderBy(col("lang"))
    }),
    "q101_length_buckets" -> ((s, dir) => {
      // length-bucketed batching accounting: every doc lands in a
      // power-of-2 token-length bucket (capped CASE ladder — integer
      // comparisons only, so both engines bucket identically; no float
      // log2 edge cases) and the per-bucket padding waste is what a
      // fixed-shape training batch would burn padding to the bucket cap.
      // The op that decides bucketed-batching vs sequence-packing (q70) on
      // real data. Narrow per-row bucket assignment + ONE (lang, cap) agg
      // — nothing else shuffles at any scale.
      val nt = TextFunctions.tokenCount(col("text")).cast("bigint")
      val cap = when(nt <= 32, 32L).when(nt <= 64, 64L)
        .when(nt <= 128, 128L).when(nt <= 256, 256L).when(nt <= 512, 512L)
        .when(nt <= 1024, 1024L).when(nt <= 2048, 2048L)
        .when(nt <= 4096, 4096L).otherwise(8192L)
      Parallelize.ensure(Tables.documents(s, dir))
        .select(col("lang"), nt.as("nt"), cap.as("cap"))
        .filter(col("nt") > 0)
        .groupBy(col("lang"), col("cap"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("nt")).as("sum_tokens"))
        .withColumn("padding", col("cap") * col("n_docs") - col("sum_tokens"))
        .withColumn("waste_pct", round(col("padding").cast("double")
          / (col("cap") * col("n_docs")).cast("double"), 6))
        .orderBy(col("lang"), col("cap"))
    }),
    "q99_span_dedup" -> ((s, dir) => {
      // intra-corpus duplicated-SPAN detection — the hashed-inverted-index
      // form of suffix-array span dedup (dedup papers' "repeated 50-gram"
      // pass, here over word 8-grams): a gram held by >= 2 DISTINCT docs
      // flags every doc containing it. The synthetic corpus has no natural
      // cross-doc 8-grams (~30-word vocab, 30^8 gram space), so docs with
      // id % 10 == 3 plant one SHARED 10-token span (3 duplicated in-span
      // grams) and id % 10 == 7 plant a doc-unique control span whose every
      // gram carries the doc_id — the control must NOT flag, making both
      // sides of the gate non-vacuous. Scale shape: the (doc, gram) explode
      // partial-aggregates into ONE gram-keyed exchange that the >= 2-docs
      // filter and the semi-join back both read (q22's ReusedExchange
      // pattern); grams travel as 8-byte xxhash64 values, never strings;
      // the corpus is never re-joined doc-side — per-lang counts come off
      // the hit rows directly.
      val planted = when(pmod(col("doc_id"), lit(10)) === 3,
          concat(col("text"), lit(" zq0 zq1 zq2 zq3 zq4 zq5 zq6 zq7 zq8 zq9")))
        .when(pmod(col("doc_id"), lit(10)) === 7,
          concat(col("text"), lit(" zw"), col("doc_id").cast("string"),
            lit(" zub zuc zud zue zuf zug zuh")))
        .otherwise(col("text"))
      val d = Parallelize.ensure(Tables.documents(s, dir))
        .select(col("doc_id"), col("lang"), planted.as("ptext"))
      val docGrams = d.select(col("doc_id"), col("lang"),
        explode(MinHashExprs.shingleHashes(split(trim(col("ptext")), " +"), 8)).as("g"))
      val dupGrams = docGrams.groupBy(col("g"))
        .agg(countDistinct(col("doc_id")).as("nd"))
        .filter(col("nd") >= 2).select(col("g"))
      val hits = docGrams.join(dupGrams, Seq("g"), "left_semi")
      val langTotals = d.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
      val langFlag = hits.select(col("lang"), col("doc_id")).distinct()
        .groupBy(col("lang")).agg(count(lit(1)).as("n_flagged"))
      val langGrams = hits.groupBy(col("lang"))
        .agg(countDistinct(col("g")).as("n_dup_grams"))
      langTotals.join(langFlag, Seq("lang"), "left")
        .join(langGrams, Seq("lang"), "left")
        .na.fill(0L, Seq("n_flagged", "n_dup_grams"))
        .orderBy(col("lang"))
    }),
    "q84_anomaly_zscore" -> ((s, dir) => {
      // per-type outlier gate: an event is anomalous if its value sits more
      // than 3 sigma from its type's mean. All moments accumulate EXACTLY
      // in DECIMAL (sum and sum-of-squares; DuckDB mirrors with HUGEINT) —
      // so both engines derive bit-identical doubles and the 3-sigma verdict
      // can hash-compare. Shuffle shape: one partial-agg groupBy for the
      // moments + a broadcast join back onto the scan; no second shuffle.
      val ev = Tables.events(s, dir)
        .select(col("event_type"),
          round(col("value") * 100).cast("long").as("cents"))
      // the DECIMAL cast must wrap the OPERANDS, not the product: a long
      // cents*cents already wraps silently past ~3e9 cents with ANSI off,
      // and the long sum wraps past ~9e18 total — both before any cast
      // could save them. decimal(19,0)*decimal(19,0) → decimal(38,0) exact.
      val decCents = col("cents").cast("decimal(19,0)")
      val stats = ev.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(decCents).as("s"),
          sum(decCents * decCents).as("sq"))
        .withColumn("mean", col("s").cast("double") / col("n").cast("double"))
        .withColumn("variance",
          (col("sq").cast("double")
            - col("s").cast("double") * col("s").cast("double") / col("n").cast("double"))
            / col("n").cast("double"))
      ev.join(broadcast(stats), Seq("event_type"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum((abs(col("cents").cast("double") - col("mean"))
            > lit(3.0) * sqrt(col("variance"))).cast("long")).as("n_outliers"),
          round(max(col("mean")), 6).as("mean_cents"))
        .orderBy(col("event_type"))
    }),
    "q82_tfidf" -> ((s, dir) => {
      // TF-IDF keyword extraction: tf = per-(doc, token) count, df = docs
      // containing the token, idf = ln(N/df), top-3 tokens per doc for the
      // first 20 docs (tf/df computed over the FULL corpus). Rounded to 6dp
      // BEFORE ranking (q59's rule) so both engines rank identical values;
      // ties break by token. Shuffle shape: one (doc,token) agg + one
      // token agg + a token-keyed join — the per-doc top-k runs on the
      // 20-doc slice only, after the corpus-wide stats.
      val d = Parallelize.ensure(Tables.documents(s, dir))
      val toks = d.select(col("doc_id"),
          explode(split(trim(col("text")), " +")).as("token"))
        .filter(length(col("token")) > 0)
      val tf = toks.groupBy(col("doc_id"), col("token"))
        .agg(count(lit(1)).as("tf"))
      val df_ = toks.select(col("doc_id"), col("token")).distinct()
        .groupBy(col("token")).agg(count(lit(1)).as("df"))
      val total = d.agg(count(lit(1)).as("n_total"))
      val scored = tf.filter(col("doc_id") < 20)
        .join(df_, Seq("token"))
        .crossJoin(broadcast(total))
        .withColumn("tfidf", round(col("tf").cast("double")
          * log(col("n_total").cast("double") / col("df").cast("double")), 6))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("token"))
      scored.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("doc_id"), col("token"), col("tf"), col("df"),
          col("tfidf"), col("rk").as("rank"))
        .orderBy(col("doc_id"), col("rank"))
    }),
    "q83_doc_chunking" -> ((s, dir) => {
      // context-window chunking for pretraining: 256-token chunks with a
      // 32-token overlap (stride 224); a doc yields 1 + ceil((nt-256)/224)
      // chunks, materialized by exploding a codegen'd sequence() — chunk c
      // covers tokens [224c, min(224c+256, nt)). Narrow per-row explode +
      // one lang agg: zero pre-agg shuffles at 100 TB. The oracle uses the
      // closed form (sum of chunk lengths = nt + 32*(n_chunks-1)), equal by
      // arithmetic identity.
      val nt = TextFunctions.tokenCount(col("text")).cast("bigint")
      val d = Parallelize.ensure(Tables.documents(s, dir))
        .select(col("lang"), col("doc_id"), nt.as("nt"))
        .filter(col("nt") > 0)
        .withColumn("n_chunks",
          lit(1L) + greatest(lit(0L), expr("(nt - 256 + 223) div 224")))
      d.select(col("lang"), col("doc_id"), col("nt"),
          explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk"))
        .withColumn("chunk_tokens",
          least(col("chunk") * 224 + 256, col("nt")) - col("chunk") * 224)
        .groupBy(col("lang"))
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_chunks"),
          sum(col("chunk_tokens")).as("sum_chunk_tokens"))
        .orderBy(col("lang"))
    }),
    "q88_stratified_take" -> ((s, dir) => {
      // fixed per-stratum budget: EXACTLY 10 docs per language, chosen
      // deterministically by Knuth-hash order — "sampling to a budget"
      // without RNG, so every run and every engine picks the same rows
      // (q69's mixing gives RATES; this gives exact counts). Rides the
      // bounded top-k AGGREGATE (O(k) map-side state per partition), not a
      // ranking window that would sort a few giant language partitions.
      // The multiplicative hash (overflow-free past 2^31 ids — Mixing's
      // shared kernel) is bijective on [0, 2^32), so no ties at this
      // corpus's ids; beyond 2^32 ids it aliases, and BOTH engines break
      // the tie by doc_id (TopKAggregator orders (score, id asc); the
      // oracle's ROW_NUMBER orders (hv, doc_id)).
      val d = Parallelize.ensure(Tables.documents(s, dir))
      val hv = graft.operators.Mixing.knuthHash(col("doc_id"))
      d.select(col("doc_id"), col("lang"), (-hv.cast("double")).as("score"))
        .groupBy(col("lang"))
        .agg(graft.similarity.TopKAggregator.topK(10)(col("doc_id"), col("score")).as("top"))
        .select(col("lang"), posexplode(col("top")).as(Seq("pos", "s")))
        .select(col("s.id").as("doc_id"), col("lang"),
          (col("pos") + 1).cast("int").as("rank"))
        .orderBy(col("lang"), col("rank"))
    }),
    "q56_bpe_tokens" -> ((s, dir) =>
      Parallelize.ensure(Tables.documents(s, dir))
        .select(col("doc_id"),
          TextFunctions.bpeTokenCount(col("text")).as("n_bpe_tokens"))
        .orderBy(col("doc_id"))),
    // --- embedding-cosine near-dup (sign-LSH; planted exact copies make the
    //     recall deterministic: identical vectors get identical signatures) ---
    "q55_cosine_neardups" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
      val planted = emb.filter(col("vec_id") < 20)
        .select((col("vec_id") + 1000000).as("vec_id"), col("embedding"))
      graft.similarity.CosineLSH.nearDuplicates(
        emb.unionByName(planted), threshold = 0.99)
    }),
    // --- bucketed co-located join (the 100 TB repeated-join layout): both
    //     sides written bucketed on the join key once per (dir, JVM), then
    //     the join itself plans with ZERO exchanges (PlanSpec asserts it) ---
    "q54_bucketed_join" -> ((s, dir) => {
      val key = FixtureKey(dir)
      val (lt, rt) = (s"graft_bkt_orders_$key", s"graft_bkt_customer_$key")
      if (!s.catalog.tableExists(lt) || !s.catalog.tableExists(rt)) {
        graft.sources.Bucketing.writeBucketed(
          Tables.orders(s, dir).select(col("o_custkey").as("custkey"),
            col("o_orderkey"), col("o_totalprice")), lt, "custkey", 8)
        graft.sources.Bucketing.writeBucketed(
          Tables.customer(s, dir).select(col("c_custkey").as("custkey"),
            col("c_name"), col("c_acctbal")), rt, "custkey", 8)
      }
      graft.sources.Bucketing.joinBucketed(s, lt, rt, "custkey")
        .groupBy((col("custkey") % 10).as("cust_bucket"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
            .as("total_price"))
        .orderBy(col("cust_bucket"))
    }),
    // --- JSONL source (schema-on-read over the staged corpus wire format;
    //     JSON string escaping must round-trip text losslessly for the
    //     length sum to match the parquet-side oracle) ---
    "q73_orc_ingest" -> ((s, dir) =>
      // ORC source/sink round-trip (the second columnar lake format): the
      // staged ORC copy must re-aggregate to exactly the parquet oracle —
      // value-preserving write + read, predicate/column pushdown included
      s.read.orc(stagedOrcDocs(s, dir))
        .filter(col("n_chars") > 100)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars").cast("bigint")).as("sum_chars"))
        .orderBy(col("lang"))),
    "q104_schema_evolution" -> ((s, dir) => {
      // schema-evolution read: two parquet generations (the old one lacks
      // `source`/`n_tokens` entirely) merged into ONE scan via mergeSchema
      // — the lake reality where a 100 TB corpus accumulates years of
      // writer versions and a reader must span them without rewriting the
      // old files. Missing columns surface as NULLs; the agg proves both
      // generations are read and the evolved columns carry values only
      // where they exist.
      val (p1, p2) = stagedEvolvedDocs(s, dir)
      s.read.option("mergeSchema", "true").parquet(p1, p2)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("source").isNull, 1L).otherwise(0L)).as("n_legacy"),
          sum(when(col("source").isNotNull, 1L).otherwise(0L)).as("n_current"),
          sum(col("n_chars").cast("bigint")).as("sum_chars"),
          sum(coalesce(col("n_tokens"), lit(0L))).as("sum_tokens_current"))
        .orderBy(col("lang"))
    }),
    "q60_jsonl_ingest" -> ((s, dir) =>
      s.read.schema("doc_id BIGINT, lang STRING, n_chars INT, text STRING")
        .json(stagedJsonlDocs(s, dir))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars").cast("bigint")).as("sum_chars"),
          sum(length(col("text")).cast("bigint")).as("sum_text_len"))
        .orderBy(col("lang"))),
    // --- partitioned parquet sink + partition-pruned scan (the 100 TB
    //     layout: lang=... directories; the filter prunes at the FILE level
    //     before any row is read — PlanSpec asserts PartitionFilters) ---
    "q61_partitioned_scan" -> ((s, dir) => {
      val path = stagedLangPartitionedDocs(s, dir)
      s.read.parquet(path)
        .filter(col("lang").isin("en", "de"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars").cast("bigint")).as("sum_chars"))
        .orderBy(col("lang"))
    }),
    // --- CSV source parity (S1 + P1-P7 end-to-end on an Instacart-shaped
    //     fixture staged FROM the parquet, so the oracle can mirror it) ---
    "q53_csv_ingest" -> ((s, dir) => {
      val raw = Ingest.csv(s, stagedInstacartCsv(s, dir)) // S1: header, all-string
      val typed = Ingest.castInt(Ingest.canonicalProjection(raw), // P1+P2
        "order_id", "user_id", "order_dow", "order_hour_of_day",
        "department_id") // P6: permissive casts; planted "NA" rows -> NULL
      val rec = Recode.copyColumn( // P5
        Recode.withDayName(Recode.withDowBucket(typed)), // P3 + P4
        "department", "dept_alias")
      rec.filter(col("department_id").isin(1, 2, 3, 4, 5)) // P7
        .groupBy(col("days"), col("order_dow_updated"))
        .agg(count(lit(1)).as("n"),
          sum(col("order_hour_of_day")).cast("bigint").as("sum_hour"))
        .orderBy(col("days"))
    }),
    // --- round-9 additions: retrieval eval, bigram LM, deterministic
    //     heavy hitters, shard planning, embedding DQ, curriculum order ---
    "q164_retrieval_eval" -> ((s, dir) =>
      // offline ranker evaluation (MRR / hits@10 / nDCG@10) of the
      // tf-ranking against binary relevance tf>=3, for the q98 probe
      // terms. nDCG discounts are a FIXED integer micro-unit table inlined
      // identically in the oracle (no transcendental at query time); MRR
      // is exact integer division; the ranking itself is the bounded
      // top-k aggregate — O(k) map-side state, never a corpus-sized
      // ranking window. See operators.RetrievalEval.
      graft.operators.RetrievalEval.evaluate(
        Parallelize.ensure(Tables.documents(s, dir)),
        Seq("data", "hash", "join", "scan", "vector"), k = 10, relevanceTf = 3)),
    "q165_bigram_perplexity" -> ((s, dir) =>
      // interpolated bigram-LM cross-entropy per document — q134's
      // unigram quality filter taken to order 2 (lambda=0.75 bigram MLE +
      // 0.25 unigram, one consistent bigram-event sample space so no
      // zero-probability events). Same round-9 DECIMAL-surprisal
      // discipline: -ln p rounded to 9dp once per bigram type, summed as
      // exact decimals, one final float division. Map-only pair
      // construction (arrays_zip over the token array — no self-join);
      // the raw event stream probes the model through SHUFFLE_HASH
      // joins (build = vocab-sized side) — one event-sized shuffle in
      // the whole plan (round-13 funnel, THREESCALE.md §13). See
      // operators.BigramLM.
      graft.operators.BigramLM
        .crossEntropy(Parallelize.ensure(Tables.documents(s, dir)))
        .orderBy(col("doc_id"))),
    "q166_heavy_hitters" -> ((s, dir) =>
      // deterministic exact heavy hitters (tokens above 2% corpus
      // frequency): a mergeable Misra-Gries summary (k=64 counters, KB of
      // state per partition) proposes candidates — provably a superset of
      // the 2%-heavy set since 2% > 1/65 — and an exact recount over the
      // <=64-candidate semi-join decides. The vocabulary-sized groupBy a
      // naive exact count would shuffle never happens; the output (exact
      // counts) is independent of every MG internal, which is what the
      // plain GROUP-BY oracle checks. See operators.HeavyHitters.
      graft.operators.HeavyHitters.exactHeavyHitters(
        Parallelize.ensure(Tables.documents(s, dir))
          .select(explode(split(trim(col("text")), " +")).as("token"))
          .filter(length(col("token")) > 0),
        "token", k = 64, num = 1L, denom = 50L)),
    "q167_shard_plan" -> ((s, dir) =>
      // balanced output-shard planning: docs descend by size and snake
      // across 8 shards (serpentine LPT). The global rank this needs is
      // the two-pass DISTRIBUTED rank (range repartition + per-partition
      // offsets — one long per partition on the driver), NOT a
      // single-partition row_number window; the oracle replays the same
      // total order with a plain window at DuckDB's scale. See
      // operators.ShardPlan / DistRank.
      graft.operators.ShardPlan.summary(
        graft.operators.ShardPlan.assign(
          Parallelize.ensure(Tables.documents(s, dir)),
          "doc_id", col("n_chars"), nShards = 8))),
    "q168_embedding_audit" -> ((s, dir) => {
      // embedding-table DQ audit (dimension drift / NaN / zero vectors /
      // exact quantized norm mass) per label. Every verdict is an integer
      // both engines derive identically: floor-quantized squared norms
      // (floor of a double is engine-exact — the q159 rule), codegen'd
      // single-call kernels, one label-keyed aggregate. Every 97th vector
      // gets a planted NaN head element and every 89th is zeroed
      // (planted identically in the oracle) so the audit is non-vacuous
      // on clean driver data. See operators.EmbeddingAudit.
      val e = Tables.embeddings(s, dir)
      val planted = e.withColumn("vec",
        when(pmod(col("vec_id"), lit(97)) === 0,
          concat(array(lit(Float.NaN)),
            slice(col("embedding"), lit(2), size(col("embedding")) - 1)))
          .when(pmod(col("vec_id"), lit(89)) === 0,
            array_repeat(lit(0.0f), size(col("embedding"))))
          .otherwise(col("embedding")))
      graft.operators.EmbeddingAudit.audit(
        Parallelize.ensure(planted), col("vec"), col("label"), expectedDim = 64)
    }),
    "q169_curriculum_interleave" -> ((s, dir) =>
      // deterministic stratified curriculum order: per-lang quality rank
      // (q155 margin, ties doc_id) round-robined across langs; the global
      // position is the computed bijection (rank-1)*n_langs + lang_idx —
      // write-time ordering is a range-partition on a FORMULA, never a
      // global sort or driver merge. Preview of the first 40 positions;
      // rank prunes before anything is ordered. See operators.Curriculum.
      graft.operators.Curriculum.interleave(
        Parallelize.ensure(Tables.documents(s, dir)),
        "lang", "doc_id",
        graft.functions.QualityExprs.qualityMargin(col("text")), take = 40)),
    // --- round-10 additions: split manifest, PII scrub audit, split
    //     leakage, n-gram frequency spectrum ---
    "q170_split_manifest" -> ((s, dir) =>
      // deterministic content-hash train/val/test split (80/10/10): the
      // bucket is kmv_key(normalized text) mod 100 — the engine-replayable
      // rolling-31 → Knuth-spread key of the KMV/dedup family — so
      // byte-identical docs land in the SAME split (dedup-coherent) and
      // the split reproduces under any re-shuffle/re-ingest; no RNG, no
      // row order anywhere in the decision. Manifest = one (split, lang)
      // agg with the id_sum integrity checksum. See operators.SplitPlan.
      graft.operators.SplitPlan.manifest(
        graft.operators.SplitPlan.assign(
          Parallelize.ensure(Tables.documents(s, dir)), "text",
          pctTrain = 80, pctVal = 10),
        "doc_id", "text", "lang")),
    "q171_pii_scrub" -> ((s, dir) => {
      // PII scrubbing audit over planted addresses: every 13th doc gains
      // a deterministic email, every 17th an IPv4 literal (planted
      // identically in the oracle so the audit is non-vacuous on clean
      // driver data — the q168 planting rule). Patterns restricted to the
      // Java-regex/RE2-identical subset; counts and the exact
      // chars-removed delta are integers both engines derive identically.
      // Map-only regexp passes + one lang agg. See operators.PiiScrub.
      val d = Tables.documents(s, dir)
      val planted = d.withColumn("text",
        concat(col("text"),
          when(pmod(col("doc_id"), lit(13)) === 0,
            concat(lit(" contact user"), col("doc_id").cast("string"),
              lit("@example.com"))).otherwise(lit("")),
          when(pmod(col("doc_id"), lit(17)) === 0,
            concat(lit(" from 10.0."),
              pmod(col("doc_id"), lit(256)).cast("string"),
              lit(".7 gateway"))).otherwise(lit(""))))
      graft.operators.PiiScrub.audit(
        Parallelize.ensure(planted), "text", "lang")
    }),
    "q172_split_leakage" -> ((s, dir) =>
      // cross-split leakage audit: val-side token 5-grams that also occur
      // anywhere in the train split (q80's decontamination shape applied
      // to the q170 split boundary). Exact duplicates CANNOT leak — the
      // content-hash split co-locates them — so every hit is partial
      // overlap crossing the boundary. Gram-keyed distinct + semi-join;
      // per-lang distinct-doc/distinct-gram counts. See operators.SplitPlan.
      graft.operators.SplitPlan.leakage(
        graft.operators.SplitPlan.assign(
          Parallelize.ensure(Tables.documents(s, dir)), "text",
          pctTrain = 80, pctVal = 10),
        "doc_id", "text", "lang", n = 5)),
    "q173_freq_spectrum" -> ((s, dir) =>
      // trigram frequency-spectrum (type counts per occurrence frequency,
      // f = 1..10 + tail): the hapax/Zipf shape check a corpus slice gets
      // before training. One explode + the vocab-sized type count the LM
      // stages already build + a <=11-row spectrum agg; output size is
      // independent of corpus size. See operators.FreqSpectrum.
      graft.operators.FreqSpectrum.spectrum(
        Parallelize.ensure(Tables.documents(s, dir)), "text",
        n = 3, capF = 10)),
    "q174_skew_profile" -> ((s, dir) =>
      // shuffle-key skew profile of events.user_id — the measurement that
      // decides salting/AQE-skew-split before a 100 TB join. One key
      // count agg (vocab-sized, map-side partials), then everything runs
      // on the count-of-counts table (provably <= ~sqrt(2n) rows) with
      // the percentiles as an inverse CDF over keys; top-k mass via
      // TakeOrdered; exact integer DIV for the ppm shares and the
      // max/median ratio. ONE output row at any scale. See
      // operators.SkewProfile.
      graft.operators.SkewProfile.profile(
        Tables.events(s, dir).select(col("user_id")), "user_id", k = 10)),
    "q175_long_span_dedup" -> ((s, dir) =>
      // Lee-et-al long-span substring dedup (arXiv 2107.06499): per-doc
      // maximal token spans >= 50 tokens whose every 50-token window
      // repeats somewhere in the corpus (cross-doc or within-doc), via
      // position-ordered xxhash64 window stream -> gram-keyed count>=2 ->
      // semi-join back (ReusedExchange) -> per-doc gaps-and-islands
      // interval union. No suffix array, no driver state; the oracle
      // carries full gram strings so every gate run doubles as the hash
      // collision audit. Non-vacuous unplanted at every scale (the
      // template near-dups share >=50-token prefixes). See dedup.SpanDedup.
      graft.dedup.SpanDedup.profile(
        Parallelize.ensure(Tables.documents(s, dir)),
        "doc_id", "text", n = 50)),
    "q176_domain_blocklist" -> ((s, dir) => {
      // CCNet-style domain blocklist: four blocked source domains as a
      // broadcast anti/left join — the corpus side never shuffles; audit
      // and filter share the one blocked bit. Per-lang kept/blocked
      // counts + kept chars. See operators.DomainFilter.
      import s.implicits._
      val blocklist = Seq("src3", "src7", "src13", "src19").toDF("domain")
      graft.operators.DomainFilter.blocklistAudit(
        Parallelize.ensure(Tables.documents(s, dir)),
        "source", "lang", "n_chars", blocklist)
    }),
    "q177_domain_mass_cap" -> ((s, dir) =>
      // per-domain corpus-share cap at 4% (40000 ppm): over-cap domains
      // hash-thinned by the deterministic keep rule
      // spread(doc_id) * n_domain < capN * 2^32 (exact DECIMAL cross-
      // multiply — no division, no RNG, no per-domain sort; the giant
      // domain is never sorted). One vocab-sized domain count agg, 1-row
      // total broadcast, map-side decision. See operators.DomainFilter.
      graft.operators.DomainFilter.capAudit(
        Parallelize.ensure(Tables.documents(s, dir)),
        "source", "doc_id", capPpm = 40000L)),
    "q178_span_removal" -> ((s, dir) =>
      // the Lee-et-al dedup ITSELF (q175 is the audit): every repeated
      // 50-token window keeps exactly its canonical (lowest (doc, pos),
      // as one BIGINT id*2^20+pos min) occurrence; tokens covered only by
      // non-canonical repeated windows are cut and the text rejoined.
      // Per-lang counts + a kmv_key checksum of every FINAL text, so the
      // oracle pins the reconstructed bytes, not just the counts. See
      // dedup.SpanDedup.removeSpans/removalAudit.
      graft.dedup.SpanDedup.removalAudit(
        Parallelize.ensure(Tables.documents(s, dir)),
        "doc_id", "text", "lang", n = 50)),
    "q179_editdist_blocking_stats" -> ((s, dir) =>
      // the q136 blocking FUNNEL as a first-class oracle-gated row — the
      // no-silent-caps adjudication the round-11 verdict ordered: how many
      // variant rows the deletion neighborhoods emit, how many candidate
      // slots the variant join produces, how many survive the threshold
      // verify, how many distinct pairs remain. The oracle replays the
      // funnel with variant STRINGS where the engine joins 8-byte
      // xxhash64 keys, so a passing gate is simultaneously the
      // hash-collision audit for the re-keyed join (a collision would
      // inflate n_candidates on the engine side only).
      graft.dedup.EditDistanceJoin
        .blockingStats(Tables.customer(s, dir), "c_custkey", "c_name")),
    "q180_prefix_blocking_stats" -> ((s, dir) =>
      // q133's funnel, order-blind columns only: n_candidate_slots /
      // n_candidate_pairs depend on WHICH tokens land in each df-sorted
      // prefix, and the engine tie-breaks equal-df tokens by 64-bit hash
      // where a string-based oracle tie-breaks by gram text — same
      // worst-case bound, different draws. The gated columns (doc count,
      // total prefix mass, verified pairs) are order-independent theorems;
      // the candidate counts are logged per-scale in THREESCALE.md and
      // invariant-asserted in PrefixFilterJoinSpec.
      graft.dedup.PrefixFilterJoin
        .blockingStats(Tables.documents(s, dir), num = 4, den = 5,
          shingleWords = 5)
        .select(col("n_docs"), col("n_prefix_rows"), col("n_result_pairs"))),
    "q181_bpe_merges64" -> ((s, dir) =>
      // tokenizer training past the toy: 64 merge rules through the
      // round-12 BATCHED selector (top-batchLimit collect, driver accepts
      // a provably sequential-identical disjoint prefix — BpeTrainer
      // scaladoc carries the dominance proof). The oracle is the SAME
      // one-merge-per-round SQL unroll at n=64, so a passing gate is a
      // bit-level proof that batching changed nothing but the round-trip
      // count.
      graft.operators.BpeTrainer.learnMerges(
        Parallelize.ensure(Tables.documents(s, dir)), nMerges = 64)),
    "q182_planted_dedup_groups" -> ((s, dir) =>
      // q21's operator (exact duplicate-group listing) over corpus +
      // planted: the 8 planted exact-dup pairs (Planted.docRows, e in
      // 40..47) make the duplicate-groups path non-vacuous at EVERY
      // scale — q21 itself is 0-rows-on-both-engines at the sf0.01 gate
      // (the organic corpus has no exact-duplicate texts there), which
      // exercises the md5-keyed groupBy only vacuously. Planted
      // vocabulary is corpus-disjoint, so the planted canonical slice is
      // closed-form: one group per pair, n_copies = 2.
      graft.dedup.ExactDedup.duplicateGroups(
          Parallelize.ensure(Tables.documents(s, dir))
            .unionByName(Planted.docs(s)))
        .filter(col("canonical_id") >= Planted.base)),
    "q183_ann_index_persist" -> ((s, dir) => {
      // the production retrieval shape: a PERSISTED ANN index (PQ codes +
      // codebook + IVF coarse lists as parquet, staged once per sf dir)
      // is LOADED from disk — training never runs in the query path after
      // the first staging — and queried through the composed
      // IVF-probe -> ADC-shortlist -> exact-refine pipeline. Recall
      // floor: refined top-10 recovers >= 6/10 of the exact cosine
      // top-10 per query (floor-gate TRUE at sf0.01 and sf0.1; measured
      // per-query hits 9-10/10 at sf0.001 in AnnIndexSpec; nProbe=8 of
      // 16 lists, shortlist=150). See similarity.AnnIndex.
      val emb = Tables.embeddings(s, dir)
      val idx = graft.similarity.AnnIndex.load(s, stagedAnnIndex(s, dir))
      val queries = graft.similarity.ProductQuantization
        .normalized(emb.filter(col("vec_id") < 5), "embedding", "nvec")
        .orderBy(col("vec_id")).select(col("vec_id"), col("nvec")).collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toSeq
      val approx = graft.similarity.AnnIndex
        .searchRefined(idx, emb, queries, k = 10, nProbe = 8, shortlist = 150)
        .select(col("query_id"), col("neighbor_id"))
      val exact = Knn.bruteForce(emb, emb.filter(col("vec_id") < 5), k = 10)
        .select(col("query_id"), col("neighbor_id"))
      val hits = approx.join(exact, Seq("query_id", "neighbor_id"), "left_semi")
        .groupBy(col("query_id")).agg(count(lit(1)).as("n_hits"))
      exact.groupBy(col("query_id")).agg(count(lit(1)).as("n_exact"))
        .join(hits, Seq("query_id"), "left")
        .select(col("query_id"),
          (coalesce(col("n_hits"), lit(0L)) * 10 >= col("n_exact") * 6).as("meets_floor"))
        .orderBy(col("query_id"))
    }),
    "q184_gopher_repetition" -> ((s, dir) =>
      // the Gopher repetition-filter battery (Rae et al. 2112.11446,
      // Table A1): per-lang counts of docs flagged by each of the nine
      // n-gram rules (top-2/3/4-gram char fraction, duplicated-5..10-gram
      // position-union char coverage) plus the any-rule total. ONE
      // codegen kernel call per document computes all nine exact-integer
      // numerators in a single pass (per-doc gram map, never corpus
      // vocabulary), then one lang agg — no explode, no join, no shuffle
      // before the report. Non-vacuous organically: the synthetic
      // vocabulary is small, so real docs trip the dup-n rules at every
      // scale. See operators.GopherRepetition.
      graft.operators.GopherRepetition.audit(
        Parallelize.ensure(Tables.documents(s, dir)))),
    "q185_planted_gopher_stats" -> ((s, dir) =>
      // planted companion for the dup-n half of the battery (organic
      // corpus: zero duplicated 5..10-grams at the gate scale, so q184's
      // dup columns alone gate 0 == 0). The REAL kernel runs over corpus
      // + planted (map-only, so the planted restriction is trivially
      // sound) and emits the EXACT per-doc numerators for the six
      // rule-docs + control; the oracle rebuilds the same texts literally
      // and replays the battery. See Planted.gopherDocRows.
      graft.operators.GopherRepetition.stats(
          Parallelize.ensure(Tables.documents(s, dir))
            .unionByName(Planted.gopherDocs(s)))
        .filter(col("doc_id") >= Planted.gopherBase)
        .drop("lang")
        .orderBy(col("doc_id"))),
    "q186_dedup_store_exact" -> ((s, dir) => {
      // incremental exact dedup THROUGH THE PERSISTED STORE: the corpus's
      // ingested half (doc_id < 250, + the planted stored docs) is
      // distilled ONCE per sf dir into hash/signature parquet
      // (dedup.DedupStore — the q183 fixture pattern; later invocations
      // only LOAD), and the batch (doc_id >= 250) is ingested against the
      // loaded state: min-id canonical within the batch, hash anti-join
      // vs the store. Counts are exactly q85's semantics, so the oracle
      // replays them from the raw table — what the gate adds over q85 is
      // the disk round-trip: the ingested corpus is never rescanned.
      val store = graft.dedup.DedupStore.load(s, stagedDedupStore(s, dir))
      graft.dedup.DedupStore.exactReport(store,
        Parallelize.ensure(Tables.documents(s, dir))
          .filter(col("doc_id") >= 250))
    }),
    "q187_dedup_store_neardup" -> ((s, dir) => {
      // the near-dup half of the store ingest, property-gated (simhash
      // bit math is engine-internal — the q23/q77 precedent): planted
      // batch groups must come back with exactly their constructed
      // verdicts (exact copies → dup_vs_store; doubled-space variants →
      // near_dup_vs_store, Hamming 0 BY CONSTRUCTION since simhash
      // tokenizes whitespace runs while md5 sees bytes; fresh vocab →
      // new), and every surviving/near verdict must agree with Hamming
      // recomputed OUTSIDE the blocking join (<= 3 iff near) — the gate
      // doubles as the chunk-blocking recall audit. See Planted.dsBase.
      import graft.dedup.DedupStore
      val store = DedupStore.load(s, stagedDedupStore(s, dir))
      val batch = Parallelize.ensure(Tables.documents(s, dir))
        .filter(col("doc_id") >= 250)
        .unionByName(Planted.dedupBatchDocs(s))
      val out = DedupStore.ingest(store, batch)
        .filter(col("doc_id") >= Planted.dsBase)
        .select(col("doc_id"), col("text"), col("verdict"))
      val sims = store.simhashes.select(col("sim").as("ssim"))
      val minHam = out
        .select(col("doc_id"), col("verdict"),
          graft.functions.HashExprs.simhash64(col("text")).as("bsim"))
        .crossJoin(sims)
        .groupBy(col("doc_id"), col("verdict"))
        .agg(min(bit_count(col("bsim").bitwiseXOR(col("ssim")))).as("mh"))
      minHam.agg(
        min(when(col("doc_id").between(Planted.dsBase + 100, Planted.dsBase + 104),
          col("verdict") === "dup_vs_store")).as("exact_copies_suppressed"),
        min(when(col("doc_id").between(Planted.dsBase + 200, Planted.dsBase + 204),
          col("verdict") === "near_dup_vs_store")).as("space_variants_near_suppressed"),
        min(when(col("doc_id").between(Planted.dsBase + 300, Planted.dsBase + 304),
          col("verdict") === "new")).as("fresh_vocab_survives"),
        min(when(col("verdict").isin("new", "near_dup_vs_store"),
          (col("verdict") === "near_dup_vs_store") === (col("mh") <= 3)))
          .as("verdicts_match_recomputed_hamming"))
    }),
    "q192_bpe_merges1k" -> ((s, dir) =>
      // tokenizer training is NOT toy-bounded: 1023 merges through the
      // REAL batched trainer (q181 proved 64). The corpus is the
      // Planted.bpe1kRows round-robin 1-factorization, whose full merge
      // sequence is closed-form (33 waves of 31 symbol-disjoint
      // equal-count pairs, strictly decreasing count across waves), so
      // the oracle GENERATES all 1023 expected rows from the same
      // modular arithmetic — no 1k-round unroll. The batched selector
      // takes one driver trip per wave (33 total); organic-interaction
      // bit-equality vs the sequential trainer is BpeTrainerSpec's
      // batched-vs-batchLimit=1 run. Planted-only by necessity: a
      // corpus union would entangle organic pair counts with the
      // schedule and the sequence would stop being closed-form.
      graft.operators.BpeTrainer.learnMerges(
        Planted.bpe1kDocs(s), nMerges = 1023, batchLimit = 1024)),
    "q191_ann_index_append" -> ((s, dir) => {
      // INCREMENTAL ANN: the staged index is trained on 80% of the
      // corpus and the held-out 20% is APPENDED through the frozen
      // codebooks (AnnIndex.append — new parquet files under codes/,
      // no retraining, no rewrite). The gate is q183's recall floor
      // run against the GROWN index with ground truth over the FULL
      // corpus — so appended vectors must be reachable through the
      // IVF probe AND their frozen-codebook codes must rank well
      // enough to hold quality — plus an index-completeness bit (codes
      // rows == corpus vectors). Two drift bits, designed from the sf1
      // adjudication (Scratch-measured: identity-recall@10 is NOT a
      // stable property here — a query's exact ranks 8-10 sit at
      // cos ~0.37 in a dense near-tie band that PQ distortion reorders
      // freely, and their list legitimately ranks 12th/16, so chasing
      // identity means probing 14/16 lists = no pruning):
      //  - quality_floor: the grown-index top-10's WORST cosine is
      //    within 0.05 of the exact 10th-best (the standard ANN
      //    distance-ratio metric; measured gaps 0.000-0.038 at sf1) —
      //    returned neighbors are as GOOD as exact even where not
      //    identical;
      //  - strong_recovered: every exact neighbor at cosine >= 0.9
      //    (the appended near-copies drift actually threatens) is
      //    identity-recovered.
      val emb = Tables.embeddings(s, dir)
      val idx = graft.similarity.AnnIndex.load(s, stagedAnnAppendIndex(s, dir))
      val queries = graft.similarity.ProductQuantization
        .normalized(emb.filter(col("vec_id") < 5), "embedding", "nvec")
        .orderBy(col("vec_id")).select(col("vec_id"), col("nvec")).collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toSeq
      val approx = graft.similarity.AnnIndex
        .searchRefined(idx, emb, queries, k = 10, nProbe = 10, shortlist = 250)
        .select(col("query_id"), col("neighbor_id"), col("cosine"))
      val exact = Knn.bruteForce(emb, emb.filter(col("vec_id") < 5), k = 10)
        .select(col("query_id"), col("neighbor_id"), col("cosine"))
      // approx_n rides beside approx_min: min(cosine) over an UNDER-FULL
      // result set (probed lists under-populated after append) would bias
      // the floor upward and pass trivially — quality_floor only means
      // "as good as exact" when the grown index actually returned all k
      val approxMin = approx.groupBy(col("query_id"))
        .agg(min(col("cosine")).as("approx_min"),
          count(lit(1)).as("n_approx"))
      val strongMissed = exact.filter(col("cosine") >= 0.9)
        .join(approx.select(col("query_id"), col("neighbor_id")),
          Seq("query_id", "neighbor_id"), "left_anti")
        .groupBy(col("query_id")).agg(count(lit(1)).as("n_strong_missed"))
      val counts = broadcast(idx.codes.agg(count(lit(1)).as("n_codes"))
        .crossJoin(emb.agg(count(lit(1)).as("n_vecs"))))
      exact.groupBy(col("query_id")).agg(min(col("cosine")).as("exact_min"))
        .join(approxMin, Seq("query_id"), "left")
        .join(strongMissed, Seq("query_id"), "left")
        .crossJoin(counts)
        .select(col("query_id"),
          (coalesce(col("approx_min"), lit(-1.0)) >= col("exact_min") - 0.05)
            .as("quality_floor"),
          coalesce(col("n_approx"), lit(0L)).===(10L).as("full_k"),
          coalesce(col("n_strong_missed"), lit(0L)).===(0L)
            .as("strong_recovered"),
          (col("n_codes") === col("n_vecs")).as("index_complete"))
        .orderBy(col("query_id"))
    }),
    "q190_gopher_line_rules" -> ((s, dir) =>
      // the duplicate-line/paragraph half of Rae et al. Table A1
      // (q184/q185 covered the n-gram half; these rules were documented-
      // omitted until round 13 because TESTDATA is single-line). The
      // REAL kernel runs over corpus + the planted MULTILINE docs
      // (map-only, so the planted restriction is trivially sound) and
      // emits all eight exact numerators per doc; the oracle rebuilds
      // the same texts literally (chr(10) joins) and replays the counts
      // via string_split. Conventions pinned in GopherLineKernels:
      // literal '\n'/'\n\n' splits, empty segments excluded, no trim,
      // separator-free char totals. See Planted.gopherMultilineRows.
      graft.operators.GopherRepetition.lineStats(
          Parallelize.ensure(Tables.documents(s, dir))
            .unionByName(Planted.gopherMultilineDocs(s)))
        .filter(col("doc_id") >= Planted.gopherBase + 200)
        .drop("lang")
        .orderBy(col("doc_id"))),
    "q189_dedup_store_purge" -> ((s, dir) => {
      // GDPR-delete THROUGH the persisted dedup store (composes q118's
      // right-to-erasure with q186/q187's store replay): a store staged
      // with planted stored docs, then DedupStore.purge of stored ids
      // dsBase+0/+1 — an O(ids) tombstone append, never a rewrite of
      // the corpus-sized state; load() subtracts tombstones at read
      // time. The planted batch then re-ingests: exact copies and
      // near-variants of the two PURGED docs must come back 'new'
      // (their content genuinely forgotten — both the hash AND the
      // simhash stopped suppressing), while copies/variants of the
      // UNPURGED stored docs keep their q187 verdicts. Property gate
      // (q187 precedent — simhash state is engine-internal).
      import graft.dedup.DedupStore
      val B = Planted.dsBase
      val store = DedupStore.load(s, stagedPurgedDedupStore(s, dir))
      DedupStore.ingest(store, Planted.dedupBatchDocs(s))
        .select(col("doc_id"), col("verdict"))
        .agg(
          min(when(col("doc_id").isin(B + 100, B + 101),
            col("verdict") === "new")).as("purged_exact_reingests_new"),
          min(when(col("doc_id").isin(B + 102, B + 103, B + 104),
            col("verdict") === "dup_vs_store"))
            .as("unpurged_exact_still_suppressed"),
          min(when(col("doc_id").isin(B + 200, B + 201),
            col("verdict") === "new")).as("purged_near_reingests_new"),
          min(when(col("doc_id").isin(B + 202, B + 203, B + 204),
            col("verdict") === "near_dup_vs_store"))
            .as("unpurged_near_still_suppressed"),
          min(when(col("doc_id") >= B + 300,
            col("verdict") === "new")).as("fresh_still_new"))
    }),
    "q188_soft_dedup" -> ((s, dir) =>
      // soft dedup: duplicates are down-WEIGHTED (1/n_copies each, so
      // every distinct content carries total sampling mass 1), not
      // dropped — copies keep their provenance. The audit is the per
      // (lang, n_copies) stratum profile with exact-integer columns; the
      // soft token mass of a stratum is sum_tokens / n_copies with no
      // row-level division anywhere. Planted exact-dup pairs make the
      // n_copies = 2 strata non-vacuous at every scale (the organic
      // corpus has none at the gate scale). One md5-keyed count agg +
      // exchange-reused join back + a vocab-sized report agg. See
      // dedup.SoftDedup.
      graft.dedup.SoftDedup.massProfile(
        Parallelize.ensure(Tables.documents(s, dir))
          .unionByName(Planted.docs(s)))),
    "q193_ann_index_purge" -> ((s, dir) => {
      // GDPR-delete THROUGH the ANN index (composes q189's erasure
      // verdicts with q191's quality floor): the staged index is built on
      // the FULL corpus, then each query's exact top-2 organic neighbors
      // (vec_id >= 5, so queries stay in the corpus) are PURGED —
      // AnnIndex.purge, an O(ids) tombstone append that load() subtracts
      // at read time; codes/ is never rewritten. Per-query bits:
      //  - purge_tested: >= 1 purged id sits in the query's exact
      //    FULL-corpus top-10 (the purge set would otherwise be returned
      //    — non-vacuity, by construction of the staging);
      //  - no_purged_returned: the loaded index returns ZERO purged ids
      //    (the erased vectors are unreachable, merge-on-read);
      //  - quality_floor + full_k: the post-purge top-10 holds q191's
      //    distance-ratio floor against exact search over the REMAINING
      //    corpus with all k rows present — ranks close up correctly;
      //  - index_complete: visible codes == corpus minus purged.
      val emb = Tables.embeddings(s, dir)
      val idxDir = stagedAnnPurgeIndex(s, dir)
      val idx = graft.similarity.AnnIndex.load(s, idxDir)
      val purged = s.read.parquet(s"$idxDir/tombstones")
      val queries = graft.similarity.ProductQuantization
        .normalized(emb.filter(col("vec_id") < 5), "embedding", "nvec")
        .orderBy(col("vec_id")).select(col("vec_id"), col("nvec")).collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toSeq
      val approx = graft.similarity.AnnIndex
        .searchRefined(idx, emb, queries, k = 10, nProbe = 10, shortlist = 250)
        .select(col("query_id"), col("neighbor_id"), col("cosine"))
      val remaining = emb.join(purged, emb("vec_id") === purged("purged_id"),
        "left_anti")
      val exactRem = Knn.bruteForce(remaining, emb.filter(col("vec_id") < 5), k = 10)
        .select(col("query_id"), col("cosine"))
      val exactFull = Knn.bruteForce(emb, emb.filter(col("vec_id") < 5), k = 10)
        .select(col("query_id"), col("neighbor_id"))
      val tested = exactFull
        .join(purged, exactFull("neighbor_id") === purged("purged_id"), "left_semi")
        .groupBy(col("query_id")).agg(count(lit(1)).as("n_would_return"))
      val leaked = approx
        .join(purged, approx("neighbor_id") === purged("purged_id"), "left_semi")
        .groupBy(col("query_id")).agg(count(lit(1)).as("n_leaked"))
      val approxMin = approx.groupBy(col("query_id"))
        .agg(min(col("cosine")).as("approx_min"), count(lit(1)).as("n_approx"))
      val counts = broadcast(idx.codes.agg(count(lit(1)).as("n_codes"))
        .crossJoin(emb.agg(count(lit(1)).as("n_vecs")))
        .crossJoin(purged.agg(countDistinct(col("purged_id")).as("n_purged"))))
      exactRem.groupBy(col("query_id")).agg(min(col("cosine")).as("exact_min"))
        .join(tested, Seq("query_id"), "left")
        .join(leaked, Seq("query_id"), "left")
        .join(approxMin, Seq("query_id"), "left")
        .crossJoin(counts)
        .select(col("query_id"),
          coalesce(col("n_would_return"), lit(0L)).>=(1L).as("purge_tested"),
          coalesce(col("n_leaked"), lit(0L)).===(0L).as("no_purged_returned"),
          (coalesce(col("approx_min"), lit(-1.0)) >= col("exact_min") - 0.05)
            .as("quality_floor"),
          coalesce(col("n_approx"), lit(0L)).===(10L).as("full_k"),
          (col("n_codes") === col("n_vecs") - col("n_purged")).as("index_complete"))
        .orderBy(col("query_id"))
    }),
    "q195_gopher_line_organic" -> ((s, dir) => {
      // ORGANIC multiline corpus for the line/paragraph rules — q190
      // gates the five planted shapes; this gate proves the same kernel
      // on corpus-DERIVED text whose size grows with the corpus at every
      // scale. Construction (replayed literally by the oracle): documents
      // group by doc_id % 50; each group's texts, ordered by doc_id, are
      // joined with '\n' (every 3rd boundary '\n\n', so paragraphs are
      // non-trivial runs) and the group's FIRST text is appended once
      // more after a final '\n' — exactly one duplicated line per group,
      // so the dup numerators are non-vacuous organically. The kernel
      // then runs per group-doc (single-pass, map-only); one 50-row agg
      // feeds the report. n_lines per group = corpus/50, so the gate's
      // text volume scales 1:1 with the corpus. NOTE the collect_list
      // group build is FIXTURE SYNTHESIS, not the operator's scale
      // shape: real multiline corpora arrive as multiline documents
      // (each row one crawl page), and lineStats over them is the q190
      // map-only scan — this construction exists only because TESTDATA
      // documents are single-line, and 50 corpus-sized rows is the
      // fixture's deliberate cap, not a pattern to ship.
      val docs = Parallelize.ensure(Tables.documents(s, dir))
        .filter(length(col("text")) > 0)
      val grouped = docs
        .select((col("doc_id") % 50).as("g"), col("doc_id").as("i"),
          col("text").as("t"))
        .groupBy(col("g"))
        .agg(sort_array(collect_list(struct(col("i"), col("t")))).as("arr"))
        .select(col("g").cast("long").as("doc_id"),
          concat(
            array_join(transform(col("arr"), (x, i) =>
              concat(when(i === 0, lit(""))
                .when(i % 3 === 0, lit("\n\n"))
                .otherwise(lit("\n")), x.getField("t"))), ""),
            lit("\n"), element_at(col("arr"), 1).getField("t")).as("text"),
          lit("organic").as("lang"))
      graft.operators.GopherRepetition.lineStats(grouped)
        .drop("lang")
        .orderBy(col("doc_id"))
    }),
    "q194_quality_train" -> ((s, dir) => {
      // classifier training IN-ENGINE: q155 ships fixed hashed weights;
      // a real pipeline trains them. The batch perceptron
      // (operators.QualityTrainer — sum-form update, order-independent,
      // exact integers) runs to convergence on the planted linearly
      // separable set, staged once per JVM (training is
      // corpus-independent: planted-only, the q192 precedent — a corpus
      // union would entangle the closed-form schedule). The oracle
      // derives the converged weights CLOSED-FORM as
      // posCount(f) − negCount(f) per feature hash — valid because the
      // construction pins the 3-round schedule (proof + collision-free
      // hash audit in Planted.qualityTrainRows / PlantedSpec).
      s.read.parquet(stagedQualityWeights(s)).orderBy(col("feat"))
    }),
    "q196_quality_trained_score" -> ((s, dir) => {
      // inference under the TRAINED weight table — the decision surface
      // q161/q162 consume, now backed by learned weights instead of the
      // hash projection: the HELD-OUT eval docs (never seen in training;
      // pos/neg vocab mixtures with cross-class boundary bigrams that
      // are absent from the table and must score 0) run through
      // QualityTrainer.scoreWith — same gram extraction as q155, one
      // vocab-keyed join, one per-doc sum. The oracle rebuilds the
      // trained table closed-form and replays the join per eval doc.
      graft.operators.QualityTrainer.scoreWith(
          Planted.qualityEvalDocs(s),
          s.read.parquet(stagedQualityWeights(s)))
        .orderBy(col("doc_id"))
    }),
    "q197_bpe_distilled_1k" -> ((s, dir) =>
      // the 32k-regime trainer shape (BpeTrainer.learnMergesDistilled):
      // one distributed corpus pass distills the vocab-sized word table,
      // then the merge loop runs driver-side with per-word incremental
      // recompute — ZERO cluster trips per merge (q192's batched path
      // takes one per wave; its acceptance is provably maximal for
      // single-list batching, so the regime fix is distillation, not a
      // bigger batch). Gate: the full 1023-merge closed-form schedule of
      // the q192 construction, hash-exact through THIS path — same
      // oracle, so the two trainers are pinned to the same sequence.
      graft.operators.BpeTrainer.learnMergesDistilled(
        Planted.bpe1kDocs(s), nMerges = 1023)),
    "q198_quality_trained_budget" -> ((s, dir) => {
      // the TRAINED weights flowing into the q161 consumer: the same
      // budget-greedy curriculum cut, but ranked by TRAINED margins
      // (scoreWith join) instead of the fixed hash projection — the
      // full train→score→select composition over the planted strata
      // (qpos/qneg/qeval), 64-token budget so every lang cuts mid-list.
      // The oracle rebuilds the weight table closed-form, re-joins each
      // doc's grams, and replays the (margin DESC, doc_id) running-sum
      // prefix exactly (q161's window shape).
      val docs = Planted.qualityTrainDocs(s)
        .unionByName(Planted.qualityEvalDocs(s))
      val scored = graft.operators.QualityTrainer.scoreWith(
        docs, s.read.parquet(stagedQualityWeights(s)))
      graft.operators.Mixing.budgetGreedySelect(
          docs.join(scored.select(col("doc_id"), col("margin_units")),
            Seq("doc_id")),
          "lang",
          scoreCol = col("margin_units"),
          tokensCol = TextFunctions.tokenCount(col("text")),
          budgetTokens = 64L)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("_nt")).as("tokens"),
          min(col("_score")).as("cutoff_margin"),
          max(col("doc_id")).as("max_doc_id"))
        .orderBy(col("lang"))
    }),
    "q199_bpe_encode_32k" -> ((s, dir) => {
      // the SERVING half of the 32k-merge regime: subword counts under
      // the full 1023-merge distilled table AND under its 500-merge
      // prefix, via BpeTrainer.encodeWithTable — the mapPartitions
      // rank-priority encoder (subwordCounts' chained literal replaces
      // would nest 1023 expressions into ONE projection; the plan itself
      // would be O(table)). Closed form on the planted corpus: every doc
      // is one 2-char pair repeated freq_w times, so n_subwords = freq
      // when the doc's pair sits inside the applied prefix and 2*freq
      // when it doesn't — the oracle regenerates each doc's rank from
      // the schedule arithmetic, so the gate checks BOTH the merged and
      // the not-yet-merged paths of the encoder at every scale.
      val docs = Planted.bpe1kDocs(s)
      val merges = graft.operators.BpeTrainer
        .learnMergesDistilled(docs, nMerges = 1023)
        .orderBy(col("round")).collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      val full = graft.operators.BpeTrainer.encodeWithTable(docs, merges)
        .withColumnRenamed("n_subwords", "n_sub_full")
      val prefix = graft.operators.BpeTrainer
        .encodeWithTable(docs, merges.take(500))
        .select(col("doc_id"), col("n_subwords").as("n_sub_500"))
      full.join(prefix, Seq("doc_id")).orderBy(col("doc_id"))
    }),
    "q200_ann_drift_audit" -> ((s, dir) => {
      // the MEASURED retrain trigger the q191 append path promised: an
      // index trained on 80% of the corpus (the q191 split), audited
      // against (a) the organic held-out 20% — same distribution, so
      // neither the assignment-share TVD nor the distortion ratio moves
      // (measured tvd 0.02-0.12, ratio 0.95-1.05 across four contexts,
      // THREESCALE §15) — and (b) the SAME batch collapsed onto one
      // fixed direction (every coordinate 1.0; normalization makes them
      // identical unit vectors), which assigns every vector to a single
      // coarse list, so tvd = 1 − train_share(that list) ≥ 1 − max
      // share ≈ 0.9 — provably past any sane threshold by construction.
      // The audit is one narrow map per axis + an nLists-row join + a
      // 1-row agg; retrain is the queryable bit a pipeline gates a full
      // re-write() on, composing with append (audit BEFORE appending).
      val emb = Tables.embeddings(s, dir)
      val idxDir = stagedAnnDriftIndex(s, dir)
      val heldOut = emb.filter(col("vec_id") % 5 === 4)
      val shifted = heldOut.withColumn("embedding",
        expr("transform(embedding, x -> CAST(1.0 AS DOUBLE))"))
      graft.similarity.AnnIndex.driftAudit(s, idxDir, heldOut)
        .select(lit("control").as("batch_tag"), col("n_batch"),
          col("share_drifted"), col("retrain"))
        .unionByName(
          graft.similarity.AnnIndex.driftAudit(s, idxDir, shifted)
            .select(lit("shifted").as("batch_tag"), col("n_batch"),
              col("share_drifted"), col("retrain")))
        .orderBy(col("batch_tag"))
    }),
    "q201_quality_train_averaged" -> ((s, dir) => {
      // the AVERAGED perceptron on a NON-separable set — train()'s
      // unpinned "last iterate after maxRounds" becomes the stable
      // integer sum Σ_t w_t (sign-equivalent to the average). The
      // planted set is q194's plus ONE duplicated-and-flipped positive
      // doc (doc-exclusive grams make any duplicate-free labeling
      // separable, so the duplicate pair is the minimal noise); the
      // loop 2-cycles from round 3 and the oracle derives weight_sum =
      // 8·posCnt − 7·negCnt + 3·dupCnt closed-form (rounds = 8
      // pinned — the averaging horizon is part of the semantics).
      // Derivation in QualityTrainer.trainAveraged's scaladoc.
      s.read.parquet(stagedAveragedWeights(s)).orderBy(col("feat"))
    }),
    "q202_quality_averaged_score" -> ((s, dir) =>
      // q196 re-gated on the averaged table: the held-out eval docs
      // score through the SAME scoreWith join (weight_sum renamed in —
      // sign-equivalence means `kept` keeps its margin>0 contract);
      // cross-class boundary bigrams stay absent and contribute 0.
      graft.operators.QualityTrainer.scoreWith(
          Planted.qualityEvalDocs(s),
          s.read.parquet(stagedAveragedWeights(s))
            .withColumnRenamed("weight_sum", "weight"))
        .orderBy(col("doc_id"))),
    "q203_quality_averaged_budget" -> ((s, dir) => {
      // q198 re-gated on the averaged weights: same selection pool
      // (train + eval strata — the flipped duplicate trains the table
      // but does NOT enter the curriculum), same budget-greedy
      // (margin DESC, doc_id) 64-token prefix per lang, margins from
      // the averaged table.
      val docs = Planted.qualityTrainDocs(s)
        .unionByName(Planted.qualityEvalDocs(s))
      val scored = graft.operators.QualityTrainer.scoreWith(
        docs, s.read.parquet(stagedAveragedWeights(s))
          .withColumnRenamed("weight_sum", "weight"))
      graft.operators.Mixing.budgetGreedySelect(
          docs.join(scored.select(col("doc_id"), col("margin_units")),
            Seq("doc_id")),
          "lang",
          scoreCol = col("margin_units"),
          tokensCol = TextFunctions.tokenCount(col("text")),
          budgetTokens = 64L)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("_nt")).as("tokens"),
          min(col("_score")).as("cutoff_margin"),
          max(col("doc_id")).as("max_doc_id"))
        .orderBy(col("lang"))
    }),
    "q204_bpe_encode_ids" -> ((s, dir) => {
      // the tokenizer FINISHED: id sequences (what a training pipeline
      // consumes — q199 stopped at subword counts) through the
      // PERSISTED store (train once at q197 cost, BpeStore.write with
      // the SwapDir staging discipline, load and serve forever). Vocab
      // contract: base symbols (training alphabet, UTF-8-binary order)
      // get ids 0..61 here, merge outputs 62 + (round−1). Both serving
      // regimes gate: the full 1023-merge table (every word collapses
      // to its merge's single id — exercising merge-output ids) and the
      // 500-merge prefix (unmerged words emit their two BASE ids in
      // order — exercising the base block). Closed form via the q192
      // schedule arithmetic: doc (w,i)'s pair has rank rnk(w,lft,rgt),
      // so ids are [61+rnk] × (100−2w), or [lo,hi] × (100−2w) when
      // rnk > 500.
      val docs = Planted.bpe1kDocs(s)
      val store = graft.operators.BpeStore.load(s, stagedBpeStore(s))
      def exploded(tag: String, merges: Seq[(String, String)]) =
        graft.operators.BpeTrainer
          .encodeToIds(docs, merges, store.vocab)
          .select(lit(tag).as("variant"), col("doc_id"),
            posexplode(col("ids")).as(Seq("pos", "token_id")))
      exploded("full", store.merges)
        .unionByName(exploded("p500", store.merges.take(500)))
        .orderBy(col("variant"), col("doc_id"), col("pos"))
    }),
    "q205_jpeg_decode" -> ((s, dir) => {
      // REAL JDK baseline-JPEG decode (q28's shape; the crawl-first
      // format the PNG path didn't cover). JPEG is lossy, so the grid
      // is pinned by CONSTRUCTION instead of losslessness: gray
      // two-tone splits on an 8-pixel boundary at quality 1.0 — DC-only
      // spectra under all-ones quant tables, flat 128 chroma under
      // subsampling — decode to exactly the constructed pixels
      // (JpegCodecSpec proves it on this JDK, incl. bit-invariance vs
      // the PNG path and a counterexample showing the constraints are
      // load-bearing). The engine parses a real JFIF container per row;
      // the oracle re-derives dims and channel sums from documents.
      import graft.multimodal.Multimodal.JpegCodec
      import s.implicits._
      Parallelize.ensure(
        s.read.parquet(stagedJpegMedia(s, dir))
          .filter(col("media_type") === "image")
          .select(col("media_id"), col("payload"))).as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, p) =>
          val st = JpegCodec.decodeStats(p)
          (id, st.width, st.height, st.width.toLong * st.height,
            st.sum_r, st.sum_g, st.sum_b)
        })
        .toDF("media_id", "width", "height", "n_pixels", "sum_r", "sum_g", "sum_b")
        .orderBy(col("media_id"))
    }),
    "q207_sequence_pack" -> ((s, dir) => {
      // the training-data last mile: the corpus's tokens concatenated in
      // doc_id order and cut into fixed 512-token sequences, documents
      // crossing boundaries (GPT pack-and-split — zero padding waste,
      // the per-sequence document spans are the attention-mask
      // metadata). The only global state is the exclusive token prefix
      // sum over the total order — DistRank.prefixSum's two-pass range
      // shuffle (one long per partition on the driver), NEVER a
      // single-partition window; everything downstream is arithmetic on
      // (start_offset, n_tokens), so a SQL cumsum replays every
      // sequence bit-for-bit. Every sequence carries exactly 512 tokens
      // except the stream tail.
      val packed = graft.operators.SequencePack.assign(
        Tables.documents(s, dir), 512L)
      graft.operators.SequencePack.summary(packed, 512L)
    }),
    "q211_stream_store_restart" -> ((s, dir) =>
      // q209 ACROSS A RESTART (the q75 two-incarnation pattern):
      // incarnation 1 drains chunks 0-1 and stops; chunk 2 arrives;
      // incarnation 2 resumes from the same checkpoint — it must skip
      // the committed batches (exactly_once row accounting: every doc
      // verdicted once) while chunk 2's copies are still suppressed by
      // the STORE incarnation 1 grew. Stream state holds nothing
      // corpus-shaped, so restart safety is the architecture: offsets
      // in the checkpoint, dedup state on disk, and even an
      // at-least-once foreachBatch replay would only duplicate store
      // rows the anti-join absorbs.
      graft.streaming.DocStreamIngest.ingestVerdictsRestartBounded(s, dir)),
    "q210_pack_manifest" -> ((s, dir) => {
      // the INCREMENTAL pack: a manifest written over doc_id < 300,
      // then the rest of the corpus APPENDED (ids sort after — the
      // crawl-increment contract, checked fail-fast) — placements
      // continue the stream with the stored total as base offset, the
      // stored table is never rewritten, and increment-equals-batch is
      // EXACT: the loaded manifest's per-sequence report must equal
      // q207's batch cumsum oracle verbatim (capacity 512, same SQL).
      val mDir = stagedPackManifest(s, dir)
      graft.operators.SequencePack.summary(
        graft.operators.SequencePack.Manifest.loadAssign(s, mDir),
        graft.operators.SequencePack.Manifest.capacityOf(s, mDir))
    }),
    "q209_stream_store_ingest" -> ((s, dir) =>
      // STREAMING ingestion against the persisted dedup store — the
      // crawler tense of q186/q189: three time-ordered micro-batches
      // (corpus terciles + Planted.streamIngestRows), each running the
      // exact q186 ingest against the store AS OF that batch via
      // foreachBatch, then appending its accepted rows — batch 0's seed
      // suppresses batch 1's exact copy and doubled-space near-variant
      // THROUGH THE STORE (no in-memory stream state holds corpus
      // signatures: dedup state never expires, so the persisted store
      // IS the streaming state), and batch 1's accepted rows suppress
      // batch 2's copies. One row of construction-pinned verdict bits
      // (q189's shape) plus a three-batches sanity bit.
      graft.streaming.DocStreamIngest.ingestVerdictsBounded(s, dir)),
    "q208_bpe_pack" -> ((s, dir) => {
      // the tokenize→pack COMPOSITION (what a training job actually
      // consumes): the planted corpus's BPE id streams (q204's
      // persisted store, full table) packed into 128-id sequences.
      // Closed form end-to-end: under the full table every word
      // collapses to one id, so doc (w,i) contributes exactly 100−2w
      // ids, and the pack is the schedule arithmetic's cumsum in
      // doc_id order — the oracle regenerates both stages without
      // touching either engine path.
      val store = graft.operators.BpeStore.load(s, stagedBpeStore(s))
      val encoded = graft.operators.BpeTrainer.encodeToIds(
        Planted.bpe1kDocs(s), store.merges, store.vocab)
      graft.operators.SequencePack.summary(
        graft.operators.SequencePack.assign(encoded, 128L,
          tokensCol = col("n_ids")), 128L)
    }),
    "q206_image_dedup_store" -> ((s, dir) => {
      // persisted MULTIMODAL dedup: the DedupStore discipline composed
      // with the image signatures (payload-MD5 exact + decoded-raster
      // aHash near, one decode pass for both) — same on-disk layout, so
      // load/purge/compact and the ingestSigned verdict core are shared
      // with the text store verbatim. The planted corpus pins every
      // verdict by aHash construction (orientation + brightness order
      // determine the hash; vertical and horizontal families share no
      // 16-bit blocking chunk — see Planted.imageStoreRows). Property
      // gate, q189's aggregated-bits shape.
      import graft.dedup.ImageDedupStore
      val B = Planted.imgBase
      val store = ImageDedupStore.load(s, stagedImageDedupStore(s))
      ImageDedupStore.ingest(store, Planted.imageBatchMedia(s))
        .select(col("media_id"), col("verdict"))
        .agg(
          min(when(col("media_id") === B + 100, col("verdict") === "dup_vs_store"))
            .as("exact_copy_suppressed"),
          min(when(col("media_id") === B + 101, col("verdict") === "new"))
            .as("batch_canonical_new"),
          min(when(col("media_id") === B + 102, col("verdict") === "dup_in_batch"))
            .as("batch_dup_labeled"),
          min(when(col("media_id") === B + 103, col("verdict") === "near_dup_vs_store"))
            .as("near_variant_suppressed"),
          min(when(col("media_id") === B + 104, col("verdict") === "new"))
            .as("fresh_new"))
    })
  )

  /** q194/q196's fixture: the trained quality-classifier weight table,
    * staged ONCE per JVM/tmp lifetime (training input is the planted
    * labeled set only — no sf-dir dependence, so no FixtureKey). The
    * `_SUCCESS` marker is parquet's own, written last by the committer.
    */
  private def stagedQualityWeights(s: SparkSession): String = {
    val out = java.nio.file.Paths.get(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft_qtrain_weights")
    if (!java.nio.file.Files.exists(out.resolve("_SUCCESS"))) {
      val labeled = Planted.qualityTrainDocs(s)
        .withColumn("label", when(col("lang") === "qpos", 1L).otherwise(-1L))
      graft.operators.QualityTrainer.train(labeled)
        .write.mode("overwrite").parquet(out.toString)
    }
    out.toString
  }

  /** q201/q202/q203's fixture: the AVERAGED weight table trained on the
    * noisy (duplicate-flipped) planted set at the pinned 8-round
    * horizon — staged once per JVM/tmp lifetime like
    * [[stagedQualityWeights]] (no sf-dir dependence).
    */
  private def stagedAveragedWeights(s: SparkSession): String = {
    val out = java.nio.file.Paths.get(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft_qavg_weights")
    if (!java.nio.file.Files.exists(out.resolve("_SUCCESS"))) {
      val labeled = Planted.qualityNoisyTrainDocs(s)
        .withColumn("label", when(col("lang") === "qpos", 1L).otherwise(-1L))
      graft.operators.QualityTrainer.trainAveraged(labeled, rounds = 8)
        .write.mode("overwrite").parquet(out.toString)
    }
    out.toString
  }

  /** q204's fixture: the persisted tokenizer — the 1023-merge distilled
    * table + derived vocab written through BpeStore's staging swap.
    * Planted-corpus-only (the q192 schedule), so sf-independent like
    * [[stagedQualityWeights]]; guard on vocab/_SUCCESS (written last).
    */
  private def stagedBpeStore(s: SparkSession): String = {
    val out = java.nio.file.Paths.get(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft_bpe_store")
    if (!java.nio.file.Files.exists(out.resolve("vocab").resolve("_SUCCESS"))) {
      val docs = Planted.bpe1kDocs(s)
      graft.operators.BpeStore.write(
        graft.operators.BpeTrainer.learnMergesDistilled(docs, nMerges = 1023),
        graft.operators.BpeTrainer.baseSymbols(docs),
        out.toString)
    }
    out.toString
  }

  /** q77's planted-pair fixture, shared with SimHashBlockingSpec so the
    * spec's non-vacuity checks guard the exact corpus the query gates:
    * (base = first 20 docs, perturbed = same docs at +1000000 with one
    * short deterministic token appended — moves signatures 0–6 bits).
    */
  private[graft] def simhashGateCorpus(documents: DataFrame): (DataFrame, DataFrame) = {
    val base = Parallelize.ensure(documents)
      .select(col("doc_id"), col("text"))
      .filter(col("doc_id") < 20)
    val perturbed = base.select((col("doc_id") + 1000000).as("doc_id"),
      concat(col("text"), lit(" zq"), (col("doc_id") % 7).cast("string")).as("text"))
    (base, perturbed)
  }

  /** Stage the EXACT-DEDUPED corpus through the lang-partitioned parquet
    * sink (q61's layout) — the between-stages storage hop of the q76 staged
    * dedup pipeline. Deterministic content (min-id canonical per md5), so
    * staged once per dir with the usual `_SUCCESS` guard.
    */
  /** q183's fixture: the persistable ANN index (PQ codes + codebook + IVF
    * coarse lists) built and written ONCE per sf dir — every later
    * invocation loads the parquet artifacts without touching the training
    * path, which is exactly the build-once/query-forever contract the
    * query gates.
    */
  /** Stage the persisted dedup state once per sf dir (the stagedAnnIndex
    * pattern): hashes + simhashes distilled from the ingested half of the
    * corpus (doc_id < 250) plus the planted stored docs. Later
    * invocations hit the `_SUCCESS` guard and only load.
    */
  private def stagedDedupStore(s: SparkSession, dir: String): String = {
    val key = FixtureKey(dir)
    val out = java.nio.file.Paths.get(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"), s"graft_dedup_store_$key")
    // Guard on the LAST-written table (write order: hashes, then
    // simhashes): a crash between the two leaves hashes/_SUCCESS present,
    // and guarding on it would freeze a half-staged store forever. The
    // simhashes guard makes any partial write retry the whole overwrite.
    if (!java.nio.file.Files.exists(out.resolve("simhashes").resolve("_SUCCESS"))) {
      graft.dedup.DedupStore.write(
        Parallelize.ensure(Tables.documents(s, dir))
          .filter(col("doc_id") < 250)
          .unionByName(Planted.dedupStoredDocs(s)),
        out.toString)
    }
    out.toString
  }

  /** q189's fixture: the [[stagedDedupStore]] construction with stored
    * planted docs dsBase+0 and dsBase+1 PURGED (tombstoned) after the
    * distill. Separate staging path — q186/q187 gate the unpurged store
    * and must not see these tombstones. Guard on tombstones/_SUCCESS,
    * the LAST artifact the staging writes.
    */
  private def stagedPurgedDedupStore(s: SparkSession, dir: String): String = {
    val key = FixtureKey(dir)
    val out = java.nio.file.Paths.get(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"), s"graft_dedup_purge_$key")
    if (!java.nio.file.Files.exists(out.resolve("tombstones").resolve("_SUCCESS"))) {
      graft.dedup.DedupStore.write(
        Parallelize.ensure(Tables.documents(s, dir))
          .filter(col("doc_id") < 250)
          .unionByName(Planted.dedupStoredDocs(s)),
        out.toString)
      import s.implicits._
      graft.dedup.DedupStore.purge(
        Seq(Planted.dsBase, Planted.dsBase + 1).toDF("doc_id"), out.toString)
    }
    out.toString
  }

  /** q191's fixture: an ANN index TRAINED on 80% of the corpus (vec_id %
    * 5 != 4 — modulo-spread, not a contiguous block, so the held-out 20%
    * covers the whole embedding space) with the remaining 20% APPENDED
    * through the frozen codebooks (AnnIndex.append — no retraining).
    * The sentinel file is created LAST (the staging-guard discipline):
    * any partial staging re-runs from the overwrite.
    */
  private def stagedAnnAppendIndex(s: SparkSession, dir: String): String = {
    val key = FixtureKey(dir)
    val out = java.nio.file.Paths.get(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"), s"graft_ann_append_$key")
    val done = out.resolve("__append_done")
    if (!java.nio.file.Files.exists(done)) {
      val emb = Tables.embeddings(s, dir)
      graft.similarity.AnnIndex.write(emb.filter(col("vec_id") % 5 =!= 4),
        out.toString, m = 8, k = 64, nLists = 16, maxIter = 3)
      val idx = graft.similarity.AnnIndex.load(s, out.toString)
      graft.similarity.AnnIndex.append(idx, emb.filter(col("vec_id") % 5 === 4),
        out.toString)
      java.nio.file.Files.createFile(done)
    }
    out.toString
  }

  /** q193's fixture: an ANN index built on the FULL corpus, then the
    * exact top-2 organic neighbors (vec_id >= 5 — queries stay in the
    * corpus) of each of the five gate queries PURGED via the tombstone
    * path. The purge set is recorded BY the tombstone table itself — the
    * gate reads it back for its assertions, so fixture and gate can
    * never disagree about what was purged. Sentinel created LAST.
    */
  private def stagedAnnPurgeIndex(s: SparkSession, dir: String): String = {
    val key = FixtureKey(dir)
    val out = java.nio.file.Paths.get(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"), s"graft_ann_purge_$key")
    val done = out.resolve("__purge_done")
    if (!java.nio.file.Files.exists(done)) {
      val emb = Tables.embeddings(s, dir)
      graft.similarity.AnnIndex.write(emb, out.toString,
        m = 8, k = 64, nLists = 16, maxIter = 3)
      val victims = Knn.bruteForce(emb, emb.filter(col("vec_id") < 5), k = 10)
        .filter(col("neighbor_id") >= 5)
        .withColumn("r", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
            .orderBy(col("rank"))))
        .filter(col("r") <= 2)
        .select(col("neighbor_id").as("vec_id"))
      graft.similarity.AnnIndex.purge(victims, out.toString)
      java.nio.file.Files.createFile(done)
    }
    out.toString
  }

  /** q200's fixture: an ANN index trained on the q191 80% split
    * (vec_id % 5 != 4) with round-15 write() — which persists the
    * training-time reference stats the drift monitor compares against.
    * Guard on stats/_SUCCESS: stats are written LAST, so their marker
    * implies a complete index.
    */
  private def stagedAnnDriftIndex(s: SparkSession, dir: String): String = {
    val key = FixtureKey(dir)
    val out = java.nio.file.Paths.get(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"), s"graft_ann_drift_$key")
    if (!java.nio.file.Files.exists(out.resolve("stats").resolve("_SUCCESS"))) {
      graft.similarity.AnnIndex.write(
        Tables.embeddings(s, dir).filter(col("vec_id") % 5 =!= 4),
        out.toString, m = 8, k = 64, nLists = 16, maxIter = 3)
    }
    out.toString
  }

  /** q205's fixture: baseline-JPEG payloads for the image cohort
    * (doc_id % 3 = 0, the stagedPngMedia discipline — 4 one-row-group
    * files so the decode parallelizes regardless of core count).
    */
  private def stagedJpegMedia(s: SparkSession, dir: String): String = {
    val key = FixtureKey(dir)
    val out = java.nio.file.Paths.get(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"), s"graft_jpeg_media_$key")
    if (!java.nio.file.Files.exists(out.resolve("_SUCCESS"))) {
      import s.implicits._
      import graft.multimodal.Multimodal.JpegCodec
      Tables.documents(s, dir).select(col("doc_id"), col("n_chars"))
        .as[(Long, Long)]
        .mapPartitions(_.flatMap { case (id, nc) =>
          if (id % 3 == 0)
            Iterator((id, "image", JpegCodec.encodeJpeg(id, nc)))
          else Iterator.empty
        })
        .toDF("media_id", "media_type", "payload")
        .write.mode("overwrite").parquet(out.toString)
    }
    out.toString
  }

  /** q206's fixture: the persisted image-dedup store distilled from the
    * planted store images (sf-independent; simhashes/ written last, so
    * its _SUCCESS guards a complete store).
    */
  private def stagedImageDedupStore(s: SparkSession): String = {
    val out = java.nio.file.Paths.get(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft_img_dedup_store")
    if (!java.nio.file.Files.exists(out.resolve("simhashes").resolve("_SUCCESS"))) {
      graft.dedup.ImageDedupStore.write(Planted.imageStoreMedia(s), out.toString)
    }
    out.toString
  }

  /** q210's fixture: the persisted pack manifest written over the
    * doc_id < 300 prefix and grown by appending the rest — staged once
    * per sf dir, done-sentinel created LAST (the stagedAnnAppendIndex
    * discipline: any partial staging re-runs from the overwrite).
    */
  private def stagedPackManifest(s: SparkSession, dir: String): String = {
    val key = FixtureKey(dir)
    val out = java.nio.file.Paths.get(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"), s"graft_pack_manifest_$key")
    val done = out.resolve("__append_done")
    if (!java.nio.file.Files.exists(done)) {
      val docs = Tables.documents(s, dir)
      graft.operators.SequencePack.Manifest.write(
        docs.filter(col("doc_id") < 300), 512L, out.toString)
      graft.operators.SequencePack.Manifest.append(
        docs.filter(col("doc_id") >= 300), out.toString)
      java.nio.file.Files.createFile(done)
    }
    out.toString
  }

  private def stagedAnnIndex(s: SparkSession, dir: String): String = {
    val key = FixtureKey(dir)
    val out = java.nio.file.Paths.get(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"), s"graft_ann_index_$key")
    // Same last-written-artifact guard as stagedDedupStore (write order:
    // codes, codebook, coarse — guard on coarse).
    if (!java.nio.file.Files.exists(out.resolve("coarse").resolve("_SUCCESS"))) {
      graft.similarity.AnnIndex.write(Tables.embeddings(s, dir), out.toString,
        m = 8, k = 64, nLists = 16, maxIter = 3)
    }
    out.toString
  }

  private def stagedExactDedupedDocs(s: SparkSession, dir: String): String = {
    val key = FixtureKey(dir)
    val out = java.nio.file.Paths.get(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"), s"graft_dedup_docs_$key")
    if (!java.nio.file.Files.exists(out.resolve("_SUCCESS"))) {
      ExactDedup.deduplicate(Tables.documents(s, dir))
        .write.mode("overwrite").partitionBy("lang").parquet(out.toString)
    }
    out.toString
  }

  /** q144's fixture: the exact-deduped corpus+planted staged through the
    * lang-partitioned sink — stagedExactDedupedDocs with the Planted
    * corpus unioned in before the dedup. Staged once per dir.
    */
  private def stagedPlantedDedupedDocs(s: SparkSession, dir: String): String = {
    val key = FixtureKey(dir)
    val out = java.nio.file.Paths.get(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"), s"graft_planted_dedup_$key")
    if (!java.nio.file.Files.exists(out.resolve("_SUCCESS"))) {
      ExactDedup.deduplicate(
          Tables.documents(s, dir).unionByName(Planted.docs(s)))
        .write.mode("overwrite").partitionBy("lang").parquet(out.toString)
    }
    out.toString
  }

  /** Stage documents as a lang-partitioned parquet layout (`lang=en/...`
    * directories) — the partitioned-sink half of q61; staged once per dir.
    */
  private def stagedLangPartitionedDocs(s: SparkSession, dir: String): String = {
    val key = FixtureKey(dir)
    val out = java.nio.file.Paths.get(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"), s"graft_part_docs_$key")
    if (!java.nio.file.Files.exists(out.resolve("_SUCCESS"))) {
      Tables.documents(s, dir)
        .select(col("doc_id"), col("n_chars"), col("text"), col("lang"))
        .write.mode("overwrite").partitionBy("lang").parquet(out.toString)
    }
    out.toString
  }

  /** Stage the events table twice for q135: once Z-ORDER clustered on
    * (user_id, minute-since-corpus-start) — both dims fit the operator's
    * 16-bit lanes up to sf1 (user_id <= 15k, a 30-day span is 43k minutes;
    * wider domains are the caller's quantization job) — and once
    * hash-scattered on event_id as the control layout. Same 16-file count
    * on both sides so the locality comparison isolates ORDER, not file
    * granularity. Staged once per (dir, /tmp) like the other fixtures.
    */
  private def stagedZOrderEvents(s: SparkSession, dir: String): (String, String, Int) = {
    val nFiles = 16
    val key = FixtureKey(dir)
    val tmp = sys.props.getOrElse("java.io.tmpdir", "/tmp")
    val zOut = java.nio.file.Paths.get(tmp, s"graft_zorder_events_$key")
    val pOut = java.nio.file.Paths.get(tmp, s"graft_hashlay_events_$key")
    if (!java.nio.file.Files.exists(zOut.resolve("_SUCCESS"))
        || !java.nio.file.Files.exists(pOut.resolve("_SUCCESS"))) {
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("ts"), col("user_id"), col("value"))
      val t0 = ev.agg(min(col("ts")).as("t0"))
      val withMinute = ev.crossJoin(broadcast(t0))
        .withColumn("minute",
          floor((col("ts").cast("long") - col("t0").cast("long")) / 60))
        .drop("t0")
      graft.operators.ZOrder
        .cluster(withMinute, col("user_id"), col("minute"), nFiles)
        .drop("minute", "zval")
        .write.mode("overwrite").parquet(zOut.toString)
      ev.repartition(nFiles, col("event_id"))
        .write.mode("overwrite").parquet(pOut.toString)
    }
    (zOut.toString, pOut.toString, nFiles)
  }

  /** Stage the documents table as JSONL (the training-corpus wire format) at
    * a deterministic temp path — staged once per (dir, tmp lifetime), like
    * the CSV and stream fixtures.
    */
  /** Two parquet "generations" of the documents table with EVOLVED schemas:
    * gen1 (doc_id < 250) lacks `source` and `n_tokens`; gen2 carries both
    * (n_tokens derived at write time). Written once per (dir, /tmp), like
    * the other staged fixtures.
    */
  private def stagedEvolvedDocs(s: SparkSession, dir: String): (String, String) = {
    val key = FixtureKey(dir)
    val root = java.nio.file.Paths.get(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"), s"graft_evo_docs_$key")
    val (p1, p2) = (root.resolve("gen1"), root.resolve("gen2"))
    if (!java.nio.file.Files.exists(root.resolve("_STAGED"))) {
      val d = Tables.documents(s, dir)
      // The generation split is pinned at doc_id 250 because the ORACLE
      // pins the same literal; a corpus whose ids all fall on one side
      // would stage an EMPTY generation, and the mergeSchema read would
      // then lack the evolved columns entirely — failing q104 with an
      // unresolved-column error instead of a clean result. Fail fast at
      // staging time with a message that names the real problem.
      val sides = d.select(
        sum(when(col("doc_id") < 250, 1L).otherwise(0L)),
        sum(when(col("doc_id") >= 250, 1L).otherwise(0L))).collect()(0)
      require(sides.getLong(0) > 0 && sides.getLong(1) > 0,
        s"q104 fixture: generation split doc_id<250 needs docs on BOTH " +
          s"sides, got legacy=${sides.getLong(0)} current=${sides.getLong(1)} " +
          s"for $dir — adjust the split literal here AND in oracleSql(q104)")
      d.filter(col("doc_id") < 250)
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .write.mode("overwrite").parquet(p1.toString)
      d.filter(col("doc_id") >= 250)
        .select(col("doc_id"), col("lang"), col("n_chars"), col("source"),
          functions.TextFunctions.tokenCount(col("text")).cast("bigint").as("n_tokens"))
        .write.mode("overwrite").parquet(p2.toString)
      java.nio.file.Files.createFile(root.resolve("_STAGED"))
    }
    (p1.toString, p2.toString)
  }

  private def stagedOrcDocs(s: SparkSession, dir: String): String = {
    val key = FixtureKey(dir)
    val out = java.nio.file.Paths.get(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"), s"graft_orc_docs_$key")
    if (!java.nio.file.Files.exists(out.resolve("_SUCCESS"))) {
      Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), col("n_chars"), col("text"))
        .write.mode("overwrite").orc(out.toString)
    }
    out.toString
  }

  /** Stage real PNG payloads for the multimodal queries: one still image
    * per doc_id % 3 == 0 (two-tone), one filmstrip per doc_id % 3 == 2
    * (audio ids stay on the stub path — the JDK has no audio codec).
    * Encoding runs executor-side in the staging write; the fixture is the
    * opaque-binary media table a real pipeline would scan. `_SUCCESS`
    * guard, staged once per (dir, /tmp) like the other fixtures.
    */
  private def stagedPngMedia(s: SparkSession, dir: String): String = {
    val key = FixtureKey(dir)
    val out = java.nio.file.Paths.get(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"), s"graft_png_media_$key")
    if (!java.nio.file.Files.exists(out.resolve("_SUCCESS"))) {
      import s.implicits._
      import graft.multimodal.Multimodal.PngCodec
      Tables.documents(s, dir).select(col("doc_id"), col("n_chars"))
        .as[(Long, Long)]
        .mapPartitions(_.flatMap { case (id, nc) =>
          (id % 3) match {
            case 0 => Iterator((id, "image", PngCodec.encodeImage(id, nc)))
            case 2 => Iterator((id, "video", PngCodec.encodeFilmstrip(id, nc)))
            case _ => Iterator.empty
          }
        })
        .toDF("media_id", "media_type", "payload")
        .write.mode("overwrite").parquet(out.toString)
    }
    out.toString
  }

  /** Stage real WAV PCM payloads for the audio query: one stereo clip per
    * doc_id % 3 == 1 (the modality slot the PNG fixture leaves free),
    * samples a closed-form modular ramp of (doc_id, n_chars). Encoding
    * runs executor-side in the staging write; `_SUCCESS` guard, staged
    * once per (dir, /tmp) like the other fixtures.
    */
  private def stagedWavMedia(s: SparkSession, dir: String): String = {
    val key = FixtureKey(dir)
    val out = java.nio.file.Paths.get(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"), s"graft_wav_media_$key")
    if (!java.nio.file.Files.exists(out.resolve("_SUCCESS"))) {
      import s.implicits._
      import graft.multimodal.Multimodal.WavCodec
      Tables.documents(s, dir).select(col("doc_id"), col("n_chars"))
        .filter(pmod(col("doc_id"), lit(3)) === 1)
        .as[(Long, Long)]
        .mapPartitions(_.map { case (id, nc) =>
          (id, "audio", WavCodec.encodeWav(id, nc))
        })
        .toDF("media_id", "media_type", "payload")
        .write.mode("overwrite").parquet(out.toString)
    }
    out.toString
  }

  private def stagedJsonlDocs(s: SparkSession, dir: String): String = {
    val key = FixtureKey(dir)
    val out = java.nio.file.Paths.get(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"), s"graft_jsonl_docs_$key")
    if (!java.nio.file.Files.exists(out.resolve("_SUCCESS"))) {
      Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), col("n_chars"), col("text"))
        .write.mode("overwrite").json(out.toString)
    }
    out.toString
  }

  /** Stage an Instacart-shaped CSV fixture derived deterministically from the
    * sf dir's events parquet (header row, every value stringified — the
    * reference's S1 source shape). Every 97th event's hour is corrupted to
    * "NA" so the permissive string→int cast contract (dirty → NULL, ANSI off)
    * is exercised END-TO-END from a real CSV scan. Deterministic path +
    * _SUCCESS guard: staged once, reused across calls and JVMs.
    */
  private def stagedInstacartCsv(s: SparkSession, dir: String): String = {
    val key = FixtureKey(dir)
    val out = java.nio.file.Paths.get(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"), s"graft_csv_orders_$key")
    if (!java.nio.file.Files.exists(out.resolve("_SUCCESS"))) {
      val dept = (pmod(col("user_id"), lit(21)) + lit(1)).cast("int")
      Tables.events(s, dir).select(
        col("event_id").as("order_id"),
        col("user_id"),
        (dayofweek(col("ts")) - lit(1)).cast("int").as("order_dow"),
        when(col("event_id") % 97 === 0, lit("NA"))
          .otherwise(hour(col("ts")).cast("string")).as("order_hour_of_day"),
        dept.as("department_id"),
        concat(lit("dept_"), dept).as("department"),
        col("event_type").as("product_name"))
        .write.mode("overwrite").option("header", "true").csv(out.toString)
    }
    out.toString
  }

  /** Shared by q44 (plain stream) and q62 (duplicated stream + exactly-once
    * dedup): both must land on the batch windows over single-copy events.
    */
  private val streamWindowsSql: String =
    """SELECT CAST(date_trunc('minute', ts) AS TIMESTAMP) AS window_start,
              CAST(date_trunc('minute', ts) + INTERVAL 1 MINUTE AS TIMESTAMP) AS window_end,
              event_type, COUNT(*) AS n_events,
              CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
       FROM events GROUP BY 1, 2, 3 ORDER BY window_start, event_type"""

  /** Shared by q68 (recompute-per-branch) and q76 (staged-to-storage): the
    * composed dedup chain — exact dedup (min-id per md5) → brute-force
    * jaccard pairs over survivors → recursive connected components → drop
    * non-canonical → per-lang stats (q58's token-count form). Both engine
    * forms must land on these exact values.
    */
  private val corpusDedupChainSql: String =
    """WITH RECURSIVE
            kept AS (SELECT * FROM documents
                     WHERE doc_id IN (SELECT MIN(doc_id) FROM documents
                                      GROUP BY md5(text))),
            toks AS (SELECT doc_id, string_split_regex(trim(text), ' +') AS tk
                     FROM kept),
            sh AS (SELECT doc_id,
                     CASE WHEN len(tk) >= 3
                          THEN list_distinct([array_to_string(tk[i:i+2], ' ')
                                              for i in range(1, len(tk) - 1)])
                          ELSE [array_to_string(tk, ' ')] END AS shingles
                   FROM toks),
            pairs AS (SELECT a.doc_id AS id1, b.doc_id AS id2
                      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
                      WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
                          / CAST(len(list_distinct(list_concat(a.shingles, b.shingles)))
                                 AS DOUBLE) >= 0.3),
            edges AS (SELECT id1 AS s, id2 AS d FROM pairs
                      UNION SELECT id2, id1 FROM pairs),
            walk(id, reach) AS (
              SELECT s, d FROM edges
              UNION
              SELECT w.id, e.d FROM walk w JOIN edges e ON w.reach = e.s),
            losers AS (SELECT id FROM walk GROUP BY id
                       HAVING LEAST(id, MIN(reach)) <> id),
            cleaned AS (SELECT * FROM kept
                        WHERE doc_id NOT IN (SELECT id FROM losers))
       SELECT lang, COUNT(*) AS n_docs,
              CAST(SUM(CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                            ELSE len(string_split_regex(trim(text), ' +')) END
                       AS BIGINT)) AS BIGINT) AS total_tokens
       FROM cleaned GROUP BY 1 ORDER BY lang"""

  /** Batch mirror of the streaming milestone emitter (q72 and its restart
    * form q81): a user crosses floor(total/100) hundred-dollar marks; each
    * is emitted exactly once, within a run and across restarts.
    */
  private val milestoneCountsSql: String =
    """SELECT user_id,
              CAST(FLOOR(SUM(CAST(value AS DECIMAL(18,2))) / 100) AS BIGINT)
                AS n_milestones
       FROM events GROUP BY 1
       HAVING FLOOR(SUM(CAST(value AS DECIMAL(18,2))) / 100) >= 1
       ORDER BY user_id"""

  private val decPrice = "CAST(l_extendedprice AS DECIMAL(18,2))"
  private val decDisc = "CAST(l_discount AS DECIMAL(18,2))"
  // integer-cents fast path (see Relational.cents): exact long sums
  private val centsPrice = "CAST(round(l_extendedprice * 100) AS BIGINT)"
  private val centsDisc = "CAST(round(l_discount * 100) AS BIGINT)"

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q11_pushdown_filter" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
         WHERE l_extendedprice > 90000 AND l_returnflag = 'R'
         ORDER BY l_orderkey, l_linenumber""",
    "q09_cast_profile" ->
      """SELECT o_orderpriority,
                CAST(substr(o_orderpriority, 1, 1) AS INTEGER) AS prio_int,
                COUNT(*) AS n,
                COUNT(TRY_CAST(o_orderpriority AS INTEGER)) AS n_clean_casts
         FROM orders GROUP BY 1, 2 ORDER BY o_orderpriority""",
    "q14_dow_recode" ->
      """WITH e AS (SELECT CAST(dayofweek(ts) AS INTEGER) AS dow FROM events)
         SELECT dow,
                CASE WHEN dow IN (0,1) THEN 0 WHEN dow IN (2,3,4) THEN 1 ELSE 2 END AS dow_bucket,
                CASE WHEN dow IN (0) THEN 'Monday' WHEN dow IN (1) THEN 'Tuesday'
                     WHEN dow IN (2) THEN 'Wednesday' WHEN dow IN (3) THEN 'Thursday'
                     WHEN dow IN (4) THEN 'Friday' WHEN dow IN (5) THEN 'Saturday'
                     WHEN dow IN (6) THEN 'Sunday' ELSE 'None' END AS day_name,
                COUNT(*) AS n
         FROM e GROUP BY 1, 2, 3 ORDER BY dow""",
    "q02_top_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
    "q01_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
                 SUM(l_quantity) AS sum_qty,
                 SUM($centsPrice) / 100.0 AS sum_base_price,
                 SUM($centsPrice * (100 - $centsDisc)) / 10000.0 AS sum_disc_price,
                 SUM($centsPrice) / 100.0 / COUNT(*) AS avg_price,
                 SUM(l_quantity) / COUNT(*) AS avg_qty,
                 COUNT(*) AS count_order
          FROM lineitem GROUP BY 1, 2 ORDER BY l_returnflag, l_linestatus""",
    "q10_hist2d" ->
      """SELECT CAST(FLOOR(l_quantity / 10) AS BIGINT) AS qty_bin,
                CAST(FLOOR(l_extendedprice / 10000) AS BIGINT) AS price_bin,
                COUNT(*) AS cnt
         FROM lineitem GROUP BY 1, 2 ORDER BY qty_bin, price_bin""",
    "q12_distinct_counts" ->
      """SELECT l_returnflag,
                COUNT(DISTINCT l_suppkey) AS n_supp,
                COUNT(DISTINCT l_partkey) AS n_part,
                COUNT(*) AS n_rows
         FROM lineitem GROUP BY 1 ORDER BY l_returnflag""",
    "q13_events_hourly" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start, event_type,
                COUNT(*) AS n_events,
                CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
                MIN(value) AS min_value, MAX(value) AS max_value
         FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type""",
    "q03_revenue_by_nation" ->
      s"""SELECT n_name,
                 SUM($centsPrice * (100 - $centsDisc)) / 10000.0 AS revenue,
                 COUNT(*) AS n_items
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          GROUP BY n_name ORDER BY n_name""",
    "q04_semi_join" ->
      """SELECT c_mktsegment, COUNT(*) AS n_customers FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
         GROUP BY 1 ORDER BY c_mktsegment""",
    "q05_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
         ORDER BY c_custkey""",
    "q08_union_agg" ->
      """WITH u AS (
           SELECT c_custkey AS key, c_acctbal AS acctbal FROM customer
           UNION ALL
           SELECT CAST(s_suppkey AS BIGINT), s_acctbal FROM supplier)
         SELECT key,
                CAST(SUM(CAST(acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal,
                COUNT(*) AS n_accounts
         FROM u GROUP BY key HAVING COUNT(*) > 1 ORDER BY key""",
    "q06_window_topn" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rk AS INTEGER) AS rk
         FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                      ROW_NUMBER() OVER (PARTITION BY o_custkey
                        ORDER BY o_totalprice DESC, o_orderkey) AS rk
               FROM orders) t
         WHERE rk <= 2 ORDER BY o_custkey, rk""",
    "q07_distinct" ->
      """SELECT DISTINCT p_brand, p_type FROM part ORDER BY p_brand, p_type""",
    "q19_kmeans_assign" -> kmAssignSql,
    "q20_wcss" -> kmWcssSql,
    "q15_doc_stats" ->
      """SELECT doc_id, n_chars,
                CAST(length(text) AS INTEGER) AS len_chars,
                CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                     ELSE len(string_split_regex(trim(text), ' +')) END AS INTEGER) AS n_tokens,
                CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                     ELSE len(list_distinct(string_split_regex(trim(text), ' +'))) END AS INTEGER)
                  AS n_unique_tokens
         FROM documents ORDER BY doc_id""",
    "q16_exact_dedup" ->
      """SELECT COUNT(*) AS n_docs,
                COUNT(DISTINCT md5(text)) AS n_distinct,
                COUNT(*) - COUNT(DISTINCT md5(text)) AS n_dup_copies
         FROM documents""",
    "q21_dedup_groups" ->
      """SELECT md5(text) AS content_hash, MIN(doc_id) AS canonical_id,
                COUNT(*) AS n_copies
         FROM documents GROUP BY 1 HAVING COUNT(*) > 1 ORDER BY canonical_id""",
    "q17_lang_id" -> langIdSql,
    "q24_knn_bruteforce" -> knnOracleSql,
    "q30_knn_topk_agg" -> knnOracleSql,
    "q27_knn_ivf" ->
      // the oracle predicts the recall FLOOR, not the IVF internals: every
      // query's approximate top-3 must recover >= 2/3 of the exact top-3
      """SELECT vec_id AS query_id, TRUE AS meets_floor
         FROM embeddings WHERE vec_id < 5 ORDER BY vec_id""",
    "q67_hll_merge" ->
      // property oracle: sketch rollup == direct sketch, and both within
      // the 5% tolerance of exact (the values themselves are engine-internal)
      "SELECT TRUE AS merge_consistent, TRUE AS within_tolerance",
    "q74_approx_percentile" ->
      // property oracle: the sketch's p50/p90 sit inside the exact
      // p45-p55 / p85-p95 bands
      "SELECT TRUE AS p50_in_band, TRUE AS p90_in_band",
    "q66_fingerprint_gate" ->
      // the fingerprint itself is engine-internal; the oracle predicts its
      // distinct count from the normalization it promises (lower + collapsed
      // whitespace), for both the raw and the upper-cased input
      """SELECT COUNT(*) AS n_docs,
                COUNT(DISTINCT regexp_replace(lower(trim(text)), '[ \t\n\f\r]+', ' ', 'g'))
                  AS n_distinct_fp,
                COUNT(DISTINCT regexp_replace(lower(trim(text)), '[ \t\n\f\r]+', ' ', 'g'))
                  AS n_distinct_fp_case
         FROM documents""",
    "q23_simhash_neardups" ->
      // property oracle: precision (every pair re-verifies at <= 10 against
      // recomputed signatures), recall floor (all 20 planted exact copies
      // return), non-vacuity (pairs exist) — the listing itself is
      // engine-internal
      "SELECT TRUE AS some_pairs_found, TRUE AS all_pairs_verify, TRUE AS planted_all_recovered",
    "q25_fingerprints" ->
      // the oracle derives each doc's equality class from DuckDB's OWN
      // normalization of the same planted corpus; the engine derives it from
      // the fingerprint — the min-id canonicals must coincide row for row
      """WITH a AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 1000000,
                  ' ' || regexp_replace(text, ' ', '  ', 'g') || '  '
           FROM documents WHERE doc_id < 20
         ), n AS (
           SELECT doc_id, regexp_replace(lower(trim(text)), '[ \t\n\f\r]+', ' ', 'g') AS t
           FROM a)
         SELECT doc_id, MIN(doc_id) OVER (PARTITION BY t) AS canonical_id
         FROM n ORDER BY doc_id""",
    "q26_ngram_jaccard" ->
      """WITH n AS (SELECT doc_id, regexp_replace(lower(trim(text)), '[ \t\n\f\r]+', ' ', 'g') t
                    FROM documents),
              g AS (SELECT doc_id,
                           CASE WHEN len(t) >= 3
                                THEN list_distinct([t[i:i+2] for i in range(1, len(t) - 1)])
                                ELSE [t] END AS grams
                    FROM n),
              pairs AS (SELECT doc_id AS id1, doc_id + 1 AS id2 FROM documents WHERE doc_id < 50)
         SELECT p.id1, p.id2,
                CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                  / CAST(len(list_distinct(list_concat(a.grams, b.grams))) AS DOUBLE)
                  AS ngram_jaccard
         FROM pairs p JOIN g a ON a.doc_id = p.id1 JOIN g b ON b.doc_id = p.id2
         ORDER BY p.id1""",
    "q47_corpus_pipeline" ->
      """WITH canon AS (
           SELECT md5(text) AS h, MIN(doc_id) AS keep_id FROM documents GROUP BY 1),
           deduped AS (
             SELECT d.* FROM documents d JOIN canon c ON d.doc_id = c.keep_id),
           gated AS (
             SELECT lang,
                    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                         ELSE len(string_split_regex(trim(text), ' +')) END AS INTEGER) AS n_tokens,
                    n_chars
             FROM deduped)
         SELECT lang, COUNT(*) AS n_docs,
                -- DuckDB SUM(BIGINT) yields HUGEINT; the driver's hash is
                -- type-sensitive, so pin the width back to BIGINT (parity
                -- rule: counts/sizes cast to the same width on both sides).
                CAST(SUM(CAST(n_tokens AS BIGINT)) AS BIGINT) AS total_tokens,
                CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*) AS mean_tokens
         FROM gated WHERE n_tokens >= 10 AND n_chars >= 50
         GROUP BY lang ORDER BY lang""",
    "q52_exact_distinct" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS exact_distinct
         FROM lineitem GROUP BY 1 ORDER BY l_returnflag""",
    "q42_segmentation_pipeline" ->
      // ordersFeatures recodes: DuckDB dayofweek(ts) == Spark dayofweek(ts)-1
      """WITH f AS (SELECT CAST(dayofweek(ts) AS INTEGER) AS order_dow FROM events),
              r AS (SELECT
                      CASE order_dow
                        WHEN 0 THEN 'Monday' WHEN 1 THEN 'Tuesday'
                        WHEN 2 THEN 'Wednesday' WHEN 3 THEN 'Thursday'
                        WHEN 4 THEN 'Friday' WHEN 5 THEN 'Saturday'
                        WHEN 6 THEN 'Sunday' ELSE 'None' END AS days,
                      CAST(CASE WHEN order_dow IN (0, 1) THEN 0
                                WHEN order_dow IN (2, 3, 4) THEN 1
                                ELSE 2 END AS INTEGER) AS order_dow_updated
                    FROM f)
         SELECT days, order_dow_updated, COUNT(*) AS n
         FROM r GROUP BY 1, 2 ORDER BY days""",
    "q22_minhash_neardups" ->
      // all-pairs ground truth: q22's jaccard is EXACT Jaccard over word
      // 3-gram shingle sets (LSH only generates candidates), so DuckDB can
      // verify it by brute force at sf0.01 — same tokenization (split on
      // ' +'), same short-doc fallback (whole text as one shingle)
      """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), ' +') AS tk
                       FROM documents),
              sh AS (SELECT doc_id,
                       CASE WHEN len(tk) >= 3
                            THEN list_distinct([array_to_string(tk[i:i+2], ' ')
                                                for i in range(1, len(tk) - 1)])
                            ELSE [array_to_string(tk, ' ')] END AS shingles
                     FROM toks),
              pairs AS (SELECT a.doc_id AS id1, b.doc_id AS id2,
                          CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
                            / CAST(len(list_distinct(list_concat(a.shingles, b.shingles)))
                                   AS DOUBLE) AS jaccard
                        FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
         SELECT id1, id2, jaccard FROM pairs WHERE jaccard >= 0.3
         ORDER BY id1, id2""",
    "q116_component_histogram" ->
      // q65's closure, then size histogram + the singleton bucket from the
      // corpus total
      """WITH RECURSIVE
              toks AS (SELECT doc_id, string_split_regex(trim(text), ' +') AS tk
                       FROM documents),
              sh AS (SELECT doc_id,
                       CASE WHEN len(tk) >= 3
                            THEN list_distinct([array_to_string(tk[i:i+2], ' ')
                                                for i in range(1, len(tk) - 1)])
                            ELSE [array_to_string(tk, ' ')] END AS shingles
                     FROM toks),
              pairs AS (SELECT a.doc_id AS id1, b.doc_id AS id2
                        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
                        WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
                            / CAST(len(list_distinct(list_concat(a.shingles, b.shingles)))
                                   AS DOUBLE) >= 0.3),
              edges AS (SELECT id1 AS s, id2 AS d FROM pairs
                        UNION SELECT id2, id1 FROM pairs),
              walk(id, reach) AS (
                SELECT s, d FROM edges
                UNION
                SELECT w.id, e.d FROM walk w JOIN edges e ON w.reach = e.s),
              canon AS (SELECT id AS doc_id, LEAST(id, MIN(reach)) AS canonical_id
                        FROM walk GROUP BY id),
              sizes AS (SELECT canonical_id, COUNT(*) AS sz FROM canon GROUP BY 1),
              hist AS (SELECT sz AS size, COUNT(*) AS n_clusters
                       FROM sizes GROUP BY 1
                       UNION ALL
                       SELECT 1, (SELECT COUNT(*) FROM documents)
                                 - (SELECT COUNT(*) FROM canon))
         SELECT CAST(size AS BIGINT) AS size,
                CAST(SUM(n_clusters) AS BIGINT) AS n_clusters
         FROM hist GROUP BY size ORDER BY size""",
    "q65_neardup_components" ->
      // connected components over the same brute-force pair graph as q22's
      // oracle, via recursive transitive closure; canonical = min reachable
      // id (LEAST covers the component-minimum vertex itself)
      """WITH RECURSIVE
              toks AS (SELECT doc_id, string_split_regex(trim(text), ' +') AS tk
                       FROM documents),
              sh AS (SELECT doc_id,
                       CASE WHEN len(tk) >= 3
                            THEN list_distinct([array_to_string(tk[i:i+2], ' ')
                                                for i in range(1, len(tk) - 1)])
                            ELSE [array_to_string(tk, ' ')] END AS shingles
                     FROM toks),
              pairs AS (SELECT a.doc_id AS id1, b.doc_id AS id2
                        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
                        WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
                            / CAST(len(list_distinct(list_concat(a.shingles, b.shingles)))
                                   AS DOUBLE) >= 0.3),
              edges AS (SELECT id1 AS s, id2 AS d FROM pairs
                        UNION SELECT id2, id1 FROM pairs),
              walk(id, reach) AS (
                SELECT s, d FROM edges
                UNION
                SELECT w.id, e.d FROM walk w JOIN edges e ON w.reach = e.s)
         SELECT id AS doc_id, LEAST(id, MIN(reach)) AS canonical_id
         FROM walk GROUP BY id ORDER BY doc_id""",
    "q72_stream_milestones" -> milestoneCountsSql,
    // restart incarnation pair may neither re-emit nor drop crossings —
    // the running-cents GroupState must restore exactly
    "q81_milestones_restart" -> milestoneCountsSql,
    "q71_simhash_recovery" ->
      // the oracle predicts exactly the planted pairs at hamming 0
      """SELECT doc_id AS id1, doc_id + 1000000 AS id2, CAST(0 AS INTEGER) AS hamming
         FROM documents WHERE doc_id < 20 ORDER BY id1""",
    "q70_sequence_packing" ->
      // same prefix-sum shard arithmetic (integer division both sides)
      """WITH d AS (SELECT lang, doc_id,
                      CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                           ELSE len(string_split_regex(trim(text), ' +')) END
                        AS BIGINT) AS n_tokens
                    FROM documents),
              c AS (SELECT lang, doc_id, n_tokens,
                      SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                        ROWS UNBOUNDED PRECEDING) AS cum
                    FROM d)
         SELECT lang, CAST((cum - n_tokens) // 4096 AS BIGINT) AS shard,
                COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens
         FROM c GROUP BY 1, 2 ORDER BY lang, shard""",
    "q69_corpus_mix" ->
      // same exact-integer keep-gate, same dyadic rates
      """WITH kept AS (
           SELECT * FROM documents
           WHERE (doc_id * 2654435761) % 4294967296 <
                 CAST(CASE lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 0.25
                                WHEN 'fr' THEN 0.25 WHEN 'zh' THEN 0.125
                                ELSE 0.0625 END * 4294967296 AS BIGINT))
         SELECT lang, COUNT(*) AS n_docs,
                CAST(SUM(CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                              ELSE len(string_split_regex(trim(text), ' +')) END
                         AS BIGINT)) AS BIGINT) AS total_tokens
         FROM kept GROUP BY 1 ORDER BY lang""",
    "q68_corpus_dedup_pipeline" -> corpusDedupChainSql,
    // q76 stages the exact-deduped corpus to parquet between the stages —
    // the values must be identical to the recompute-per-branch q68 form
    "q76_corpus_dedup_staged" -> corpusDedupChainSql,
    "q77_simhash_blocking_gate" ->
      // property oracle: for every planted perturbed pair, blocked recovery
      // at maxHamming=3 must agree with the pair's direct signature distance
      """SELECT doc_id AS id1, doc_id + 1000000 AS id2, TRUE AS consistent
         FROM documents WHERE doc_id < 20 ORDER BY id1""",
    "q45_hll_distinct" ->
      // property oracle: per-group HLL estimate within 5% of exact (p=12
      // ≈ 1.6% se; 5% is > 3 sigma at every group's cardinality here)
      """SELECT l_returnflag, TRUE AS within_tolerance
         FROM lineitem GROUP BY 1 ORDER BY l_returnflag""",
    "q58_train_val_split" ->
      """WITH d AS (SELECT
                      CASE WHEN doc_id % 10 < 8 THEN 'train'
                           WHEN doc_id % 10 = 8 THEN 'val'
                           ELSE 'test' END AS split,
                      lang,
                      CASE WHEN length(trim(text)) = 0 THEN 0
                           ELSE len(string_split_regex(trim(text), ' +')) END AS n_tokens
                    FROM documents)
         SELECT split, lang, COUNT(*) AS n_docs,
                CAST(SUM(CAST(n_tokens AS BIGINT)) AS BIGINT) AS total_tokens
         FROM d GROUP BY 1, 2 ORDER BY split, lang""",
    "q59_quality_topk" ->
      // op-for-op mirror of TextFunctions.qualityScore (same association
      // order, rounded to 6 before ranking), ties by doc_id
      """WITH t AS (SELECT doc_id, lang, text, length(text) AS lc,
                      CASE WHEN length(trim(text)) = 0 THEN 0
                           ELSE len(string_split_regex(trim(text), ' +')) END AS nt,
                      CASE WHEN length(trim(text)) = 0 THEN 0
                           ELSE len(list_distinct(string_split_regex(trim(text), ' +'))) END AS nu
                    FROM documents),
              s AS (SELECT doc_id, lang,
                      round(
                        LEAST(CAST(lc AS DOUBLE) / 400.0, 1.0) * 0.4
                        + (CASE WHEN nt = 0 THEN 0.0
                                ELSE CAST(nu AS DOUBLE) / CAST(nt AS DOUBLE) END) * 0.4
                        + (CASE WHEN nt = 0 THEN 0.5
                                WHEN (CAST(length(trim(text)) - (nt - 1) AS DOUBLE)
                                      / CAST(nt AS DOUBLE)) BETWEEN 3 AND 10 THEN 1.0
                                ELSE 0.5 END) * 0.2, 6) AS quality
                    FROM t)
         SELECT doc_id, lang, quality, CAST(rk AS INTEGER) AS rank
         FROM (SELECT doc_id, lang, quality,
                      ROW_NUMBER() OVER (PARTITION BY lang
                        ORDER BY quality DESC, doc_id) AS rk
               FROM s) z
         WHERE rk <= 5 ORDER BY lang, rank""",
    "q57_session_windows" ->
      // gap-island mirror of session_window: a session break is a >30min gap
      // since the previous event of the same user; window end = last + gap
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
              flagged AS (SELECT user_id, ts,
                            CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                                      > INTERVAL 30 MINUTE
                                 OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                                 THEN 1 ELSE 0 END AS new_session
                          FROM e),
              sess AS (SELECT user_id, ts,
                         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS sid
                       FROM flagged)
         SELECT user_id, MIN(ts) AS session_start,
                MAX(ts) + INTERVAL 30 MINUTE AS session_end,
                COUNT(*) AS n_events
         FROM sess GROUP BY user_id, sid ORDER BY user_id, session_start""",
    "q78_repetition_filter" ->
      // identical two-int division on both sides → bit-identical ratio and
      // threshold verdict; Spark's distinct count is 64-bit-hash-based (the
      // shingle kernel), the oracle's is string-based — equal short of a
      // 2⁻⁶⁴ per-doc collision
      """WITH p AS (SELECT lang,
                      CASE WHEN doc_id % 13 = 0
                           THEN trim(repeat('rep' || CAST(doc_id % 5 AS VARCHAR)
                                            || ' ', 40))
                           ELSE text END AS text
                    FROM documents),
              d AS (SELECT lang, string_split_regex(trim(text), ' +') AS tk
                    FROM p),
              s AS (SELECT lang,
                      CASE WHEN len(tk) >= 2
                           THEN 1.0 - CAST(len(list_distinct(
                                    [tk[i] || ' ' || tk[i+1]
                                     for i in range(1, len(tk))])) AS DOUBLE)
                                / CAST(len(tk) - 1 AS DOUBLE)
                           ELSE 0.0 END AS ratio
                    FROM d)
         SELECT lang, COUNT(*) AS n_docs,
                CAST(SUM(CASE WHEN ratio > 0.2 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_flagged,
                round(MAX(ratio), 6) AS max_ratio
         FROM s GROUP BY 1 ORDER BY lang""",
    "q79_pii_scrub" ->
      // both engines plant the same deterministic address on every 5th doc;
      // the pattern is Java-regex/RE2-agnostic (char classes + greedy
      // quantifiers, no alternation/backtracking divergence)
      """WITH p AS (SELECT lang,
                      CASE WHEN doc_id % 5 = 0
                           THEN text || ' contact: user' ||
                                CAST(doc_id AS VARCHAR) || '@example.com'
                           ELSE text END AS t
                    FROM documents),
              m AS (SELECT lang,
                      len(regexp_extract_all(t,
                        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_pii,
                      length(t) - length(regexp_replace(t,
                        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                        '[EMAIL]', 'g')) AS redacted
                    FROM p)
         SELECT lang, COUNT(*) AS n_docs,
                CAST(SUM(CASE WHEN n_pii > 0 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_docs_with_pii,
                CAST(SUM(n_pii) AS BIGINT) AS n_matches,
                CAST(SUM(redacted) AS BIGINT) AS chars_redacted
         FROM m GROUP BY 1 ORDER BY lang""",
    "q80_contamination" ->
      // gram-string join ground truth for the hash-join engine path; same
      // short-doc whole-text fallback as the q22 shingle contract
      """WITH toks AS (SELECT doc_id, lang, string_split_regex(trim(text), ' +') AS tk
                       FROM documents),
              g AS (SELECT doc_id, lang,
                      CASE WHEN len(tk) >= 8
                           THEN [array_to_string(tk[i:i+7], ' ')
                                 for i in range(1, len(tk) - 6)]
                           ELSE [array_to_string(tk, ' ')] END AS grams
                    FROM toks),
              ev AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id < 50),
              tr AS (SELECT doc_id, unnest(grams) AS gram FROM g WHERE doc_id >= 50),
              hits AS (SELECT DISTINCT tr.doc_id FROM tr JOIN ev ON tr.gram = ev.gram)
         SELECT lang, COUNT(*) AS n_train_docs,
                CAST(SUM(CASE WHEN doc_id IN (SELECT doc_id FROM hits)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated
         FROM documents WHERE doc_id >= 50 GROUP BY 1 ORDER BY lang""",
    "q85_incremental_dedup" ->
      // same canonical rule inside the batch (min doc_id per md5), then the
      // NOT IN mirrors the anti-join against already-ingested hashes
      """WITH ingested AS (SELECT DISTINCT md5(text) AS h FROM documents
                           WHERE doc_id < 250),
              batch AS (SELECT * FROM documents WHERE doc_id >= 250
                        AND doc_id IN (SELECT MIN(doc_id) FROM documents
                                       WHERE doc_id >= 250 GROUP BY md5(text))),
              fresh AS (SELECT * FROM batch
                        WHERE md5(text) NOT IN (SELECT h FROM ingested))
         SELECT lang, COUNT(*) AS n_new_docs,
                CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS sum_chars
         FROM fresh GROUP BY 1 ORDER BY lang""",
    "q90_bloom_incremental_dedup" ->
      // the Bloom prefilter is a pure optimization (no false negatives +
      // exact verify of flagged rows) — the oracle is exactly q85's
      """WITH ingested AS (SELECT DISTINCT md5(text) AS h FROM documents
                           WHERE doc_id < 250),
              batch AS (SELECT * FROM documents WHERE doc_id >= 250
                        AND doc_id IN (SELECT MIN(doc_id) FROM documents
                                       WHERE doc_id >= 250 GROUP BY md5(text))),
              fresh AS (SELECT * FROM batch
                        WHERE md5(text) NOT IN (SELECT h FROM ingested))
         SELECT lang, COUNT(*) AS n_new_docs,
                CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS sum_chars
         FROM fresh GROUP BY 1 ORDER BY lang""",
    "q91_cms_heavy_hitters" ->
      // exact counts re-derived from the oracle's own tokenization; the
      // sketch-contract booleans are TRUE by the CMS guarantee (one-sided
      // error; additive bound at the fixed seed)
      """WITH toks AS (SELECT unnest(string_split_regex(trim(text), ' +')) AS token
                       FROM documents),
              probe(token) AS (VALUES ('join'),('hash'),('row'),('batch'),
                ('scan'),('filter'),('vector'),('data'),('merge'),('order'),
                ('zz_absent_token')),
              c AS (SELECT token, COUNT(*) AS n FROM toks GROUP BY 1)
         SELECT p.token, CAST(COALESCE(c.n, 0) AS BIGINT) AS n_exact,
                TRUE AS lower_ok, TRUE AS upper_ok
         FROM probe p LEFT JOIN c USING (token) ORDER BY token""",
    "q92_weighted_sample" ->
      // same exact-dyadic u and sqrt-chain key: sqrt is IEEE correctly
      // rounded, so score and pick are bit-identical across engines
      """WITH h AS (SELECT doc_id, lang,
                      CASE WHEN n_chars > 500 THEN 4
                           WHEN n_chars > 200 THEN 2 ELSE 1 END AS w,
                      ((doc_id * 2654435761) % 4294967296 + 1) / 4294967296.0 AS u
                    FROM documents),
              k AS (SELECT doc_id, lang,
                      CASE WHEN w = 4 THEN sqrt(sqrt(u))
                           WHEN w = 2 THEN sqrt(u) ELSE u END AS score
                    FROM h)
         SELECT doc_id, lang, CAST(rk AS INTEGER) AS rank, score
         FROM (SELECT doc_id, lang, score,
                      ROW_NUMBER() OVER (PARTITION BY lang
                                         ORDER BY score DESC, doc_id) AS rk
               FROM k) t
         WHERE rk <= 10 ORDER BY lang, rank""",
    "q93_semantic_dedup" ->
      // brute-force cosine pairs over the same planted-copy corpus (q55's
      // ground truth) closed into components by recursive transitive
      // closure (q65's pattern); canonical = min reachable id
      """WITH RECURSIVE
              c AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings
                    UNION ALL
                    SELECT vec_id + 1000000, embedding::DOUBLE[] FROM embeddings
                    WHERE vec_id < 20),
              p AS (SELECT a.vec_id AS id1, b.vec_id AS id2
                    FROM c a JOIN c b ON a.vec_id < b.vec_id
                    WHERE round(list_sum([a.v[i] * b.v[i] for i in range(1, len(a.v) + 1)])
                        / (sqrt(list_sum([x * x for x in a.v]))
                           * sqrt(list_sum([x * x for x in b.v]))), 6) >= 0.99),
              edges AS (SELECT id1 AS s, id2 AS d FROM p
                        UNION SELECT id2, id1 FROM p),
              walk(id, reach) AS (
                SELECT s, d FROM edges
                UNION
                SELECT w.id, e.d FROM walk w JOIN edges e ON w.reach = e.s)
         SELECT CAST(id AS BIGINT) AS vec_id,
                CAST(LEAST(id, MIN(reach)) AS BIGINT) AS canonical_id
         FROM walk GROUP BY id ORDER BY vec_id""",
    "q117_corpus_card" ->
      // same single-pass facts; DuckDB HUGEINT sums cast back to BIGINT
      """WITH d AS (SELECT doc_id, lang, source, md5(text) AS h,
                      CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                           ELSE len(string_split_regex(trim(text), ' +')) END
                        AS BIGINT) AS nt
                    FROM documents)
         SELECT COUNT(*) AS n_docs,
                COUNT(DISTINCT lang) AS n_langs,
                COUNT(DISTINCT source) AS n_sources,
                COUNT(DISTINCT h) AS n_distinct_texts,
                CAST(SUM(nt) AS BIGINT) AS total_tokens,
                CAST(MAX(nt) AS BIGINT) AS max_tokens,
                round(CAST(COUNT(*) - COUNT(DISTINCT h) AS DOUBLE)
                      / CAST(COUNT(*) AS DOUBLE), 6) AS dup_rate,
                round(CAST(SUM(nt) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
                  AS mean_tokens
         FROM d""",
    "q114_mixing_plan" ->
      // identical share CASE, identical closed-form doubles from the same
      // exact token counts
      """WITH d AS (SELECT lang,
                      CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                           ELSE len(string_split_regex(trim(text), ' +')) END
                        AS BIGINT) AS nt
                    FROM documents),
              a AS (SELECT lang, CAST(SUM(nt) AS BIGINT) AS available_tokens
                    FROM d GROUP BY 1),
              t AS (SELECT lang, available_tokens,
                      CAST(round(200000.0 * CASE lang WHEN 'en' THEN 0.4
                             WHEN 'de' THEN 0.2 WHEN 'es' THEN 0.2
                             WHEN 'fr' THEN 0.1 ELSE 0.1 END) AS BIGINT)
                        AS target_tokens
                    FROM a)
         SELECT lang, available_tokens, target_tokens,
                round(LEAST(1.0, CAST(target_tokens AS DOUBLE)
                      / CAST(available_tokens AS DOUBLE)), 6) AS keep_rate,
                round(GREATEST(1.0, CAST(target_tokens AS DOUBLE)
                      / CAST(available_tokens AS DOUBLE)), 6) AS epochs
         FROM t ORDER BY lang""",
    "q115_feature_correlation" ->
      // same exact-long moments, same double expression, same rounding
      """WITH e AS (SELECT event_type,
                      CAST(round(value * 100) AS BIGINT) AS x,
                      CAST(EXTRACT(hour FROM CAST(ts AS TIMESTAMP)) AS BIGINT) AS y
                    FROM events),
              m AS (SELECT event_type, COUNT(*) AS n,
                      CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
                      CAST(SUM(x * y) AS BIGINT) AS sxy,
                      CAST(SUM(x * x) AS BIGINT) AS sxx,
                      CAST(SUM(y * y) AS BIGINT) AS syy
                    FROM e GROUP BY 1)
         SELECT event_type, n,
                round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                      / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                             * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                                - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
                  AS rho
         FROM m ORDER BY event_type""",
    "q113_rolling_anomaly" ->
      // identical frame, identical exact-integer moments, identical
      // double derivation order (q84's mirror rule, windowed)
      """WITH e AS (SELECT event_type, event_id, CAST(ts AS TIMESTAMP) AS ts,
                      CAST(round(value * 100) AS BIGINT) AS cents
                    FROM events),
              s AS (SELECT event_type, cents,
                      COUNT(*) OVER w AS n,
                      SUM(cents) OVER w AS sm,
                      SUM(cents * cents) OVER w AS sq
                    FROM e
                    WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                                 ROWS BETWEEN 99 PRECEDING AND CURRENT ROW)),
              f AS (SELECT event_type, cents,
                      CAST(sm AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
                      (CAST(sq AS DOUBLE)
                        - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE) / CAST(n AS DOUBLE))
                        / CAST(n AS DOUBLE) AS variance
                    FROM s WHERE n = 100)
         SELECT event_type, COUNT(*) AS n_windows,
                CAST(SUM(CASE WHEN abs(CAST(cents AS DOUBLE) - mean)
                               > 3.0 * sqrt(variance) THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_anomalies
         FROM f GROUP BY 1 ORDER BY event_type""",
    "q118_gdpr_purge" ->
      // same deletion rule, same three-way reconciliation
      """WITH dels AS (SELECT DISTINCT user_id FROM events WHERE user_id % 17 = 0),
              purged AS (SELECT * FROM events
                         WHERE user_id NOT IN (SELECT user_id FROM dels)),
              rollup AS (SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS n
                         FROM purged GROUP BY 1, 2),
              b AS (SELECT event_type, COUNT(*) AS n_before FROM events GROUP BY 1),
              a AS (SELECT event_type, COUNT(*) AS n_after FROM purged GROUP BY 1),
              r AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS n_after_rollup
                    FROM rollup GROUP BY 1)
         SELECT b.event_type, b.n_before,
                CAST(b.n_before - a.n_after AS BIGINT) AS n_purged,
                a.n_after, r.n_after_rollup
         FROM b JOIN a USING (event_type) JOIN r USING (event_type)
         ORDER BY b.event_type""",
    "q119_user_sessions" ->
      // same lag + cumulative-sum island numbering under the same
      // (ts, event_id) order; 30-minute gap, exact microsecond arithmetic
      """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
                    FROM events),
              l AS (SELECT user_id, event_id, ts,
                      LAG(ts) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS prev_ts
                    FROM e),
              f AS (SELECT user_id, event_id, ts,
                      CASE WHEN prev_ts IS NULL
                             OR ts >= prev_ts + INTERVAL 30 MINUTE
                           THEN 1 ELSE 0 END AS new_session
                    FROM l),
              sid AS (SELECT user_id,
                        SUM(new_session) OVER (PARTITION BY user_id
                                               ORDER BY ts, event_id) AS session_id
                      FROM f),
              per AS (SELECT user_id, session_id, COUNT(*) AS n_ev
                      FROM sid GROUP BY 1, 2)
         SELECT user_id, COUNT(*) AS n_sessions,
                CAST(SUM(n_ev) AS BIGINT) AS n_events,
                CAST(MAX(n_ev) AS BIGINT) AS longest_session_events
         FROM per GROUP BY 1 ORDER BY user_id""",
    "q120_cohort_retention" ->
      // same signup-week cohorts; both engines truncate weeks to Monday
      // and divide exact counts once, rounded to 6dp
      """WITH su AS (SELECT user_id,
                       CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
                     FROM events WHERE event_type = 'signup' GROUP BY 1),
              act AS (SELECT DISTINCT e.user_id, su.cohort_week,
                        CAST(date_trunc('week', e.ts) AS DATE) AS active_week
                      FROM events e JOIN su USING (user_id)
                      WHERE CAST(date_trunc('week', e.ts) AS DATE)
                              >= su.cohort_week),
              cs AS (SELECT cohort_week, COUNT(*) AS cohort_users
                     FROM su GROUP BY 1),
              r AS (SELECT cohort_week, active_week,
                      COUNT(*) AS active_users
                    FROM act GROUP BY 1, 2)
         SELECT r.cohort_week,
                CAST(date_diff('day', r.cohort_week, r.active_week) / 7
                     AS BIGINT) AS week_no,
                r.active_users, cs.cohort_users,
                ROUND(r.active_users * 1.0 / cs.cohort_users, 6) AS retention
         FROM r JOIN cs USING (cohort_week)
         ORDER BY r.cohort_week, week_no""",
    "q121_scd2_runs" ->
      // same value-change island numbering under the same (ts, event_id)
      // order; run_seq widened to BIGINT on both sides
      """WITH e AS (SELECT user_id, event_id, event_type,
                      CAST(ts AS TIMESTAMP) AS ts FROM events),
              l AS (SELECT *, LAG(event_type) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS prev_type
                    FROM e),
              f AS (SELECT *, CASE WHEN prev_type IS NULL
                                     OR prev_type <> event_type
                                   THEN 1 ELSE 0 END AS chg
                    FROM l),
              sid AS (SELECT user_id, event_id, event_type, ts,
                        CAST(SUM(chg) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS BIGINT) AS run_seq
                      FROM f),
              runs AS (SELECT user_id, run_seq, event_type,
                         MIN(ts) AS valid_from, MAX(ts) AS valid_to,
                         COUNT(*) AS n_ev
                       FROM sid GROUP BY 1, 2, 3)
         SELECT user_id, run_seq, event_type, valid_from, valid_to, n_ev,
                valid_to = MAX(valid_to) OVER (PARTITION BY user_id)
                  AS is_current
         FROM runs ORDER BY user_id, run_seq""",
    "q122_hourly_gap_fill" ->
      // same dense (type x hour) grid; DuckDB's list generate_series
      // replaces Spark's sequence() explode
      """WITH b AS (SELECT date_trunc('hour', MIN(ts)) AS h0,
                      date_trunc('hour', MAX(ts)) AS h1 FROM events),
              hours AS (SELECT unnest(generate_series(b.h0, b.h1,
                          INTERVAL 1 HOUR)) AS h FROM b),
              t AS (SELECT DISTINCT event_type FROM events),
              g AS (SELECT t.event_type, hours.h FROM t CROSS JOIN hours),
              c AS (SELECT event_type, date_trunc('hour', ts) AS h,
                      COUNT(*) AS n FROM events GROUP BY 1, 2)
         SELECT g.event_type, g.h, COALESCE(c.n, 0) AS n
         FROM g LEFT JOIN c USING (event_type, h)
         ORDER BY g.event_type, g.h""",
    "q123_triangle_count" ->
      // plain id orientation — same triangle set as the engine's
      // degree orientation, counted once per triangle
      """WITH e AS (SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
                    FROM lineitem x JOIN lineitem y
                      ON x.l_orderkey = y.l_orderkey
                    WHERE x.l_partkey < y.l_partkey),
              tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
                      FROM e e1 JOIN e e2 ON e1.b = e2.a
                        JOIN e e3 ON e1.a = e3.a AND e2.b = e3.b),
              pv AS (SELECT part, COUNT(*) AS n_tri FROM (
                       SELECT x AS part FROM tri
                       UNION ALL SELECT y FROM tri
                       UNION ALL SELECT z FROM tri)
                     GROUP BY 1),
              tot AS (SELECT COUNT(*) AS total_triangles FROM tri)
         SELECT pv.part, pv.n_tri, tot.total_triangles
         FROM pv, tot ORDER BY pv.n_tri DESC, pv.part LIMIT 20""",
    "q124_trend_fit" ->
      // same exact HUGEINT moments, same closed-form double expressions
      """WITH h AS (SELECT date_trunc('hour', MIN(ts)) AS h0 FROM events),
              e AS (SELECT event_type,
                      date_diff('hour', h.h0, date_trunc('hour', ts)) AS x,
                      CAST(ROUND(value * 100) AS BIGINT) AS y
                    FROM events, h),
              m AS (SELECT event_type, COUNT(*) AS n,
                      SUM(x) AS sx, SUM(y) AS sy,
                      SUM(x * y) AS sxy, SUM(x * x) AS sxx
                    FROM e GROUP BY 1)
         SELECT event_type, n,
                ROUND((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
                  / (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE), 6)
                  AS slope_cents_per_hour,
                ROUND((sy::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sxy::DOUBLE)
                  / (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE), 6)
                  AS intercept_cents
         FROM m ORDER BY event_type""",
    "q125_lang_drift" ->
      // same min/max source pair, same Laplace smoothing, same per-lang
      // p*ln(p/q) terms (no float sum crosses the engines)
      """WITH s AS (SELECT MIN(source) AS sa, MAX(source) AS sb
                    FROM documents),
              c AS (SELECT source, lang, COUNT(*) AS c
                    FROM documents GROUP BY 1, 2),
              langs AS (SELECT DISTINCT lang FROM documents),
              j AS (SELECT langs.lang,
                      COALESCE(ca.c, 0) AS ca, COALESCE(cb.c, 0) AS cb
                    FROM langs
                    LEFT JOIN (SELECT c.lang, c.c FROM c, s
                               WHERE c.source = s.sa) ca ON langs.lang = ca.lang
                    LEFT JOIN (SELECT c.lang, c.c FROM c, s
                               WHERE c.source = s.sb) cb ON langs.lang = cb.lang),
              t AS (SELECT CAST(SUM(ca) AS BIGINT) AS ta,
                      CAST(SUM(cb) AS BIGINT) AS tb,
                      COUNT(*) AS k FROM j)
         SELECT j.lang, j.ca, j.cb,
                ROUND((j.ca + 1)::DOUBLE / (t.ta + t.k)::DOUBLE, 6)
                  AS p_smoothed,
                ROUND((j.cb + 1)::DOUBLE / (t.tb + t.k)::DOUBLE, 6)
                  AS q_smoothed,
                ROUND((j.ca + 1)::DOUBLE / (t.ta + t.k)::DOUBLE
                  * LN(((j.ca + 1)::DOUBLE / (t.ta + t.k)::DOUBLE)
                     / ((j.cb + 1)::DOUBLE / (t.tb + t.k)::DOUBLE)), 6)
                  AS kl_term
         FROM j, t ORDER BY j.lang""",
    "q126_dq_audit" ->
      // same five expectations, same fixed report schema
      """WITH u AS (
           SELECT 'fk_orders_customer' AS check_name,
                  (SELECT COUNT(*) FROM orders o
                   WHERE o.o_custkey NOT IN
                     (SELECT c_custkey FROM customer)) AS violations,
                  (SELECT COUNT(*) FROM orders) AS total
           UNION ALL
           SELECT 'unique_customer_key',
                  (SELECT COUNT(*) FROM (SELECT c_custkey FROM customer
                     GROUP BY 1 HAVING COUNT(*) > 1)),
                  (SELECT COUNT(*) FROM customer)
           UNION ALL
           SELECT 'event_value_nonneg',
                  (SELECT COUNT(*) FROM events
                   WHERE value IS NULL OR value < 0),
                  (SELECT COUNT(*) FROM events)
           UNION ALL
           SELECT 'document_text_nonempty',
                  (SELECT COUNT(*) FROM documents
                   WHERE text IS NULL OR LENGTH(text) = 0),
                  (SELECT COUNT(*) FROM documents)
           UNION ALL
           SELECT 'event_ts_in_2024',
                  (SELECT COUNT(*) FROM events
                   WHERE EXTRACT(year FROM ts) <> 2024),
                  (SELECT COUNT(*) FROM events))
         SELECT check_name, violations, total, violations = 0 AS pass
         FROM u ORDER BY check_name""",
    "q127_incremental_rollup" ->
      // the oracle recomputes from scratch — equality proves the
      // incremental merge maintained the view correctly
      """SELECT event_type, CAST(ts AS DATE) AS d,
                COUNT(*) AS n,
                CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                  AS sum_cents
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    "q128_attribution" ->
      // lateral last-touch pick, same (ts desc, event_id desc) winner
      // and the same 7-day window arithmetic
      """WITH p AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
                      CAST(ROUND(value * 100) AS BIGINT) AS cents
                    FROM events WHERE event_type = 'purchase'),
              t AS (SELECT user_id, event_id, event_type,
                      CAST(ts AS TIMESTAMP) AS ts
                    FROM events WHERE event_type IN ('click', 'view')),
              a AS (SELECT p.event_id, p.cents,
                      CASE WHEN l.tts IS NULL THEN 'direct'
                           WHEN p.ts <= l.tts + INTERVAL 7 DAY THEN l.typ
                           ELSE 'direct' END AS channel
                    FROM p LEFT JOIN LATERAL (
                      SELECT t.event_type AS typ, t.ts AS tts FROM t
                      WHERE t.user_id = p.user_id AND t.ts <= p.ts
                      ORDER BY t.ts DESC, t.event_id DESC LIMIT 1) l ON TRUE)
         SELECT channel, COUNT(*) AS n_purchases,
                CAST(SUM(cents) AS BIGINT) AS revenue_cents
         FROM a GROUP BY 1 ORDER BY 1""",
    "q129_sliding_distinct" ->
      // exact trailing-7-day distinct; the engine's sketch estimate is
      // pinned within 5% (TRUE-gate), the exact column matches outright
      """WITH pairs AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id
                        FROM events),
              days AS (SELECT DISTINCT CAST(ts AS DATE) AS d FROM events)
         SELECT g.d, COUNT(DISTINCT p.user_id) AS exact_users,
                TRUE AS within_tolerance
         FROM days g JOIN pairs p ON p.d BETWEEN g.d - 6 AND g.d
         GROUP BY g.d ORDER BY g.d""",
    "q130_bloom_join" ->
      // the PLAIN join — the Bloom prune is row-volume-only (false
      // positives die in the join), so results must be bit-identical
      s"""SELECT CAST(month(o_orderdate) AS INT) AS month,
                 COUNT(*) AS n_lines,
                 SUM($centsPrice * (100 - $centsDisc)) / 10000.0 AS revenue
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE o_orderpriority = '1-URGENT' AND year(o_orderdate) = 1995
          GROUP BY 1 ORDER BY month""",
    "q131_sketch_quantiles" ->
      // exact side re-derived with the same ceil-rank definition; the
      // sketch estimates are engine-internal, pinned by the 3*eps
      // TRUE-gates (eps = 1% log-bucket width)
      """WITH ev AS (SELECT CAST(ts AS DATE) AS d, value FROM events),
              days AS (SELECT DISTINCT d FROM ev),
              w AS (SELECT g.d, e.value
                    FROM days g JOIN ev e ON e.d BETWEEN g.d - 6 AND g.d),
              agg AS (SELECT d, COUNT(*) AS n, list_sort(list(value)) AS xs
                      FROM w GROUP BY 1)
         SELECT d, n,
                xs[CAST(ceil(0.5 * n) AS INT)] AS exact_p50,
                xs[CAST(ceil(0.95 * n) AS INT)] AS exact_p95,
                TRUE AS p50_ok, TRUE AS p95_ok
         FROM agg ORDER BY d""",
    "q132_kcore_peeling" ->
      // the 5 peel rounds unrolled as chained CTEs (q105's unrolling
      // pattern): same weighted edge build, same degree >= 3 keep rule
      """WITH e0 AS MATERIALIZED (SELECT a, b FROM (
                SELECT x.l_partkey AS a, y.l_partkey AS b, COUNT(*) AS w
                FROM lineitem x JOIN lineitem y
                  ON x.l_orderkey = y.l_orderkey
                WHERE x.l_partkey < y.l_partkey GROUP BY 1, 2)
              WHERE w >= 2),
            k1 AS MATERIALIZED (SELECT v FROM (SELECT v, COUNT(*) AS deg FROM
                     (SELECT a AS v FROM e0 UNION ALL SELECT b FROM e0)
                     GROUP BY 1) WHERE deg >= 3),
            e1 AS MATERIALIZED (SELECT a, b FROM e0 WHERE a IN (SELECT v FROM k1)
                                         AND b IN (SELECT v FROM k1)),
            k2 AS MATERIALIZED (SELECT v FROM (SELECT v, COUNT(*) AS deg FROM
                     (SELECT a AS v FROM e1 UNION ALL SELECT b FROM e1)
                     GROUP BY 1) WHERE deg >= 3),
            e2 AS MATERIALIZED (SELECT a, b FROM e1 WHERE a IN (SELECT v FROM k2)
                                         AND b IN (SELECT v FROM k2)),
            k3 AS MATERIALIZED (SELECT v FROM (SELECT v, COUNT(*) AS deg FROM
                     (SELECT a AS v FROM e2 UNION ALL SELECT b FROM e2)
                     GROUP BY 1) WHERE deg >= 3),
            e3 AS MATERIALIZED (SELECT a, b FROM e2 WHERE a IN (SELECT v FROM k3)
                                         AND b IN (SELECT v FROM k3)),
            k4 AS MATERIALIZED (SELECT v FROM (SELECT v, COUNT(*) AS deg FROM
                     (SELECT a AS v FROM e3 UNION ALL SELECT b FROM e3)
                     GROUP BY 1) WHERE deg >= 3),
            e4 AS MATERIALIZED (SELECT a, b FROM e3 WHERE a IN (SELECT v FROM k4)
                                         AND b IN (SELECT v FROM k4)),
            k5 AS MATERIALIZED (SELECT v FROM (SELECT v, COUNT(*) AS deg FROM
                     (SELECT a AS v FROM e4 UNION ALL SELECT b FROM e4)
                     GROUP BY 1) WHERE deg >= 3),
            e5 AS MATERIALIZED (SELECT a, b FROM e4 WHERE a IN (SELECT v FROM k5)
                                         AND b IN (SELECT v FROM k5))
         SELECT * FROM (
           SELECT CAST(1 AS INT) AS round,
                  (SELECT COUNT(*) FROM k1) AS n_vertices,
                  (SELECT COUNT(*) FROM e1) AS n_edges,
                  (SELECT COUNT(*) FROM e1) = (SELECT COUNT(*) FROM e0)
                    AS converged
           UNION ALL
           SELECT CAST(2 AS INT), (SELECT COUNT(*) FROM k2),
                  (SELECT COUNT(*) FROM e2),
                  (SELECT COUNT(*) FROM e2) = (SELECT COUNT(*) FROM e1)
           UNION ALL
           SELECT CAST(3 AS INT), (SELECT COUNT(*) FROM k3),
                  (SELECT COUNT(*) FROM e3),
                  (SELECT COUNT(*) FROM e3) = (SELECT COUNT(*) FROM e2)
           UNION ALL
           SELECT CAST(4 AS INT), (SELECT COUNT(*) FROM k4),
                  (SELECT COUNT(*) FROM e4),
                  (SELECT COUNT(*) FROM e4) = (SELECT COUNT(*) FROM e3)
           UNION ALL
           SELECT CAST(5 AS INT), (SELECT COUNT(*) FROM k5),
                  (SELECT COUNT(*) FROM e5),
                  (SELECT COUNT(*) FROM e5) = (SELECT COUNT(*) FROM e4))
         ORDER BY round""",
    "q133_prefix_filter_join" ->
      // FULL brute-force all-pairs Jaccard — prefix filtering promises
      // exact recall, so the whole O(n^2) space is the oracle (same
      // word-5-gram shingle builder as q22's, shingles-as-strings vs
      // engine 64-bit hashes — identical set sizes absent collisions).
      // Quadratic by design: affordable at the gate scale, the engine's
      // prefix join replaces exactly this at 100 TB.
      """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), ' +') AS tk
                       FROM documents),
              sh AS (SELECT doc_id,
                       CASE WHEN len(tk) >= 5
                            THEN list_distinct([array_to_string(tk[i:i+4], ' ')
                                                for i in range(1, len(tk) - 3)])
                            ELSE [array_to_string(tk, ' ')] END AS grams
                     FROM toks)
         SELECT a.doc_id AS id1, b.doc_id AS id2,
                CAST(len(list_intersect(a.grams, b.grams)) AS BIGINT)
                  AS inter_size,
                CAST(len(list_distinct(list_concat(a.grams, b.grams))) AS BIGINT)
                  AS union_size
         FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         WHERE len(list_intersect(a.grams, b.grams)) * 5
               >= len(list_distinct(list_concat(a.grams, b.grams))) * 4
         ORDER BY id1, id2""",
    "q134_unigram_perplexity" ->
      // same tokenization as q49, same round-9 DECIMAL surprisal carried
      // exactly through the tf-weighted sum (order-independent on both
      // engines); ln parity per the q82 precedent
      """WITH tf AS (SELECT doc_id, token, COUNT(*) AS tf
                     FROM (SELECT doc_id,
                             unnest(string_split_regex(trim(text), ' +'))
                               AS token
                           FROM documents)
                     WHERE length(token) > 0 GROUP BY 1, 2),
              vocab AS (SELECT token, SUM(tf) AS c FROM tf GROUP BY 1),
              tot AS (SELECT SUM(c) AS n_total FROM vocab),
              terms AS (SELECT doc_id, tf,
                          CAST(tf AS DECIMAL(9,0)) *
                          CAST(round(-ln(CAST(c AS DOUBLE) / n_total), 9)
                               AS DECIMAL(19,9)) AS term
                        FROM tf JOIN vocab USING (token), tot)
         SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
                round(CAST(SUM(term) AS DOUBLE)
                      / CAST(SUM(tf) AS DOUBLE), 6) AS cross_entropy
         FROM terms GROUP BY doc_id ORDER BY doc_id""",
    "q135_zorder_layout" ->
      // layout-invariant aggregates straight from the source table (same
      // derived box bounds, same decimal-exact value sum); the file-
      // locality booleans are layout-internal and TRUE-gated — the z
      // layout's disjoint z-ranges put the box in <= 4 of 16 files at
      // every tested scale, the hash control never beats it
      """WITH b AS (SELECT MAX(user_id) AS mu, MIN(ts) AS t0 FROM events),
              box AS (SELECT e.value FROM events e, b
                      WHERE e.user_id * 8 <= b.mu
                        AND e.ts >= b.t0 + INTERVAL 2 DAY
                        AND e.ts < b.t0 + INTERVAL 4 DAY)
         SELECT COUNT(*) AS n_rows,
                CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                  AS sum_value,
                TRUE AS layouts_agree, TRUE AS z_clustered,
                TRUE AS z_no_worse
         FROM box""",
    "q136_editdist_dedup" ->
      // FULL brute-force all-pairs Levenshtein — deletion-neighborhood
      // blocking promises exact recall, so the whole O(n^2) space is the
      // oracle (quadratic by design, affordable at the gate scale; the
      // engine's variant join replaces exactly this at 100 TB)
      """SELECT a.c_custkey AS id1, b.c_custkey AS id2,
                a.c_name AS s1, b.c_name AS s2,
                CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
         FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
         WHERE levenshtein(a.c_name, b.c_name) <= 1
         ORDER BY id1, id2""",
    "q137_ks_drift" ->
      // same derived min/max sides, same integer cents buckets, same
      // exact DECIMAL |ca*nb - cb*na| maximum; only the final division
      // is float, applied to already-equal operands
      """WITH s AS (SELECT MIN(event_type) AS sa, MAX(event_type) AS sb
                    FROM events),
              lab AS (SELECT CASE WHEN event_type = s.sa
                               THEN 'A' ELSE 'B' END AS side,
                        CAST(floor(CAST(round(value * 100) AS BIGINT) / 100)
                             AS BIGINT) AS bucket
                      FROM events, s
                      WHERE event_type = s.sa OR event_type = s.sb),
              c AS (SELECT bucket,
                      SUM(CASE WHEN side = 'A' THEN 1 ELSE 0 END) AS ca,
                      SUM(CASE WHEN side = 'B' THEN 1 ELSE 0 END) AS cb
                    FROM lab GROUP BY 1),
              cum AS (SELECT bucket,
                        SUM(ca) OVER (ORDER BY bucket) AS cum_a,
                        SUM(cb) OVER (ORDER BY bucket) AS cum_b
                      FROM c),
              t AS (SELECT MAX(cum_a) AS n_a, MAX(cum_b) AS n_b FROM cum),
              g AS (SELECT bucket,
                      abs(CAST(cum_a AS DECIMAL(18,0))
                            * CAST(t.n_b AS DECIMAL(18,0))
                          - CAST(cum_b AS DECIMAL(18,0))
                            * CAST(t.n_a AS DECIMAL(18,0))) AS gap
                    FROM cum, t),
              m AS (SELECT MAX(gap) AS max_gap FROM g)
         SELECT CAST(t.n_a AS BIGINT) AS n_a, CAST(t.n_b AS BIGINT) AS n_b,
                (SELECT MIN(bucket) FROM g, m WHERE g.gap = m.max_gap)
                  AS ks_at_bucket,
                round(CAST(m.max_gap AS DOUBLE)
                      / (CAST(t.n_a AS DOUBLE) * CAST(t.n_b AS DOUBLE)), 9)
                  AS ks
         FROM t, m""",
    "q138_image_phash_dedup" ->
      // every aHash re-derived from the closed-form two-band construction
      // (PngCodec.imageParams, reproduced literally like q28): cell
      // column j covers x in [ceil(jW/8), ceil((j+1)W/8)); rows are
      // constant, so bit (i,j) reduces to rowsum_j*W > rowTotal*width_j,
      // independent of i — the hash is the column byte replicated 8x,
      // built in HUGEINT then wrapped to the signed 64-bit value the
      // engine's Long arithmetic produces
      """WITH imgs AS (SELECT doc_id,
                         CAST(n_chars % 64 + 16 AS BIGINT) AS w,
                         (doc_id % 256) + (n_chars % 256)
                           + ((doc_id * 31 + 7) % 256) AS la,
                         ((doc_id * 7 + 13) % 256) + ((n_chars * 5 + 3) % 256)
                           + ((doc_id + n_chars) % 256) AS lb
                       FROM documents WHERE doc_id % 3 = 0),
              cols AS (SELECT doc_id, w, la, lb, j,
                         (j * w + 7) // 8 AS xlo,
                         ((j + 1) * w + 7) // 8 AS xhi
                       FROM imgs, range(8) t(j)),
              bits AS (SELECT doc_id,
                         CASE WHEN (GREATEST(0, LEAST(w // 2, xhi) - xlo) * la
                                    + (xhi - xlo
                                       - GREATEST(0, LEAST(w // 2, xhi) - xlo))
                                      * lb) * w
                                   > ((w // 2) * la + (w - w // 2) * lb)
                                     * (xhi - xlo)
                              THEN CAST(1 AS BIGINT) << j ELSE 0 END AS bitval
                       FROM cols),
              hashes AS (SELECT doc_id,
                           CAST(SUM(bitval) AS HUGEINT)
                             * 72340172838076673 AS v
                         FROM bits GROUP BY 1)
         SELECT CAST(CASE WHEN v >= 9223372036854775808
                          THEN v - 18446744073709551616 ELSE v END
                     AS BIGINT) AS ahash,
                COUNT(*) AS n_images, MIN(doc_id) AS first_id,
                MAX(doc_id) AS last_id
         FROM hashes GROUP BY 1 ORDER BY ahash""",
    "q139_audio_features" ->
      // every WAV statistic re-derived from the closed-form stereo ramp
      // (WavCodec.audioParams, reproduced literally like q28/q138): the
      // engine parses the RIFF container and sums REAL decoded samples;
      // the oracle expands the same per-frame modular ramp from the
      // documents table and sums it exactly
      """WITH aud AS (SELECT doc_id,
                        CAST(n_chars % 700 + 160 AS BIGINT) AS n_frames,
                        (doc_id * 131 + 7) % 65536 AS a0,
                        (n_chars * 17 + 3) % 65536 AS b0,
                        (doc_id * 89 + 11) % 65536 AS a1,
                        (n_chars * 29 + 5) % 65536 AS b1
                      FROM documents WHERE doc_id % 3 = 1),
              s AS (SELECT doc_id, n_frames, a0, b0, a1, b1,
                      unnest(range(n_frames)) AS i
                    FROM aud)
         SELECT doc_id AS media_id, CAST(2 AS INTEGER) AS n_channels,
                CAST(8000 AS INTEGER) AS sample_rate,
                CAST(MAX(n_frames) AS BIGINT) AS n_frames,
                CAST(SUM((a0 + i * b0) % 65536 - 32768) AS BIGINT) AS sum_left,
                CAST(SUM((a1 + i * b1) % 65536 - 32768) AS BIGINT) AS sum_right
         FROM s GROUP BY doc_id ORDER BY media_id""",
    "q156_audio_audit" ->
      // the audit decode replayed sample-for-sample from the same ramp:
      // clip threshold |s| >= 32766, silence floor |s| <= 512, per-channel
      // peak = MAX(|s|) and energy = SUM(s^2) — all exact integers
      // (WavCodec.clipAbs/silenceAbs, reproduced literally)
      """WITH aud AS (SELECT doc_id,
                        CAST(n_chars % 700 + 160 AS BIGINT) AS n_frames,
                        (doc_id * 131 + 7) % 65536 AS a0,
                        (n_chars * 17 + 3) % 65536 AS b0,
                        (doc_id * 89 + 11) % 65536 AS a1,
                        (n_chars * 29 + 5) % 65536 AS b1
                      FROM documents WHERE doc_id % 3 = 1),
              sm AS (SELECT doc_id, n_frames,
                       (a0 + i * b0) % 65536 - 32768 AS l,
                       (a1 + i * b1) % 65536 - 32768 AS r
                     FROM (SELECT doc_id, n_frames, a0, b0, a1, b1,
                             unnest(range(n_frames)) AS i
                           FROM aud))
         SELECT doc_id AS media_id,
                CAST(MAX(n_frames) AS BIGINT) AS n_frames,
                CAST(SUM(CASE WHEN ABS(l) >= 32766 THEN 1 ELSE 0 END)
                     AS BIGINT) AS clip_l,
                CAST(SUM(CASE WHEN ABS(r) >= 32766 THEN 1 ELSE 0 END)
                     AS BIGINT) AS clip_r,
                CAST(SUM(CASE WHEN ABS(l) <= 512 THEN 1 ELSE 0 END)
                     AS BIGINT) AS silence_l,
                CAST(SUM(CASE WHEN ABS(r) <= 512 THEN 1 ELSE 0 END)
                     AS BIGINT) AS silence_r,
                CAST(MAX(ABS(l)) AS BIGINT) AS peak_l,
                CAST(MAX(ABS(r)) AS BIGINT) AS peak_r,
                CAST(SUM(l * l) AS BIGINT) AS energy_l,
                CAST(SUM(r * r) AS BIGINT) AS energy_r
         FROM sm GROUP BY doc_id ORDER BY media_id""",
    "q157_snapshot_diff" ->
      // v2 rebuilt with the same deterministic edits, then the full-outer
      // classification replayed with null-safe (IS NOT DISTINCT FROM)
      // payload equality
      """WITH v2 AS (SELECT doc_id,
                       CASE WHEN doc_id % 7 = 3 THEN text || ' rev2 edit'
                            ELSE text END AS text,
                       lang, source, n_chars
                     FROM documents WHERE doc_id % 13 <> 5
                     UNION ALL
                     SELECT doc_id + 1000000000, text, lang, source, n_chars
                     FROM documents WHERE doc_id % 17 = 2),
              j AS (SELECT coalesce(v2.lang, v1.lang) AS lang,
                      CASE WHEN v1.doc_id IS NULL THEN 'added'
                           WHEN v2.doc_id IS NULL THEN 'removed'
                           WHEN v1.text IS NOT DISTINCT FROM v2.text
                            AND v1.lang IS NOT DISTINCT FROM v2.lang
                            AND v1.source IS NOT DISTINCT FROM v2.source
                            AND v1.n_chars IS NOT DISTINCT FROM v2.n_chars
                           THEN 'unchanged'
                           ELSE 'changed' END AS status
                    FROM documents v1 FULL OUTER JOIN v2
                      ON v1.doc_id = v2.doc_id)
         SELECT lang, status, COUNT(*) AS n_rows
         FROM j GROUP BY 1, 2 ORDER BY lang, status""",
    "q158_kmv_overlap" ->
      // the sketch replayed minimum-for-minimum: same normalization and
      // side split as q96, same rolling-31-mod-999999937 fold (q155's
      // list_reduce idiom), same Knuth spread mod 2^32, same bottom-128
      // order statistics, estimator (k-1)*2^32 // h_k with the exact-below-k
      // escape, Jaccard = common-in-union-sketch / |union sketch| in ppm
      """WITH src AS (SELECT doc_id,
                        regexp_replace(lower(trim(text)), '[ \t\n\f\r]+', ' ', 'g')
                          AS t,
                        CAST(regexp_extract(source, '(\d+)', 1) AS INT) AS sn
                      FROM documents),
              ha AS (SELECT DISTINCT CASE WHEN len(t) = 0 THEN 0 ELSE
                       (list_reduce([ascii(t[i])
                                     for i in range(1, len(t) + 1)],
                                    (a, b) -> (CAST(a AS BIGINT) * 31 + b)
                                              % 999999937)
                        * 2654435761) % 4294967296 END AS h
                     FROM src WHERE sn % 2 = 0),
              hb AS (SELECT DISTINCT CASE WHEN len(t) = 0 THEN 0 ELSE
                       (list_reduce([ascii(t[i])
                                     for i in range(1, len(t) + 1)],
                                    (a, b) -> (CAST(a AS BIGINT) * 31 + b)
                                              % 999999937)
                        * 2654435761) % 4294967296 END AS h
                     FROM (SELECT t FROM src WHERE sn % 2 = 1
                           UNION ALL
                           SELECT t FROM src WHERE sn % 2 = 0
                                               AND doc_id < 60)),
              kka AS (SELECT h FROM ha ORDER BY h LIMIT 128),
              kkb AS (SELECT h FROM hb ORDER BY h LIMIT 128),
              kku AS (SELECT h
                      FROM (SELECT h FROM kka UNION SELECT h FROM kkb)
                      ORDER BY h LIMIT 128),
              st AS (SELECT
                (SELECT COUNT(*) FROM kka) AS n_a,
                (SELECT MAX(h) FROM kka) AS kth_a,
                (SELECT COUNT(*) FROM kkb) AS n_b,
                (SELECT MAX(h) FROM kkb) AS kth_b,
                (SELECT COUNT(*) FROM kku) AS n_u,
                (SELECT MAX(h) FROM kku) AS kth_u,
                (SELECT COUNT(*) FROM kku
                 WHERE h IN (SELECT h FROM kka)
                   AND h IN (SELECT h FROM kkb)) AS n_common)
         SELECT CAST(128 AS BIGINT) AS k,
                CAST(n_a AS BIGINT) AS n_a,
                CAST(kth_a AS BIGINT) AS kth_a,
                CAST(CASE WHEN n_a < 128 THEN n_a
                     ELSE (127 * 4294967296) // kth_a END AS BIGINT) AS est_a,
                CAST(n_b AS BIGINT) AS n_b,
                CAST(kth_b AS BIGINT) AS kth_b,
                CAST(CASE WHEN n_b < 128 THEN n_b
                     ELSE (127 * 4294967296) // kth_b END AS BIGINT) AS est_b,
                CAST(n_u AS BIGINT) AS n_u,
                CAST(kth_u AS BIGINT) AS kth_u,
                CAST(CASE WHEN n_u < 128 THEN n_u
                     ELSE (127 * 4294967296) // kth_u END AS BIGINT) AS est_u,
                CAST(n_common AS BIGINT) AS n_common_k,
                CAST((1000000 * n_common) // n_u AS BIGINT) AS jaccard_ppm
         FROM st""",
    "q159_dsir_selection" ->
      // both bag models, the floor-quantized per-bucket log weights and
      // the per-doc integer scores replayed exactly: same space-run
      // tokens, same kmv_key bucket hash, same add-one smoothing over
      // 512 buckets, same FLOOR(ln * 1e9) nanos
      """WITH toks AS (SELECT doc_id, lang, lang = 'en' AS tgt,
                         unnest(string_split_regex(trim(text), ' +'))
                           AS token
                       FROM documents),
              tb AS (SELECT doc_id, lang, tgt,
                       ((list_reduce([ascii(token[i])
                                      for i in range(1, len(token) + 1)],
                                     (a, b) -> (CAST(a AS BIGINT) * 31 + b)
                                               % 999999937)
                         * 2654435761) % 4294967296) % 512 AS bucket
                     FROM toks WHERE length(token) > 0),
              cnts AS (SELECT bucket, COUNT(*) AS cr,
                         SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS ct
                       FROM tb GROUP BY 1),
              tot AS (SELECT SUM(cr) AS nr, SUM(ct) AS nt FROM cnts),
              w AS (SELECT bucket,
                      CAST(FLOOR(ln(CAST(ct + 1 AS DOUBLE)
                                    / CAST(nt + 512 AS DOUBLE)) * 1e9)
                           AS BIGINT)
                    - CAST(FLOOR(ln(CAST(cr + 1 AS DOUBLE)
                                    / CAST(nr + 512 AS DOUBLE)) * 1e9)
                           AS BIGINT) AS wn
                    FROM cnts, tot),
              tf AS (SELECT doc_id, lang, bucket, COUNT(*) AS tf
                     FROM tb GROUP BY 1, 2, 3),
              sc AS (SELECT doc_id, lang,
                       CAST(SUM(tf) AS BIGINT) AS n_tokens,
                       CAST(SUM(tf * wn) AS BIGINT) AS logw_nanos
                     FROM tf JOIN w USING (bucket) GROUP BY 1, 2)
         SELECT doc_id, lang, n_tokens, logw_nanos
         FROM sc ORDER BY logw_nanos DESC, doc_id LIMIT 25""",
    "q160_mad_anomaly" ->
      // the robust gate replayed statistic-for-statistic: same doubled
      // integer cents, interpolated medians over even integers are exact
      // integers, MAD at worst half-integer, verdict 2*d2 > 7*mad2
      """WITH ev AS (SELECT event_type,
                       CAST(round(value * 100) AS BIGINT) AS cents
                     FROM events),
              m1 AS (SELECT event_type, COUNT(*) AS n_events,
                       median(2 * cents) AS med2
                     FROM ev GROUP BY 1),
              d AS (SELECT e.event_type, n_events, med2,
                      ABS(2 * cents - med2) AS d2
                    FROM ev e JOIN m1 USING (event_type)),
              m2 AS (SELECT event_type, median(d2) AS mad2
                     FROM d GROUP BY 1)
         SELECT d.event_type,
                CAST(MAX(n_events) AS BIGINT) AS n_events,
                CAST(MAX(med2) AS BIGINT) AS median_x2,
                CAST(MAX(mad2 * 2) AS BIGINT) AS mad_x4,
                CAST(SUM(CASE WHEN 2 * d2 > 7 * mad2 THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_outliers
         FROM d JOIN m2 USING (event_type)
         GROUP BY 1 ORDER BY event_type""",
    "q161_quality_budget" ->
      // margins via the q155 fold, token counts via the q114 contract,
      // then the same (margin DESC, doc_id) per-lang running sum and
      // inclusive 8192-token prefix cut
      """WITH tk AS (SELECT doc_id, lang,
                       CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                            ELSE len(string_split_regex(trim(text), ' +'))
                            END AS BIGINT) AS nt,
                       [x for x in string_split_regex(trim(text), ' +')
                        if length(x) > 0] AS toks
                     FROM documents),
              g AS (SELECT doc_id, lang, nt, list_concat(toks,
                      [toks[i] || ' ' || toks[i+1]
                       for i in range(1, len(toks))]) AS grams
                    FROM tk),
              m AS (SELECT doc_id, lang, nt, CAST(coalesce(list_sum([
                      (list_reduce([ascii(gm[i])
                                    for i in range(1, len(gm) + 1)],
                                   (a, b) -> (a * 31 + b) % 1000003)
                       % 2001) - 1000
                      for gm in grams]), 0) AS BIGINT) AS margin
                    FROM g),
              sel AS (SELECT lang, doc_id, nt, margin,
                        SUM(nt) OVER (PARTITION BY lang
                                      ORDER BY margin DESC, doc_id
                                      ROWS UNBOUNDED PRECEDING) AS cum
                      FROM m)
         SELECT lang, COUNT(*) AS n_docs,
                CAST(SUM(nt) AS BIGINT) AS tokens,
                CAST(MIN(margin) AS BIGINT) AS cutoff_margin,
                CAST(MAX(doc_id) AS BIGINT) AS max_doc_id
         FROM sel WHERE cum <= 8192 GROUP BY 1 ORDER BY lang""",
    "q162_template_canon" ->
      // families via md5 over the 8-token opening prefix, margins via the
      // q155 fold, canonical pick replayed as the (margin DESC, doc_id)
      // rank-1 row per family of size >= 2
      """WITH tk AS (SELECT doc_id,
                       md5(array_to_string(
                             string_split_regex(trim(text), ' +')[1:8], ' '))
                         AS family_key,
                       [x for x in string_split_regex(trim(text), ' +')
                        if length(x) > 0] AS toks
                     FROM documents),
              g AS (SELECT doc_id, family_key, list_concat(toks,
                      [toks[i] || ' ' || toks[i+1]
                       for i in range(1, len(toks))]) AS grams
                    FROM tk),
              m AS (SELECT doc_id, family_key, CAST(coalesce(list_sum([
                      (list_reduce([ascii(gm[i])
                                    for i in range(1, len(gm) + 1)],
                                   (a, b) -> (a * 31 + b) % 1000003)
                       % 2001) - 1000
                      for gm in grams]), 0) AS BIGINT) AS margin
                    FROM g),
              r AS (SELECT family_key, doc_id, margin,
                      COUNT(*) OVER (PARTITION BY family_key) AS n_members,
                      ROW_NUMBER() OVER (PARTITION BY family_key
                                         ORDER BY margin DESC, doc_id) AS rk
                    FROM m)
         SELECT family_key, CAST(n_members AS BIGINT) AS n_members,
                doc_id AS kept_id, margin AS kept_score,
                CAST(n_members - 1 AS BIGINT) AS n_dropped
         FROM r WHERE rk = 1 AND n_members > 1 ORDER BY kept_id""",
    "q163_epoch_expand" ->
      // copy counts replayed through the same floor + Knuth-gate formula
      // (dyadic fractions make rate*2^32 exact), epochs unnested 1..n
      """WITH d AS (SELECT doc_id, lang,
                      CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                           ELSE len(string_split_regex(trim(text), ' +'))
                           END AS BIGINT) AS nt,
                      CASE lang WHEN 'en' THEN 2.5 WHEN 'de' THEN 1.25
                                WHEN 'fr' THEN 1.5 WHEN 'es' THEN 1.0
                                ELSE 0.75 END AS f
                    FROM documents),
              c AS (SELECT doc_id, lang, nt,
                      CAST(FLOOR(f) AS BIGINT)
                      + CASE WHEN (doc_id * 2654435761) % 4294967296 <
                               CAST((f - FLOOR(f)) * 4294967296 AS BIGINT)
                             THEN 1 ELSE 0 END AS n
                    FROM d),
              e AS (SELECT lang, nt, unnest(range(1, n + 1)) AS epoch
                    FROM c WHERE n > 0)
         SELECT lang, CAST(epoch AS BIGINT) AS epoch, COUNT(*) AS n_docs,
                CAST(SUM(nt) AS BIGINT) AS tokens
         FROM e GROUP BY 1, 2 ORDER BY lang, epoch""",
    // --- planted-subset gate oracles: pure closed-form arithmetic over
    //     the Planted construction (graft.Planted scaladoc reproduces the
    //     derivations); no table scan, affordable at every scale ---
    "q140_planted_neardup_pairs" ->
      // near groups g (size 2+g%3): member m>=1 appends ONE token to the
      // 30-token base -> 3-gram jaccard 28/29 vs member 0, 28/30 between
      // non-base members; exact pairs e in 40..47 at jaccard 1.0
      """WITH sizes AS (SELECT g, 2 + g % 3 AS k FROM range(40) t(g)),
              m AS (SELECT g, m1.m AS m1, m2.m AS m2
                    FROM sizes, range(4) m1(m), range(4) m2(m)
                    WHERE m1.m < m2.m AND m2.m < k),
              near AS (SELECT 900000000 + g*10 + m1 AS id1,
                         900000000 + g*10 + m2 AS id2,
                         CAST(28 AS DOUBLE) /
                           (CASE WHEN m1 = 0 THEN 29 ELSE 30 END) AS jaccard
                       FROM m),
              exact AS (SELECT 900000000 + e*10 AS id1,
                          900000000 + e*10 + 1 AS id2,
                          CAST(1.0 AS DOUBLE) AS jaccard
                        FROM range(40, 48) t(e))
         SELECT CAST(id1 AS BIGINT) AS id1, CAST(id2 AS BIGINT) AS id2, jaccard
         FROM (SELECT * FROM near UNION ALL SELECT * FROM exact)
         ORDER BY id1, id2""",
    "q141_planted_components" ->
      // every near-group/exact-pair member labels to its group's base id;
      // singletons are in no pair and must be absent
      """WITH members AS (
           SELECT 900000000 + g*10 + m AS doc_id,
                  900000000 + g*10 AS canonical_id
           FROM range(40) t(g), range(4) mm(m) WHERE m < 2 + g % 3
           UNION ALL
           SELECT 900000000 + e*10 + m, 900000000 + e*10
           FROM range(40, 48) t(e), range(2) mm(m))
         SELECT CAST(doc_id AS BIGINT) AS doc_id,
                CAST(canonical_id AS BIGINT) AS canonical_id
         FROM members ORDER BY doc_id""",
    "q142_planted_component_histogram" ->
      // sizes 2+g%3 over g in 0..39 -> 14/13/13 groups of size 2/3/4;
      // + 8 exact pairs in bucket 2; + 10 singletons in bucket 1
      """SELECT CAST(size AS BIGINT) AS size,
                CAST(n_clusters AS BIGINT) AS n_clusters
         FROM (VALUES (1, 10), (2, 22), (3, 13), (4, 13)) v(size, n_clusters)
         ORDER BY size""",
    "q143_planted_dedup_chain" ->
      // kept docs: 40 group canonicals (30 tokens) + 8 exact-pair
      // canonicals (12 tokens) + 10 singletons (10+j tokens, j=0..9)
      // -> 58 docs, 40*30 + 8*12 + 145 = 1441 tokens
      """SELECT 'planted' AS lang, CAST(58 AS BIGINT) AS n_docs,
                CAST(1441 AS BIGINT) AS total_tokens""",
    // the staged variant must land on the identical planted stats
    "q144_planted_dedup_staged" ->
      """SELECT 'planted' AS lang, CAST(58 AS BIGINT) AS n_docs,
                CAST(1441 AS BIGINT) AS total_tokens""",
    "q145_planted_prefix_join" ->
      // word-5-gram shingles: 26 base; member m>=1 adds one -> inter 26,
      // union 27 (vs member 0) or 28 (between non-base members), all
      // above the 4/5 threshold; exact pairs at 8/8
      """WITH sizes AS (SELECT g, 2 + g % 3 AS k FROM range(40) t(g)),
              m AS (SELECT g, m1.m AS m1, m2.m AS m2
                    FROM sizes, range(4) m1(m), range(4) m2(m)
                    WHERE m1.m < m2.m AND m2.m < k),
              near AS (SELECT 900000000 + g*10 + m1 AS id1,
                         900000000 + g*10 + m2 AS id2, 26 AS inter_size,
                         CASE WHEN m1 = 0 THEN 27 ELSE 28 END AS union_size
                       FROM m),
              exact AS (SELECT 900000000 + e*10 AS id1,
                          900000000 + e*10 + 1 AS id2, 8, 8
                        FROM range(40, 48) t(e))
         SELECT CAST(id1 AS BIGINT) AS id1, CAST(id2 AS BIGINT) AS id2,
                CAST(inter_size AS BIGINT) AS inter_size,
                CAST(union_size AS BIGINT) AS union_size
         FROM (SELECT * FROM near UNION ALL SELECT * FROM exact)
         ORDER BY id1, id2""",
    "q149_bpe_merges" -> bpeOracleSql(8),
    "q150_bpe_encode" -> bpeEncodeOracleSql(8),
    "q152_temperature_mix" ->
      // same sqrt-share rates (correctly-rounded IEEE ops both sides),
      // same Knuth keep-gate, floor() mirroring Spark's truncating cast
      """WITH c AS (SELECT lang, COUNT(*) AS c FROM documents GROUP BY 1),
              n AS (SELECT SUM(c) AS n FROM c),
              r AS (SELECT lang,
                      sqrt(CAST(c AS DOUBLE) / CAST(n.n AS DOUBLE)) AS s
                    FROM c, n),
              mx AS (SELECT MAX(s) AS mx FROM r),
              rates AS (SELECT lang, s / mx.mx AS rate FROM r, mx),
              kept AS (SELECT d.doc_id, d.lang, d.text
                       FROM documents d JOIN rates USING (lang)
                       WHERE (d.doc_id * 2654435761) % 4294967296 <
                             CAST(floor(rate * 4294967296.0) AS BIGINT))
         SELECT lang, COUNT(*) AS n_docs,
                CAST(SUM(CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                              ELSE len(string_split_regex(trim(text), ' +'))
                              END AS BIGINT)) AS BIGINT) AS total_tokens
         FROM kept GROUP BY 1 ORDER BY lang""",
    "q153_corpus_build" ->
      // the full five-stage composition in one SQL statement: q152's mix
      // CTEs -> q68's dedup-chain CTEs (over the mixed corpus) -> q80's
      // 8-gram decontamination (eval side = pristine corpus) -> q70's
      // packing -> q117's card, with every stage count surfaced. The
      // pairs CTE is the quadratic near-dup scan — affordable at the gate
      // scales, TIMEOUT at sf1 where q154's planted companion covers it.
      """WITH RECURSIVE
            c AS (SELECT lang, COUNT(*) AS c FROM documents GROUP BY 1),
            n AS (SELECT SUM(c) AS n FROM c),
            r AS (SELECT lang,
                    sqrt(CAST(c AS DOUBLE) / CAST(n.n AS DOUBLE)) AS s
                  FROM c, n),
            mx AS (SELECT MAX(s) AS mx FROM r),
            rates AS (SELECT lang, s / mx.mx AS rate FROM r, mx),
            mixed AS (SELECT d.* FROM documents d JOIN rates USING (lang)
                      WHERE (d.doc_id * 2654435761) % 4294967296 <
                            CAST(floor(rate * 4294967296.0) AS BIGINT)),
            kept AS (SELECT * FROM mixed
                     WHERE doc_id IN (SELECT MIN(doc_id) FROM mixed
                                      GROUP BY md5(text))),
            toks AS (SELECT doc_id, string_split_regex(trim(text), ' +') AS tk
                     FROM kept),
            sh AS (SELECT doc_id,
                     CASE WHEN len(tk) >= 3
                          THEN list_distinct([array_to_string(tk[i:i+2], ' ')
                                              for i in range(1, len(tk) - 1)])
                          ELSE [array_to_string(tk, ' ')] END AS shingles
                   FROM toks),
            prs AS (SELECT a.doc_id AS id1, b.doc_id AS id2
                    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
                    WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
                        / CAST(len(list_distinct(list_concat(a.shingles, b.shingles)))
                               AS DOUBLE) >= 0.3),
            edges AS (SELECT id1 AS s, id2 AS d FROM prs
                      UNION SELECT id2, id1 FROM prs),
            walk(id, reach) AS (
              SELECT s, d FROM edges
              UNION
              SELECT w.id, e.d FROM walk w JOIN edges e ON w.reach = e.s),
            losers AS (SELECT id FROM walk GROUP BY id
                       HAVING LEAST(id, MIN(reach)) <> id),
            cleaned AS (SELECT * FROM kept
                        WHERE doc_id NOT IN (SELECT id FROM losers)),
            evt AS (SELECT string_split_regex(trim(text), ' +') AS tk
                    FROM documents WHERE doc_id < 50),
            ev AS (SELECT DISTINCT unnest(CASE WHEN len(tk) >= 8
                     THEN [array_to_string(tk[i:i+7], ' ')
                           for i in range(1, len(tk) - 6)]
                     ELSE [array_to_string(tk, ' ')] END) AS gram FROM evt),
            trt AS (SELECT doc_id, string_split_regex(trim(text), ' +') AS tk
                    FROM cleaned WHERE doc_id >= 50),
            trg AS (SELECT doc_id, unnest(CASE WHEN len(tk) >= 8
                      THEN [array_to_string(tk[i:i+7], ' ')
                            for i in range(1, len(tk) - 6)]
                      ELSE [array_to_string(tk, ' ')] END) AS gram FROM trt),
            contaminated AS (SELECT DISTINCT trg.doc_id
                             FROM trg JOIN ev ON trg.gram = ev.gram),
            corpus AS (SELECT doc_id, lang, source,
                         CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                              ELSE len(string_split_regex(trim(text), ' +')) END
                           AS BIGINT) AS nt
                       FROM cleaned
                       WHERE doc_id >= 50
                         AND doc_id NOT IN (SELECT doc_id FROM contaminated)),
            cum AS (SELECT lang, nt,
                      SUM(nt) OVER (PARTITION BY lang ORDER BY doc_id
                        ROWS UNBOUNDED PRECEDING) AS cum
                    FROM corpus),
            shardt AS (SELECT lang, CAST((cum - nt) // 4096 AS BIGINT) AS shard,
                         SUM(nt) AS st
                       FROM cum GROUP BY 1, 2),
            shards AS (SELECT COUNT(*) AS n_shards,
                         CAST(MAX(st) AS BIGINT) AS max_shard_tokens
                       FROM shardt)
       SELECT (SELECT COUNT(*) FROM mixed) AS n_mixed,
              (SELECT COUNT(*) FROM kept) AS n_exact,
              (SELECT COUNT(*) FROM cleaned) AS n_clean,
              (SELECT COUNT(*) FROM contaminated) AS n_contaminated,
              (SELECT COUNT(*) FROM corpus) AS n_docs,
              (SELECT COUNT(DISTINCT lang) FROM corpus) AS n_langs,
              (SELECT COUNT(DISTINCT source) FROM corpus) AS n_sources,
              (SELECT CAST(SUM(nt) AS BIGINT) FROM corpus) AS total_tokens,
              (SELECT CAST(MAX(nt) AS BIGINT) FROM corpus) AS max_tokens,
              (SELECT round(CAST(SUM(nt) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
               FROM corpus) AS mean_tokens,
              shards.n_shards, shards.max_shard_tokens
       FROM shards""",
    "q154_planted_corpus_build" ->
      // the construction reproduced literally (q140's discipline): stage
      // verdicts for planted docs are Knuth-hash arithmetic + group
      // structure — exact dedup drops the higher id of an exact pair when
      // both mixed; near-dup components keep each near group's minimum
      // surviving id (all surviving members pair: jaccard >= 28/30);
      // planted vocabulary is disjoint so contamination is structurally 0
      // and no planted doc pairs with an organic one. The planted rate
      // needs only the corpus LANG COUNTS — no quadratic stage anywhere.
      """WITH oc AS (SELECT lang, COUNT(*) AS c FROM documents GROUP BY 1),
            near AS (SELECT 900000000 + g*10 + m AS doc_id, g AS grp,
                       'near' AS kind,
                       CAST(CASE WHEN m = 0 THEN 30 ELSE 31 END AS BIGINT) AS nt
                     FROM range(40) t(g), range(4) mm(m) WHERE m < 2 + g % 3),
            exct AS (SELECT 900000000 + e*10 + m AS doc_id, e AS grp,
                       'exact' AS kind, CAST(12 AS BIGINT) AS nt
                     FROM range(40, 48) t(e), range(2) mm(m)),
            singl AS (SELECT 900000000 + (48 + j)*10 AS doc_id, 48 + j AS grp,
                        'single' AS kind, CAST(10 + j AS BIGINT) AS nt
                      FROM range(10) t(j)),
            planted AS (SELECT * FROM near UNION ALL SELECT * FROM exct
                        UNION ALL SELECT * FROM singl),
            c AS (SELECT * FROM oc
                  UNION ALL SELECT 'planted', (SELECT COUNT(*) FROM planted)),
            n AS (SELECT SUM(c) AS n FROM c),
            r AS (SELECT lang,
                    sqrt(CAST(c AS DOUBLE) / CAST(n.n AS DOUBLE)) AS s
                  FROM c, n),
            mx AS (SELECT MAX(s) AS mx FROM r),
            pr AS (SELECT s / mx.mx AS rate FROM r, mx WHERE lang = 'planted'),
            mixed AS (SELECT p.* FROM planted p, pr
                      WHERE (p.doc_id * 2654435761) % 4294967296 <
                            CAST(floor(pr.rate * 4294967296.0) AS BIGINT)),
            exact_kept AS (SELECT * FROM mixed m
                           WHERE NOT (kind = 'exact' AND doc_id % 10 = 1 AND
                             EXISTS (SELECT 1 FROM mixed m2
                                     WHERE m2.doc_id = m.doc_id - 1))),
            cleaned AS (SELECT * FROM exact_kept e
                        WHERE NOT (kind = 'near' AND
                          EXISTS (SELECT 1 FROM exact_kept e2
                                  WHERE e2.grp = e.grp AND e2.kind = 'near'
                                    AND e2.doc_id < e.doc_id))),
            cum AS (SELECT doc_id, nt,
                      SUM(nt) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
                        AS cum
                    FROM cleaned),
            shardt AS (SELECT CAST((cum - nt) // 4096 AS BIGINT) AS shard,
                         SUM(nt) AS st
                       FROM cum GROUP BY 1),
            shards AS (SELECT COUNT(*) AS n_shards,
                         CAST(MAX(st) AS BIGINT) AS max_shard_tokens
                       FROM shardt)
       SELECT (SELECT COUNT(*) FROM mixed) AS n_mixed,
              (SELECT COUNT(*) FROM exact_kept) AS n_exact,
              (SELECT COUNT(*) FROM cleaned) AS n_clean,
              CAST(0 AS BIGINT) AS n_contaminated,
              (SELECT COUNT(*) FROM cleaned) AS n_docs,
              CAST(1 AS BIGINT) AS n_langs,
              CAST(1 AS BIGINT) AS n_sources,
              (SELECT CAST(SUM(nt) AS BIGINT) FROM cleaned) AS total_tokens,
              (SELECT CAST(MAX(nt) AS BIGINT) FROM cleaned) AS max_tokens,
              (SELECT round(CAST(SUM(nt) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
               FROM cleaned) AS mean_tokens,
              shards.n_shards, shards.max_shard_tokens
       FROM shards""",
    "q155_quality_classifier" ->
      // the scorer replayed gram-for-gram: same space-run tokens, same
      // unigram+bigram features, same rolling-31-mod-1000003 fold (seeded
      // with the first char code — list_reduce semantics), same
      // (h mod 2001) - 1000 integer weights; margins compare exactly
      """WITH t AS (SELECT doc_id, lang,
                      [x for x in string_split_regex(trim(text), ' +')
                       if length(x) > 0] AS tk
                    FROM documents),
              g AS (SELECT doc_id, lang, list_concat(tk,
                      [tk[i] || ' ' || tk[i+1]
                       for i in range(1, len(tk))]) AS grams
                    FROM t),
              m AS (SELECT doc_id, lang, CAST(coalesce(list_sum([
                      (list_reduce([ascii(gm[i])
                                    for i in range(1, len(gm) + 1)],
                                   (a, b) -> (a * 31 + b) % 1000003)
                       % 2001) - 1000
                      for gm in grams]), 0) AS BIGINT) AS margin_units
                    FROM g)
         SELECT doc_id, lang, margin_units, margin_units > 0 AS kept
         FROM m ORDER BY doc_id""",
    "q151_int8_quant" ->
      // codes re-derived with the literally-mirrored quantization
      // expression ((x*127.0)/maxabs, round half away from zero — both
      // engines); integer statistics exact, error bound TRUE-gated
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
              m AS (SELECT vec_id, v,
                      coalesce(list_max([abs(x) for x in v]), 0.0) AS ma
                    FROM e),
              q AS (SELECT vec_id,
                      CASE WHEN ma = 0 THEN [CAST(0 AS INT) for x in v]
                           ELSE [CAST(round(x * 127.0 / ma) AS INT)
                                 for x in v] END AS q
                    FROM m)
         SELECT vec_id, CAST(len(q) AS INT) AS n_dims,
                CAST(list_sum([CAST(x AS BIGINT) for x in q]) AS BIGINT)
                  AS sum_q,
                CAST(list_sum([CAST(q[i] AS BIGINT) * i
                               for i in range(1, len(q) + 1)]) AS BIGINT)
                  AS wsum_q,
                TRUE AS dot0_ok
         FROM q ORDER BY vec_id""",
    "q148_hybrid_rrf" ->
      // both rankings re-derived with q98's exact-micros BM25 arithmetic
      // and q24's cosine ordering, then fused with the SAME integer
      // 1e6 // (60 + rank) contributions — the whole fusion is integer
      """WITH d AS (SELECT doc_id,
                      CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                           ELSE len(string_split_regex(trim(text), ' +')) END
                        AS BIGINT) AS dl,
                      string_split_regex(trim(text), ' +') AS toks
                    FROM documents),
              qt AS (SELECT DISTINCT doc_id AS query_id, tok AS token
                     FROM (SELECT doc_id,
                             unnest([toks[1], toks[3], toks[5], toks[7],
                                     toks[9]]) AS tok
                           FROM d WHERE doc_id < 3)
                     WHERE tok IS NOT NULL AND length(tok) > 0),
              n AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM d),
              t AS (SELECT doc_id, dl, unnest(toks) AS token FROM d),
              tf AS (SELECT qt.query_id, t.doc_id, t.token,
                            COUNT(*) AS tf, MAX(t.dl) AS dl
                     FROM t JOIN qt ON t.token = qt.token
                     GROUP BY 1, 2, 3),
              dfr AS (SELECT query_id, token, COUNT(*) AS df
                      FROM tf GROUP BY 1, 2),
              c AS (SELECT tf.query_id, tf.doc_id,
                      CAST(round(
                        ln(1.0 + (CAST(n.n_docs AS DOUBLE) - CAST(dfr.df AS DOUBLE) + 0.5)
                                 / (CAST(dfr.df AS DOUBLE) + 0.5))
                        * (CAST(tf.tf AS DOUBLE) * 2.2)
                        / (CAST(tf.tf AS DOUBLE)
                           + 1.2 * (0.25 + 0.75 * CAST(tf.dl AS DOUBLE)
                                    / (CAST(n.sum_dl AS DOUBLE) / CAST(n.n_docs AS DOUBLE))))
                        * 1e6) AS BIGINT) AS micros
                    FROM tf JOIN dfr USING (query_id, token), n),
              bm AS (SELECT query_id, doc_id,
                            ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY SUM(micros) DESC, doc_id) AS r
                     FROM c GROUP BY 1, 2 QUALIFY r <= 20),
              e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
              q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 3),
              dn AS (SELECT q.query_id, e.vec_id AS doc_id,
                            ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
                              list_sum([e.v[i] * q.qv[i]
                                        for i in range(1, len(e.v) + 1)])
                                / (sqrt(list_sum([x * x for x in e.v]))
                                   * sqrt(list_sum([x * x for x in q.qv]))) DESC,
                              e.vec_id) AS r
                     FROM e, q WHERE e.vec_id <> q.query_id QUALIFY r <= 20),
              contribs AS (SELECT query_id, doc_id, 1000000 // (60 + r) AS c
                           FROM bm
                           UNION ALL
                           SELECT query_id, doc_id, 1000000 // (60 + r) FROM dn),
              fused AS (SELECT query_id, doc_id, SUM(c) AS rrf_micros,
                               COUNT(*) AS n_lists,
                               ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY SUM(c) DESC, doc_id) AS rank
                        FROM contribs GROUP BY 1, 2 QUALIFY rank <= 10)
         SELECT f.query_id, f.doc_id,
                CAST(bm.r AS INT) AS r_bm25, CAST(dn.r AS INT) AS r_dense,
                CAST(f.rrf_micros AS BIGINT) AS rrf_micros,
                CAST(f.n_lists AS BIGINT) AS n_lists,
                CAST(f.rank AS INT) AS rank
         FROM fused f
         LEFT JOIN bm USING (query_id, doc_id)
         LEFT JOIN dn USING (query_id, doc_id)
         ORDER BY f.query_id, f.rank""",
    "q147_bigstar_components" ->
      // q141's expected rows + the three planted chains, whose canonical
      // is the chain head by construction
      """WITH members AS (
           SELECT 900000000 + g*10 + m AS doc_id,
                  900000000 + g*10 AS canonical_id
           FROM range(40) t(g), range(4) mm(m) WHERE m < 2 + g % 3
           UNION ALL
           SELECT 900000000 + e*10 + m, 900000000 + e*10
           FROM range(40, 48) t(e), range(2) mm(m)
           UNION ALL
           SELECT 910000000 + c*1000 + m, 910000000 + c*1000
           FROM (VALUES (0, 40), (1, 50), (2, 60)) ch(c, len), range(60) mm(m)
           WHERE m < len)
         SELECT CAST(doc_id AS BIGINT) AS doc_id,
                CAST(canonical_id AS BIGINT) AS canonical_id
         FROM members ORDER BY doc_id""",
    "q146_planted_editdist" ->
      // groups p (3 members for even p, 2 for odd): A/B/AB suffixes are
      // pairwise levenshtein 1; tripled 2-digit tags keep cross-group
      // distances >= 2, so exactly the within-group pairs qualify
      """WITH p AS (SELECT p, CASE WHEN p % 2 = 0 THEN 3 ELSE 2 END AS k,
                      'Planted Entity ' ||
                        repeat(lpad(CAST(p AS VARCHAR), 2, '0'), 3) || ' '
                        AS pre
                    FROM range(20) t(p)),
              m AS (SELECT p.p, pre, m1.m AS m1, m2.m AS m2
                    FROM p, range(3) m1(m), range(3) m2(m)
                    WHERE m1.m < m2.m AND m2.m < k),
              named AS (SELECT 900000000 + p*10 + m1 AS id1,
                          900000000 + p*10 + m2 AS id2,
                          pre || CASE m1 WHEN 0 THEN 'A' WHEN 1 THEN 'B'
                                 ELSE 'AB' END AS s1,
                          pre || CASE m2 WHEN 0 THEN 'A' WHEN 1 THEN 'B'
                                 ELSE 'AB' END AS s2
                        FROM m)
         SELECT CAST(id1 AS BIGINT) AS id1, CAST(id2 AS BIGINT) AS id2,
                s1, s2, CAST(1 AS INT) AS dist
         FROM named ORDER BY id1, id2""",
    "q107_event_transitions" ->
      // same per-user (ts, event_id) total order
      """WITH e AS (SELECT user_id, event_id, event_type,
                      CAST(ts AS TIMESTAMP) AS ts
                    FROM events),
              s AS (SELECT event_type,
                      LAG(event_type) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id) AS prev_type
                    FROM e)
         SELECT prev_type, event_type, COUNT(*) AS n_transitions
         FROM s WHERE prev_type IS NOT NULL
         GROUP BY 1, 2 ORDER BY prev_type, event_type""",
    "q112_mmr_retrieval" ->
      // the five greedy stages unrolled (q105's unrolling pattern): exact
      // integer dot products over round(e*1000) quantized vectors; each
      // stage's argmax is (mmr DESC, vec_id) over exact BIGINTs
      """WITH q AS (SELECT [CAST(round(x * 1000) AS BIGINT) for x in embedding] AS qv
                    FROM embeddings WHERE vec_id = 0),
              c0 AS (SELECT vec_id,
                       [CAST(round(x * 1000) AS BIGINT) for x in embedding] AS ev
                     FROM embeddings WHERE vec_id <> 0),
              rel AS (SELECT c0.vec_id, c0.ev,
                        CAST(list_sum([c0.ev[i] * q.qv[i]
                                       for i in range(1, len(c0.ev) + 1)])
                          AS BIGINT) AS rel
                      FROM c0, q),
              top AS (SELECT * FROM rel ORDER BY rel DESC, vec_id LIMIT 20),
              sims AS (SELECT a.vec_id AS ai, b.vec_id AS bi,
                         CAST(list_sum([a.ev[i] * b.ev[i]
                                        for i in range(1, len(a.ev) + 1)])
                           AS BIGINT) AS sim
                       FROM top a JOIN top b ON a.vec_id <> b.vec_id),
              s1 AS (SELECT vec_id, rel, CAST(7 * rel AS BIGINT) AS mmr
                     FROM top ORDER BY mmr DESC, vec_id LIMIT 1),
              p1 AS (SELECT vec_id FROM s1),
              s2 AS (SELECT t.vec_id, t.rel,
                       CAST(7 * t.rel - 3 * MAX(s.sim) AS BIGINT) AS mmr
                     FROM top t JOIN sims s ON s.ai = t.vec_id
                       AND s.bi IN (SELECT vec_id FROM p1)
                     WHERE t.vec_id NOT IN (SELECT vec_id FROM p1)
                     GROUP BY t.vec_id, t.rel
                     ORDER BY mmr DESC, t.vec_id LIMIT 1),
              p2 AS (SELECT vec_id FROM p1 UNION SELECT vec_id FROM s2),
              s3 AS (SELECT t.vec_id, t.rel,
                       CAST(7 * t.rel - 3 * MAX(s.sim) AS BIGINT) AS mmr
                     FROM top t JOIN sims s ON s.ai = t.vec_id
                       AND s.bi IN (SELECT vec_id FROM p2)
                     WHERE t.vec_id NOT IN (SELECT vec_id FROM p2)
                     GROUP BY t.vec_id, t.rel
                     ORDER BY mmr DESC, t.vec_id LIMIT 1),
              p3 AS (SELECT vec_id FROM p2 UNION SELECT vec_id FROM s3),
              s4 AS (SELECT t.vec_id, t.rel,
                       CAST(7 * t.rel - 3 * MAX(s.sim) AS BIGINT) AS mmr
                     FROM top t JOIN sims s ON s.ai = t.vec_id
                       AND s.bi IN (SELECT vec_id FROM p3)
                     WHERE t.vec_id NOT IN (SELECT vec_id FROM p3)
                     GROUP BY t.vec_id, t.rel
                     ORDER BY mmr DESC, t.vec_id LIMIT 1),
              p4 AS (SELECT vec_id FROM p3 UNION SELECT vec_id FROM s4),
              s5 AS (SELECT t.vec_id, t.rel,
                       CAST(7 * t.rel - 3 * MAX(s.sim) AS BIGINT) AS mmr
                     FROM top t JOIN sims s ON s.ai = t.vec_id
                       AND s.bi IN (SELECT vec_id FROM p4)
                     WHERE t.vec_id NOT IN (SELECT vec_id FROM p4)
                     GROUP BY t.vec_id, t.rel
                     ORDER BY mmr DESC, t.vec_id LIMIT 1)
         SELECT CAST(1 AS INTEGER) AS rank, vec_id, rel, mmr AS mmr_score FROM s1
         UNION ALL SELECT CAST(2 AS INTEGER), vec_id, rel, mmr FROM s2
         UNION ALL SELECT CAST(3 AS INTEGER), vec_id, rel, mmr FROM s3
         UNION ALL SELECT CAST(4 AS INTEGER), vec_id, rel, mmr FROM s4
         UNION ALL SELECT CAST(5 AS INTEGER), vec_id, rel, mmr FROM s5
         ORDER BY rank""",
    "q105_pagerank" ->
      // the 5 damped rounds unrolled as plain CTEs (aggregation inside a
      // recursive CTE is disallowed, q65's closure trick doesn't carry a
      // sum): BIGINT // BIGINT mirrors Spark's `div` exactly for the
      // all-positive ranks; the final CAST collapses DuckDB's HUGEINT sums
      """WITH inc AS (SELECT DISTINCT user_id AS u,
                        CASE event_type WHEN 'click' THEN -1 WHEN 'view' THEN -2
                          WHEN 'purchase' THEN -3 WHEN 'signup' THEN -4
                          ELSE -5 END AS t
                      FROM events),
              edges AS (SELECT u AS s, t AS d FROM inc
                        UNION ALL SELECT t, u FROM inc),
              deg AS (SELECT s, COUNT(*) AS dg FROM edges GROUP BY 1),
              nodes AS (SELECT DISTINCT s AS id FROM edges
                        UNION SELECT DISTINCT d FROM edges),
              r0 AS (SELECT id, CAST(1000000 AS BIGINT) AS r FROM nodes),
              c1 AS (SELECT e.d AS id, SUM(r.r // g.dg) AS c FROM edges e
                     JOIN r0 r ON r.id = e.s JOIN deg g ON g.s = e.s GROUP BY 1),
              r1 AS (SELECT n.id,
                       CAST(150000 + (850000 * COALESCE(c.c, 0)) // 1000000
                         AS BIGINT) AS r
                     FROM nodes n LEFT JOIN c1 c ON c.id = n.id),
              c2 AS (SELECT e.d AS id, SUM(r.r // g.dg) AS c FROM edges e
                     JOIN r1 r ON r.id = e.s JOIN deg g ON g.s = e.s GROUP BY 1),
              r2 AS (SELECT n.id,
                       CAST(150000 + (850000 * COALESCE(c.c, 0)) // 1000000
                         AS BIGINT) AS r
                     FROM nodes n LEFT JOIN c2 c ON c.id = n.id),
              c3 AS (SELECT e.d AS id, SUM(r.r // g.dg) AS c FROM edges e
                     JOIN r2 r ON r.id = e.s JOIN deg g ON g.s = e.s GROUP BY 1),
              r3 AS (SELECT n.id,
                       CAST(150000 + (850000 * COALESCE(c.c, 0)) // 1000000
                         AS BIGINT) AS r
                     FROM nodes n LEFT JOIN c3 c ON c.id = n.id),
              c4 AS (SELECT e.d AS id, SUM(r.r // g.dg) AS c FROM edges e
                     JOIN r3 r ON r.id = e.s JOIN deg g ON g.s = e.s GROUP BY 1),
              r4 AS (SELECT n.id,
                       CAST(150000 + (850000 * COALESCE(c.c, 0)) // 1000000
                         AS BIGINT) AS r
                     FROM nodes n LEFT JOIN c4 c ON c.id = n.id),
              c5 AS (SELECT e.d AS id, SUM(r.r // g.dg) AS c FROM edges e
                     JOIN r4 r ON r.id = e.s JOIN deg g ON g.s = e.s GROUP BY 1),
              r5 AS (SELECT n.id,
                       CAST(150000 + (850000 * COALESCE(c.c, 0)) // 1000000
                         AS BIGINT) AS r
                     FROM nodes n LEFT JOIN c5 c ON c.id = n.id)
         SELECT id, r AS rank_millionths FROM r5 ORDER BY id""",
    "q94_event_funnel" ->
      // strict-order first-touch funnel: stage i+1's min-ts is computed
      // against stage i's — the same greedy chain of min-aggregates;
      // conversion is the same exact-long double division
      """WITH s1 AS (SELECT user_id, MIN(ts) AS t FROM events
                     WHERE event_type = 'view' GROUP BY 1),
              s2 AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e
                     JOIN s1 ON e.user_id = s1.user_id
                     WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY 1),
              s3 AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e
                     JOIN s2 ON e.user_id = s2.user_id
                     WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY 1),
              c AS (SELECT 1 AS stage_idx, 'view' AS stage_name,
                           (SELECT COUNT(*) FROM s1) AS n_users
                    UNION ALL SELECT 2, 'click', (SELECT COUNT(*) FROM s2)
                    UNION ALL SELECT 3, 'purchase', (SELECT COUNT(*) FROM s3))
         SELECT stage_idx, stage_name, n_users,
                CASE WHEN (SELECT COUNT(*) FROM s1) = 0 THEN 0.0
                     ELSE CAST(n_users AS DOUBLE)
                            / CAST((SELECT COUNT(*) FROM s1) AS DOUBLE)
                END AS conversion
         FROM c ORDER BY stage_idx""",
    "q95_pq_ann" ->
      // recall-floor oracle, same shape as q27: every query's PQ top-10
      // must recover >= 6/10 of the exact cosine top-10
      """SELECT vec_id AS query_id, TRUE AS meets_floor
         FROM embeddings WHERE vec_id < 5 ORDER BY vec_id""",
    "q96_corpus_overlap" ->
      // exact set sizes + Jaccard from the oracle's own normalization of
      // the same constructed corpora; the MinHash estimate is
      // engine-internal and gated by the deterministic ±0.1 band
      """WITH src AS (SELECT doc_id, text,
                        CAST(regexp_extract(source, '(\d+)', 1) AS INT) AS sn
                      FROM documents),
              a AS (SELECT DISTINCT
                      regexp_replace(lower(trim(text)), '[ \t\n\f\r]+', ' ', 'g') AS t
                    FROM src WHERE sn % 2 = 0),
              braw AS (SELECT text FROM src WHERE sn % 2 = 1
                       UNION ALL
                       SELECT text FROM src WHERE sn % 2 = 0 AND doc_id < 60),
              b AS (SELECT DISTINCT
                      regexp_replace(lower(trim(text)), '[ \t\n\f\r]+', ' ', 'g') AS t
                    FROM braw),
              c AS (SELECT (SELECT COUNT(*) FROM a) AS n_a,
                           (SELECT COUNT(*) FROM b) AS n_b,
                           (SELECT COUNT(*) FROM a JOIN b USING (t)) AS n_common)
         SELECT n_a, n_b, n_common,
                CAST(n_common AS DOUBLE)
                  / CAST(n_a + n_b - n_common AS DOUBLE) AS j_exact,
                TRUE AS est_in_band
         FROM c""",
    "q97_containment_dedup" ->
      // same list machinery as q26 over the truncation-planted corpus;
      // containment divides by |grams(id1)| instead of the union size.
      // FLOOR before the INT cast (DuckDB CAST rounds; Spark truncates)
      """WITH corpus AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 2000000,
                  substr(text, 1, CAST(FLOOR(n_chars * 0.4) AS INT))
           FROM documents WHERE doc_id < 20),
           n AS (SELECT doc_id,
                        regexp_replace(lower(trim(text)), '[ \t\n\f\r]+', ' ', 'g') AS t
                 FROM corpus),
           g AS (SELECT doc_id,
                        CASE WHEN len(t) >= 3
                             THEN list_distinct([t[i:i+2] for i in range(1, len(t) - 1)])
                             ELSE [t] END AS grams
                 FROM n),
           pairs AS (SELECT doc_id + 2000000 AS id1, doc_id AS id2
                     FROM documents WHERE doc_id < 20
                     UNION ALL
                     SELECT doc_id, doc_id + 1
                     FROM documents WHERE doc_id >= 20 AND doc_id < 40)
         SELECT p.id1, p.id2,
                CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                  / CAST(len(list_distinct(list_concat(a.grams, b.grams))) AS DOUBLE)
                  AS ngram_jaccard,
                CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                  / CAST(len(a.grams) AS DOUBLE) AS containment_1_in_2,
                (CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                  / CAST(len(a.grams) AS DOUBLE)) >= 1.0 AS is_contained
         FROM pairs p JOIN g a ON a.doc_id = p.id1 JOIN g b ON b.doc_id = p.id2
         ORDER BY p.id1""",
    "q98_bm25_retrieval" ->
      // same formula op-for-op (constants written as the SAME decimal
      // literals both sides — 2.2, 1.2, 0.25, 0.75 — never re-derived as
      // k1+1, whose float sum differs from the literal); per-term 6dp
      // rounding into integer micro-units before the per-doc sum, so the
      // only order-sensitive reduction is exact
      """WITH d AS (SELECT doc_id,
                      CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                           ELSE len(string_split_regex(trim(text), ' +')) END
                        AS BIGINT) AS dl,
                      string_split_regex(trim(text), ' +') AS toks
                    FROM documents),
              n AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM d),
              t AS (SELECT doc_id, dl, unnest(toks) AS token FROM d),
              tf AS (SELECT doc_id, token, COUNT(*) AS tf, MAX(dl) AS dl
                     FROM t WHERE token IN ('data','hash','join','scan','vector')
                     GROUP BY 1, 2),
              df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
              c AS (SELECT tf.doc_id,
                      CAST(round(
                        ln(1.0 + (CAST(n.n_docs AS DOUBLE) - CAST(df.df AS DOUBLE) + 0.5)
                                 / (CAST(df.df AS DOUBLE) + 0.5))
                        * (CAST(tf.tf AS DOUBLE) * 2.2)
                        / (CAST(tf.tf AS DOUBLE)
                           + 1.2 * (0.25 + 0.75 * CAST(tf.dl AS DOUBLE)
                                    / (CAST(n.sum_dl AS DOUBLE) / CAST(n.n_docs AS DOUBLE))))
                        * 1e6) AS BIGINT) AS micros
                    FROM tf JOIN df USING (token), n),
              agg AS (SELECT doc_id, SUM(micros) AS score_micros,
                             COUNT(*) AS n_terms
                      FROM c GROUP BY 1
                      ORDER BY score_micros DESC, doc_id LIMIT 10)
         SELECT doc_id, CAST(score_micros AS DOUBLE) / 1e6 AS score, n_terms,
                CAST(ROW_NUMBER() OVER (ORDER BY score_micros DESC, doc_id)
                  AS INTEGER) AS rank
         FROM agg ORDER BY rank""",
    "q106_vocab_coverage" ->
      // same (cnt DESC, token) total order on both sides; SUM/COUNT cast
      // back to BIGINT from DuckDB's HUGEINT
      """WITH t AS (SELECT unnest(string_split_regex(trim(text), ' +')) AS token
                    FROM documents),
              tk AS (SELECT token FROM t WHERE length(token) > 0),
              c AS (SELECT token, COUNT(*) AS cnt FROM tk GROUP BY 1),
              tt AS (SELECT COUNT(*) AS total FROM tk),
              r AS (SELECT token, cnt,
                      ROW_NUMBER() OVER (ORDER BY cnt DESC, token) AS rk
                    FROM c),
              k AS (SELECT unnest([5, 15, 1000]) AS k)
         SELECT k.k, CAST(SUM(r.cnt) AS BIGINT) AS covered_tokens,
                CAST(tt.total AS BIGINT) AS total_tokens,
                round(CAST(SUM(r.cnt) AS DOUBLE) / CAST(tt.total AS DOUBLE), 6)
                  AS coverage
         FROM k JOIN r ON r.rk <= k.k CROSS JOIN tt
         GROUP BY k.k, tt.total ORDER BY k.k""",
    "q103_quantile_buckets" ->
      // totals are exact; the sketch boundaries are engine-internal, so
      // the oracle pins the balance/monotonicity contract to TRUE (q45's
      // band-gate pattern) — a broken sketch or assignment shows up as a
      // FALSE row, not a silent pass
      """SELECT lang, COUNT(*) AS n_docs, TRUE AS balanced, TRUE AS monotone
         FROM documents GROUP BY 1 ORDER BY lang""",
    "q101_length_buckets" ->
      // same integer CASE ladder; SUM stays BIGINT via explicit casts
      """WITH d AS (SELECT lang,
                      CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                           ELSE len(string_split_regex(trim(text), ' +')) END
                        AS BIGINT) AS nt
                    FROM documents),
              b AS (SELECT lang, nt,
                      CASE WHEN nt <= 32 THEN 32 WHEN nt <= 64 THEN 64
                           WHEN nt <= 128 THEN 128 WHEN nt <= 256 THEN 256
                           WHEN nt <= 512 THEN 512 WHEN nt <= 1024 THEN 1024
                           WHEN nt <= 2048 THEN 2048 WHEN nt <= 4096 THEN 4096
                           ELSE 8192 END AS cap
                    FROM d WHERE nt > 0)
         SELECT lang, CAST(cap AS BIGINT) AS cap, COUNT(*) AS n_docs,
                CAST(SUM(nt) AS BIGINT) AS sum_tokens,
                CAST(cap * COUNT(*) - SUM(nt) AS BIGINT) AS padding,
                round(CAST(cap * COUNT(*) - SUM(nt) AS DOUBLE)
                      / CAST(cap * COUNT(*) AS DOUBLE), 6) AS waste_pct
         FROM b GROUP BY lang, cap ORDER BY lang, cap""",
    "q99_span_dedup" ->
      // gram-STRING ground truth for the hash-side engine path (q80's
      // machinery + the same whole-text fallback for sub-8-token docs);
      // identical planted spans on both sides
      """WITH p AS (SELECT doc_id, lang,
                      CASE WHEN doc_id % 10 = 3
                           THEN text || ' zq0 zq1 zq2 zq3 zq4 zq5 zq6 zq7 zq8 zq9'
                           WHEN doc_id % 10 = 7
                           THEN text || ' zw' || CAST(doc_id AS VARCHAR)
                                || ' zub zuc zud zue zuf zug zuh'
                           ELSE text END AS ptext
                    FROM documents),
              toks AS (SELECT doc_id, lang,
                         string_split_regex(trim(ptext), ' +') AS tk
                       FROM p),
              g AS (SELECT doc_id, lang,
                      CASE WHEN len(tk) >= 8
                           THEN list_distinct([array_to_string(tk[i:i+7], ' ')
                                               for i in range(1, len(tk) - 6)])
                           ELSE [array_to_string(tk, ' ')] END AS grams
                    FROM toks),
              dg AS (SELECT doc_id, lang, unnest(grams) AS gram FROM g),
              dup AS (SELECT gram FROM dg
                      GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2),
              hits AS (SELECT dg.doc_id, dg.lang, dg.gram
                       FROM dg JOIN dup USING (gram)),
              t AS (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY 1),
              f AS (SELECT lang, COUNT(DISTINCT doc_id) AS n_flagged
                    FROM hits GROUP BY 1),
              gg AS (SELECT lang, COUNT(DISTINCT gram) AS n_dup_grams
                     FROM hits GROUP BY 1)
         SELECT t.lang, t.n_docs, COALESCE(f.n_flagged, 0) AS n_flagged,
                COALESCE(gg.n_dup_grams, 0) AS n_dup_grams
         FROM t LEFT JOIN f ON t.lang = f.lang
                LEFT JOIN gg ON gg.lang = t.lang
         ORDER BY t.lang""",
    "q84_anomaly_zscore" ->
      // moments from exact integers (BIGINT cents sum, HUGEINT square sum)
      // → identical doubles → identical 3-sigma verdicts; formula mirrored
      // op-for-op including association order
      """WITH ev AS (SELECT event_type,
                       CAST(round(value * 100) AS BIGINT) AS cents
                     FROM events),
              st AS (SELECT event_type, COUNT(*) AS n,
                       SUM(cents) AS s,
                       SUM(CAST(cents AS HUGEINT) * cents) AS sq
                     FROM ev GROUP BY 1),
              m AS (SELECT event_type, n,
                      CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
                      (CAST(sq AS DOUBLE)
                        - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                        / CAST(n AS DOUBLE) AS variance
                    FROM st)
         SELECT event_type, COUNT(*) AS n_events,
                CAST(SUM(CASE WHEN abs(CAST(cents AS DOUBLE) - mean)
                                   > 3.0 * sqrt(variance)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
                round(MAX(mean), 6) AS mean_cents
         FROM ev JOIN m USING (event_type)
         GROUP BY 1 ORDER BY event_type""",
    "q82_tfidf" ->
      // same formula op-for-op (tf * ln(N/df)), rounded to 6dp before the
      // rank on both sides; ln() vs Math.log agree well inside 6dp
      """WITH toks AS (SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS token
                       FROM documents),
              t AS (SELECT doc_id, token FROM toks WHERE length(token) > 0),
              tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM t GROUP BY 1, 2),
              df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM t GROUP BY 1),
              n AS (SELECT COUNT(*) AS n_total FROM documents),
              scored AS (SELECT tf.doc_id, tf.token, tf.tf, df.df,
                           round(CAST(tf.tf AS DOUBLE)
                             * ln(CAST(n.n_total AS DOUBLE) / CAST(df.df AS DOUBLE)),
                             6) AS tfidf
                         FROM tf JOIN df USING (token), n
                         WHERE tf.doc_id < 20),
              rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                              ORDER BY tfidf DESC, token) AS rk
                     FROM scored)
         SELECT doc_id, token, tf, df, tfidf, CAST(rk AS INTEGER) AS rank
         FROM rk WHERE rk <= 3 ORDER BY doc_id, rank""",
    "q83_doc_chunking" ->
      // closed form: only the last chunk truncates, so the exploded chunk-
      // length sum collapses to nt + 32*(n_chunks-1); the negative-numerator
      // '//' (floor) vs 'div' (truncate) divergence is clamped by GREATEST
      """WITH d AS (SELECT lang, doc_id,
                      CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                           ELSE len(string_split_regex(trim(text), ' +')) END
                        AS BIGINT) AS nt
                    FROM documents),
              c AS (SELECT lang, doc_id, nt,
                      1 + GREATEST(0, (nt - 256 + 223) // 224) AS n_chunks
                    FROM d WHERE nt > 0)
         SELECT lang, COUNT(*) AS n_docs,
                CAST(SUM(n_chunks) AS BIGINT) AS n_chunks,
                CAST(SUM(nt + 32 * (n_chunks - 1)) AS BIGINT) AS sum_chunk_tokens
         FROM c GROUP BY 1 ORDER BY lang""",
    "q88_stratified_take" ->
      // smallest hash first == largest negated score; the hash is bijective
      // mod 2^32 so ties are impossible at this corpus's ids, but the
      // doc_id tiebreak is stated anyway so the pick stays total-ordered
      // (and engine-agreeing) even for id spaces past 2^32 where hv aliases
      """WITH h AS (SELECT doc_id, lang,
                      (doc_id * 2654435761) % 4294967296 AS hv
                    FROM documents)
         SELECT doc_id, lang, CAST(rk AS INTEGER) AS rank
         FROM (SELECT doc_id, lang,
                      ROW_NUMBER() OVER (PARTITION BY lang ORDER BY hv, doc_id) AS rk
               FROM h) t
         WHERE rk <= 10 ORDER BY lang, rank""",
    "q56_bpe_tokens" ->
      """SELECT doc_id,
                CAST(len(regexp_extract_all(text,
                  ' ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+')) AS INTEGER)
                  AS n_bpe_tokens
         FROM documents ORDER BY doc_id""",
    "q55_cosine_neardups" ->
      // brute-force all-pairs ground truth over the same planted-copy corpus
      // (LSH only generates candidates; the output gate is the exact cosine,
      // rounded to 6 decimals on both sides before thresholding)
      """WITH c AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings
                    UNION ALL
                    SELECT vec_id + 1000000, embedding::DOUBLE[] FROM embeddings
                    WHERE vec_id < 20),
              p AS (SELECT a.vec_id AS id1, b.vec_id AS id2,
                      round(list_sum([a.v[i] * b.v[i] for i in range(1, len(a.v) + 1)])
                        / (sqrt(list_sum([x * x for x in a.v]))
                           * sqrt(list_sum([x * x for x in b.v]))), 6) AS cosine
                    FROM c a JOIN c b ON a.vec_id < b.vec_id)
         SELECT id1, id2, cosine FROM p WHERE cosine >= 0.99 ORDER BY id1, id2""",
    "q61_partitioned_scan" ->
      """SELECT lang, COUNT(*) AS n_docs,
                CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS sum_chars
         FROM documents WHERE lang IN ('en', 'de')
         GROUP BY 1 ORDER BY lang""",
    "q73_orc_ingest" ->
      """SELECT lang, COUNT(*) AS n_docs,
                CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS sum_chars
         FROM documents WHERE n_chars > 100
         GROUP BY 1 ORDER BY lang""",
    "q60_jsonl_ingest" ->
      """SELECT lang, COUNT(*) AS n_docs,
                CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS sum_chars,
                CAST(SUM(CAST(length(text) AS BIGINT)) AS BIGINT) AS sum_text_len
         FROM documents GROUP BY 1 ORDER BY lang""",
    "q104_schema_evolution" ->
      // re-derives the expected merged-scan values from the canonical
      // table: doc_id < 250 is the legacy generation (no source/n_tokens),
      // >= 250 the current one with write-time token counts
      """SELECT lang, COUNT(*) AS n_docs,
                CAST(SUM(CASE WHEN doc_id < 250 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_legacy,
                CAST(SUM(CASE WHEN doc_id >= 250 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_current,
                CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS sum_chars,
                CAST(SUM(CASE WHEN doc_id >= 250 THEN
                       CASE WHEN length(trim(text)) = 0 THEN 0
                            ELSE len(string_split_regex(trim(text), ' +')) END
                     ELSE 0 END) AS BIGINT) AS sum_tokens_current
         FROM documents GROUP BY 1 ORDER BY lang""",
    // q28/q29: the engine decodes REAL PNG bytes (JDK imageio); the oracle
    // re-derives every statistic from the closed-form image construction in
    // Multimodal.PngCodec (two-tone split / per-frame constant bands) —
    // these literals mirror imageParams/frameColor exactly; change both or
    // neither. A decode that mis-parses the container cannot match.
    "q28_media_features" ->
      """SELECT doc_id AS media_id,
                CAST(n_chars % 64 + 16 AS INTEGER) AS width,
                CAST(doc_id % 48 + 16 AS INTEGER) AS height,
                CAST((n_chars % 64 + 16) * (doc_id % 48 + 16) AS BIGINT)
                  AS n_pixels,
                CAST(((doc_id % 256) * ((n_chars % 64 + 16) // 2)
                      + ((doc_id * 7 + 13) % 256)
                        * ((n_chars % 64 + 16) - (n_chars % 64 + 16) // 2))
                     * (doc_id % 48 + 16) AS BIGINT) AS sum_r,
                CAST(((n_chars % 256) * ((n_chars % 64 + 16) // 2)
                      + ((n_chars * 5 + 3) % 256)
                        * ((n_chars % 64 + 16) - (n_chars % 64 + 16) // 2))
                     * (doc_id % 48 + 16) AS BIGINT) AS sum_g,
                CAST((((doc_id * 31 + 7) % 256) * ((n_chars % 64 + 16) // 2)
                      + ((doc_id + n_chars) % 256)
                        * ((n_chars % 64 + 16) - (n_chars % 64 + 16) // 2))
                     * (doc_id % 48 + 16) AS BIGINT) AS sum_b
         FROM documents WHERE doc_id % 3 = 0 ORDER BY media_id""",
    "q29_frame_samples" ->
      """SELECT doc_id AS media_id, frame_idx,
                CAST(n_chars % 64 + 16 AS INTEGER) AS width,
                CAST(doc_id % 24 + 8 AS INTEGER) AS frame_height,
                CAST(((doc_id * 5 + 11 * frame_idx + 1) % 256)
                     * (n_chars % 64 + 16) * (doc_id % 24 + 8) AS BIGINT)
                  AS sum_r,
                CAST(((n_chars + 17 * frame_idx) % 256)
                     * (n_chars % 64 + 16) * (doc_id % 24 + 8) AS BIGINT)
                  AS sum_g,
                CAST(((doc_id * 3 + 29 * frame_idx + 5) % 256)
                     * (n_chars % 64 + 16) * (doc_id % 24 + 8) AS BIGINT)
                  AS sum_b
         FROM documents CROSS JOIN (VALUES (0),(1),(2),(3)) AS f(frame_idx)
         WHERE doc_id % 3 = 2 ORDER BY media_id, frame_idx""",
    "q54_bucketed_join" ->
      """SELECT CAST(o_custkey % 10 AS BIGINT) AS cust_bucket,
                COUNT(*) AS n,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY 1 ORDER BY cust_bucket""",
    "q53_csv_ingest" ->
      // mirror of the staged CSV fixture derivation + recodes over the same
      // events parquet (dayofweek offset parity; 97th-event hour -> NULL)
      """WITH f AS (SELECT CAST(dayofweek(ts) AS INTEGER) AS order_dow,
                           CASE WHEN event_id % 97 = 0 THEN NULL
                                ELSE CAST(hour(ts) AS INTEGER) END AS order_hour_of_day,
                           CAST(user_id % 21 + 1 AS INTEGER) AS department_id
                    FROM events),
              r AS (SELECT
                      CASE order_dow
                        WHEN 0 THEN 'Monday' WHEN 1 THEN 'Tuesday'
                        WHEN 2 THEN 'Wednesday' WHEN 3 THEN 'Thursday'
                        WHEN 4 THEN 'Friday' WHEN 5 THEN 'Saturday'
                        WHEN 6 THEN 'Sunday' ELSE 'None' END AS days,
                      CAST(CASE WHEN order_dow IN (0, 1) THEN 0
                                WHEN order_dow IN (2, 3, 4) THEN 1
                                ELSE 2 END AS INTEGER) AS order_dow_updated,
                      order_hour_of_day, department_id
                    FROM f)
         SELECT days, order_dow_updated, COUNT(*) AS n,
                CAST(SUM(order_hour_of_day) AS BIGINT) AS sum_hour
         FROM r WHERE department_id IN (1, 2, 3, 4, 5)
         GROUP BY 1, 2 ORDER BY days""",
    "q40_kmeans_full" -> kmLloydSql(),
    "q41_elbow_sweep" -> elbowSweepSql,
    "q43_kmeans_rdd" -> kmLloydSql(),
    "q46_embedding_clusters" -> arrayKmSql(),
    "q64_set_ops" ->
      """WITH f AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'),
              p AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'P'),
              b AS (SELECT o_custkey FROM f INTERSECT SELECT o_custkey FROM p),
              fo AS (SELECT o_custkey FROM f EXCEPT SELECT o_custkey FROM p)
         SELECT tag, COUNT(*) AS n_custs
         FROM (SELECT 'both' AS tag, o_custkey FROM b
               UNION ALL SELECT 'f_only' AS tag, o_custkey FROM fo)
         GROUP BY tag ORDER BY tag""",
    "q63_running_window" ->
      // ORDER BY casts ts to µs so ns-granularity ties break by event_id on
      // both sides exactly like the Spark (µs) ordering
      """SELECT user_id, event_id,
                CAST(SUM(CAST(value AS DECIMAL(18,2)))
                       OVER (PARTITION BY user_id
                             ORDER BY CAST(ts AS TIMESTAMP), event_id
                             ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_sum,
                LAG(value, 1) OVER (PARTITION BY user_id
                                    ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_value
         FROM events WHERE user_id < 100
         ORDER BY user_id, event_id""",
    "q44_stream_windows" -> streamWindowsSql,
    // the exactly-once FILE sink read back through its commit log must
    // land on the same batch windows
    "q110_stream_file_sink" -> streamWindowsSql,
    // the dedup stream replays every event twice; after exactly-once
    // ingestion the windows must equal the batch over SINGLE-copy events
    "q62_stream_dedup" -> streamWindowsSql,
    // restart incarnation pair must land on the same single-copy batch
    // windows — state restore, offset skip, and sink idempotence included
    "q75_stream_restart" -> streamWindowsSql,
    "q89_stream_enrichment" ->
      """SELECT c_mktsegment, event_type, COUNT(*) AS n_events,
                CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM events JOIN customer ON user_id = c_custkey
         GROUP BY 1, 2 ORDER BY c_mktsegment, event_type""",
    "q87_stream_stream_join" ->
      // the batch theta join is the ground truth for the streamed inner
      // join: every (click, purchase-within-6h) pair exactly once
      """WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
                    FROM events)
         SELECT c.user_id AS user_id, COUNT(*) AS n_pairs
         FROM e c JOIN e p ON c.user_id = p.user_id
           AND c.event_type = 'click' AND p.event_type = 'purchase'
           AND p.ts BETWEEN c.ts AND c.ts + INTERVAL 6 HOUR
         GROUP BY 1 ORDER BY c.user_id""",
    "q111_stream_update_mode" ->
      // update-history shape DERIVED, not pinned: a type emits an update in
      // exactly the tercile batches it occurs in (the late/flush batches
      // carry no real types). The tercile is the same exact row-number
      // arithmetic the fixture stages with — ((rn-1)*3) div n over the
      // (ts, event_id) total order — so a corpus where a type concentrates
      // in one time range oracles to 1 update, not a hardcoded 3.
      """WITH r AS (SELECT event_type,
                           ROW_NUMBER() OVER (ORDER BY ts, event_id) AS rn,
                           COUNT(*) OVER () AS n
                    FROM events)
         SELECT event_type, COUNT(*) AS n_events,
                CAST(COUNT(DISTINCT CAST(FLOOR(((rn - 1) * 3.0) / n) AS INT))
                     AS BIGINT) AS n_updates
         FROM r GROUP BY 1 ORDER BY event_type""",
    "q109_stream_hll" ->
      // exact event counts + the 5% sketch contract pinned TRUE
      """SELECT event_type, COUNT(*) AS n_events, TRUE AS within_tolerance
         FROM events GROUP BY 1 ORDER BY event_type""",
    "q108_stream_upsert" ->
      // the merged table must equal the argmax per user over the same
      // (ts, event_id) total order, whatever the batch boundaries were
      """WITH e AS (SELECT user_id, event_id, event_type, value,
                      CAST(ts AS TIMESTAMP) AS ts
                    FROM events),
              r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rk
                    FROM e)
         SELECT user_id, event_id AS last_event_id,
                event_type AS last_event_type, value AS last_value
         FROM r WHERE rk = 1 ORDER BY user_id""",
    "q102_sliding_windows" ->
      // membership replay: an event's two windows start at its 5-min floor
      // and 5 minutes before it (epoch-aligned grid, same as Spark's
      // window()); plain-TIMESTAMP arithmetic avoids to_timestamp's TZ type
      """WITH e AS (SELECT event_type, value, CAST(ts AS TIMESTAMP) AS ts
                    FROM events),
              g AS (SELECT event_type, value,
                      TIMESTAMP '1970-01-01 00:00:00' + INTERVAL 1 SECOND
                        * (CAST(floor(epoch(ts) / 300) AS BIGINT) * 300) AS s0
                    FROM e),
              w AS (SELECT event_type, value, s0 AS ws FROM g
                    UNION ALL
                    SELECT event_type, value, s0 - INTERVAL 5 MINUTE FROM g)
         SELECT CAST(ws AS TIMESTAMP) AS window_start,
                CAST(ws + INTERVAL 10 MINUTE AS TIMESTAMP) AS window_end,
                event_type, COUNT(*) AS n_events,
                CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM w GROUP BY 1, 2, 3 ORDER BY window_start, event_type""",
    "q100_stream_left_outer_join" ->
      // matched half = the same batch theta join; null half = clicks with
      // no purchase in band AND below the final-watermark emission
      // boundary (flush sits 2h past the corpus max, delay is 10min, band
      // is 6h — all mirrored here from the staged fixture's constants)
      """WITH e AS (SELECT event_id, user_id, event_type,
                      CAST(ts AS TIMESTAMP) AS ts
                    FROM events),
              mx AS (SELECT MAX(ts) AS tmax FROM e),
              c AS (SELECT user_id, event_id AS click_id, ts AS cts
                    FROM e WHERE event_type = 'click'),
              p AS (SELECT user_id, event_id AS buy_id, ts AS pts
                    FROM e WHERE event_type = 'purchase'),
              m AS (SELECT c.user_id FROM c JOIN p ON c.user_id = p.user_id
                      AND p.pts >= c.cts
                      AND p.pts <= c.cts + INTERVAL 6 HOUR),
              unm AS (SELECT c.user_id FROM c, mx
                      WHERE c.cts + INTERVAL 6 HOUR
                              < mx.tmax + INTERVAL 2 HOUR - INTERVAL 10 MINUTE
                        AND NOT EXISTS (SELECT 1 FROM p
                                        WHERE p.user_id = c.user_id
                                          AND p.pts >= c.cts
                                          AND p.pts <= c.cts + INTERVAL 6 HOUR)),
              r AS (SELECT user_id, 1 AS matched FROM m
                    UNION ALL
                    SELECT user_id, 0 FROM unm)
         SELECT user_id, CAST(SUM(matched) AS BIGINT) AS n_matched,
                CAST(SUM(1 - matched) AS BIGINT) AS n_expired
         FROM r GROUP BY 1 ORDER BY user_id""",
    "q38_percentiles" ->
      """SELECT l_returnflag,
                quantile_cont(l_quantity, 0.5) AS p50,
                quantile_cont(l_quantity, 0.9) AS p90,
                MIN(l_quantity) AS q_min, MAX(l_quantity) AS q_max
         FROM lineitem GROUP BY 1 ORDER BY l_returnflag""",
    "q39_string_funcs" ->
      """SELECT p_partkey,
                upper(p_brand) AS brand_upper,
                substr(p_type, 1, 6) AS type_prefix,
                concat_ws('/', p_brand, p_type) AS brand_type,
                replace(p_name, ' ', '_') AS name_snake,
                CAST(length(p_name) AS INTEGER) AS name_len
         FROM part ORDER BY p_partkey""",
    "q33_json_extract" ->
      """WITH t AS (SELECT TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val
                    FROM events)
         SELECT CAST(FLOOR(k_val / 10) AS INTEGER) AS k_bucket,
                COUNT(*) AS n, MIN(k_val) AS k_min, MAX(k_val) AS k_max
         FROM t GROUP BY 1 ORDER BY k_bucket""",
    "q34_calendar" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
                CAST(month(o_orderdate) AS INTEGER) AS o_month,
                COUNT(*) AS n_orders,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
         FROM orders GROUP BY 1, 2 ORDER BY o_year, o_month""",
    "q35_rollup" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n, SUM(l_quantity) AS sum_qty
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""",
    "q50_global_sort" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey""",
    "q51_cross_join" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation
         ORDER BY r_name, n_name""",
    "q48_cube" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n, SUM(l_quantity) AS sum_qty
         FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
         ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""",
    "q49_token_freq" ->
      """SELECT token, COUNT(*) AS n
         FROM (SELECT unnest(string_split_regex(trim(text), ' +')) AS token
               FROM documents) t
         WHERE length(token) > 0
         GROUP BY token ORDER BY n DESC, token LIMIT 25""",
    "q37_pivot" ->
      """SELECT CAST(o_custkey % 10 AS INTEGER) AS cust_bucket,
                COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
                COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
                COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
         FROM orders GROUP BY 1 ORDER BY cust_bucket""",
    "q86_range_join" ->
      // ground truth is the naive theta join — the oracle can afford
      // O(|E| * 30 windows); the engine side must not
      """WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
              d AS (SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP) AS w_start
                    FROM e),
              iv AS (SELECT w_start, w_start + INTERVAL 30 HOUR AS w_end FROM d)
         SELECT w_start, COUNT(*) AS n_events,
                CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM e JOIN iv ON e.ts BETWEEN iv.w_start AND iv.w_end
         GROUP BY 1 ORDER BY w_start""",
    "q36_asof_join" ->
      """SELECT event_id, asof_o_orderkey
         FROM (SELECT e.event_id, o.o_orderkey AS asof_o_orderkey,
                      ROW_NUMBER() OVER (PARTITION BY e.event_id
                        ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rk
               FROM events e JOIN orders o
                 ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts) t
         WHERE rk = 1 ORDER BY event_id""",
    "q31_salted_distinct" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_distinct_l_partkey
         FROM lineitem GROUP BY 1 ORDER BY l_returnflag""",
    "q32_salted_join" ->
      """SELECT s_name, COUNT(*) AS n_items, SUM(l_quantity) AS sum_qty
         FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         GROUP BY s_name ORDER BY s_name""",
    "q18_quality" ->
      """WITH t AS (
           SELECT doc_id,
                  CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                       ELSE len(string_split_regex(trim(text), ' +')) END AS INTEGER) AS n_tok,
                  CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                       ELSE len(list_distinct(string_split_regex(trim(text), ' +'))) END AS INTEGER) AS n_uniq,
                  CAST(length(trim(text)) AS INTEGER) AS len_trim
           FROM documents)
         SELECT doc_id,
                CASE WHEN n_tok = 0 THEN 0.0
                     ELSE CAST(n_uniq AS DOUBLE) / CAST(n_tok AS DOUBLE) END AS lex_div,
                CASE WHEN n_tok = 0 THEN 0.0
                     ELSE CAST(len_trim - (n_tok - 1) AS DOUBLE) / CAST(n_tok AS DOUBLE) END
                  AS mean_tok_len
         FROM t ORDER BY doc_id""",
    "q164_retrieval_eval" ->
      // ranking replayed as a plain per-term window at DuckDB's scale;
      // the nDCG discount / IDCG-prefix tables are the SAME integer
      // micro-unit literals as operators.RetrievalEval.discMicros
      """WITH postings AS (
           SELECT term, doc_id, COUNT(*) AS tf
           FROM (SELECT doc_id,
                   unnest(string_split_regex(trim(text), ' +')) AS term
                 FROM documents)
           WHERE term IN ('data','hash','join','scan','vector')
           GROUP BY 1, 2),
         top AS (
           SELECT term, doc_id, tf,
                  row_number() OVER (PARTITION BY term
                                     ORDER BY tf DESC, doc_id) AS rank
           FROM postings QUALIFY rank <= 10),
         disc(rank, disc_micros) AS (VALUES
           (1,1000000),(2,630929),(3,500000),(4,430676),(5,386852),
           (6,356207),(7,333333),(8,315464),(9,301029),(10,289064)),
         idcg(m, prefix_micros) AS (VALUES
           (0,0),(1,1000000),(2,1630929),(3,2130929),(4,2561605),
           (5,2948457),(6,3304664),(7,3637997),(8,3953461),(9,4254490),
           (10,4543554)),
         rel AS (SELECT term, COUNT(*) AS n_relevant
                 FROM postings WHERE tf >= 3 GROUP BY 1),
         agg AS (
           SELECT t.term,
                  SUM(CASE WHEN t.tf >= 3 THEN 1 ELSE 0 END) AS hits_at_k,
                  MIN(CASE WHEN t.tf >= 3 THEN t.rank END) AS first_rel_rank,
                  SUM(CASE WHEN t.tf >= 3 THEN d.disc_micros ELSE 0 END)
                    AS dcg_micros
           FROM top t JOIN disc d USING (rank) GROUP BY 1),
         probe(term) AS (VALUES
           ('data'),('hash'),('join'),('scan'),('vector'))
         SELECT p.term,
                CAST(COALESCE(r.n_relevant, 0) AS BIGINT) AS n_relevant,
                CAST(COALESCE(a.hits_at_k, 0) AS BIGINT) AS hits_at_k,
                CAST(COALESCE(a.first_rel_rank, 0) AS INTEGER) AS first_rel_rank,
                CAST(CASE WHEN a.first_rel_rank IS NOT NULL
                          THEN 1000000 // a.first_rel_rank ELSE 0 END AS BIGINT)
                  AS mrr_micros,
                CAST(COALESCE(a.dcg_micros, 0) AS BIGINT) AS dcg_micros,
                CAST(i.prefix_micros AS BIGINT) AS idcg_micros,
                CASE WHEN i.prefix_micros > 0
                     THEN round(CAST(COALESCE(a.dcg_micros, 0) AS DOUBLE)
                                / CAST(i.prefix_micros AS DOUBLE), 6)
                     ELSE 0.0 END AS ndcg
         FROM probe p LEFT JOIN agg a USING (term) LEFT JOIN rel r USING (term)
         JOIN idcg i ON i.m = LEAST(COALESCE(r.n_relevant, 0), 10)
         ORDER BY term""",
    "q165_bigram_perplexity" ->
      // same pair stream (adjacent whitespace tokens), same interpolation
      // float-op order as operators.BigramLM, surprisal rounded to 9dp
      // once per bigram type and summed as exact DECIMALs (the q134 rule)
      """WITH toks AS (SELECT doc_id,
                         string_split_regex(trim(text), ' +') AS a
                       FROM documents),
         pairs AS (SELECT doc_id,
                     unnest(list_zip(a[1:len(a)-1], a[2:len(a)])) AS pair
                   FROM toks WHERE len(a) >= 2),
         tf AS (SELECT doc_id, pair[1] AS w1, pair[2] AS w2, COUNT(*) AS tf
                FROM pairs
                WHERE length(pair[1]) > 0 AND length(pair[2]) > 0
                GROUP BY 1, 2, 3),
         vocab AS (SELECT w1, w2, SUM(tf) AS c12 FROM tf GROUP BY 1, 2),
         lft AS (SELECT w1, SUM(c12) AS c1 FROM vocab GROUP BY 1),
         uni AS (SELECT w2, SUM(c12) AS c2 FROM vocab GROUP BY 1),
         tot AS (SELECT SUM(c12) AS n_total FROM vocab),
         terms AS (SELECT doc_id, tf,
                     CAST(tf AS DECIMAL(9,0)) *
                     CAST(round(-ln(0.75 * CAST(c12 AS DOUBLE)
                                         / CAST(c1 AS DOUBLE)
                                  + 0.25 * CAST(c2 AS DOUBLE)
                                         / CAST(n_total AS DOUBLE)), 9)
                          AS DECIMAL(19,9)) AS term
                   FROM tf JOIN vocab USING (w1, w2)
                   JOIN lft USING (w1) JOIN uni USING (w2), tot)
         SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_bigrams,
                round(CAST(SUM(term) AS DOUBLE)
                      / CAST(SUM(tf) AS DOUBLE), 6) AS cross_entropy
         FROM terms GROUP BY doc_id ORDER BY doc_id""",
    "q166_heavy_hitters" ->
      // the MG candidate pass is invisible here by design: the operator's
      // output contract is "every token above 2% frequency, with its
      // exact count", which a plain GROUP BY states directly
      """WITH t AS (SELECT token
                    FROM (SELECT unnest(string_split_regex(trim(text), ' +'))
                            AS token FROM documents)
                    WHERE length(token) > 0),
         tot AS (SELECT COUNT(*) AS n_total FROM t),
         c AS (SELECT token, COUNT(*) AS cnt FROM t GROUP BY 1)
         SELECT token, CAST(cnt AS BIGINT) AS cnt,
                CAST(n_total AS BIGINT) AS n_total
         FROM c, tot WHERE cnt * 50 > n_total * 1
         ORDER BY cnt DESC, token""",
    "q167_shard_plan" ->
      // the distributed two-pass rank replayed as a plain window; same
      // (size desc, doc_id) total order, same serpentine fold
      """WITH ranked AS (
           SELECT doc_id, CAST(n_chars AS BIGINT) AS size,
                  row_number() OVER (ORDER BY CAST(n_chars AS BIGINT) DESC,
                                              doc_id) AS rank
           FROM documents),
         a AS (SELECT *,
                 CAST(CASE WHEN (((rank - 1) // 8) % 2) = 0
                           THEN (rank - 1) % 8
                           ELSE 7 - ((rank - 1) % 8) END AS INTEGER) AS shard
               FROM ranked)
         SELECT shard, COUNT(*) AS n_docs,
                CAST(SUM(size) AS BIGINT) AS total_size,
                CAST(SUM(rank) AS BIGINT) AS rank_sum
         FROM a GROUP BY shard ORDER BY shard""",
    "q168_embedding_audit" ->
      // same planted NaN-head / zero-vector rows, same floor-quantized
      // integer norms (floor of a double is engine-exact — the q159 rule)
      """WITH p AS (SELECT vec_id, label,
                      CASE WHEN vec_id % 97 = 0
                           THEN list_concat([CAST('NaN' AS FLOAT)],
                                            embedding[2:])
                           WHEN vec_id % 89 = 0
                           THEN list_transform(embedding,
                                               x -> CAST(0 AS FLOAT))
                           ELSE embedding END AS vec
                    FROM embeddings),
         a AS (SELECT label, len(vec) AS dim,
                 len(list_filter(vec, x -> isnan(CAST(x AS DOUBLE))
                                        OR isinf(CAST(x AS DOUBLE))))
                   AS n_nonfinite,
                 COALESCE(list_sum(list_transform(
                   list_filter(vec, x -> NOT isnan(CAST(x AS DOUBLE))
                                     AND NOT isinf(CAST(x AS DOUBLE))),
                   x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT)
                        * CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT))), 0)
                   AS qnorm
               FROM p)
         SELECT label, COUNT(*) AS n_vecs,
                CAST(SUM(CASE WHEN dim <> 64 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_bad_dim,
                CAST(SUM(CASE WHEN n_nonfinite > 0 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_nonfinite_vecs,
                CAST(SUM(CASE WHEN n_nonfinite = 0 AND qnorm = 0
                              THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_vecs,
                CAST(SUM(qnorm) AS BIGINT) AS sum_qnorm,
                CAST(MIN(dim) AS INTEGER) AS min_dim,
                CAST(MAX(dim) AS INTEGER) AS max_dim
         FROM a GROUP BY label ORDER BY label""",
    "q169_curriculum_interleave" ->
      // margins via the q155 fold, per-lang rank + the same
      // (rank-1)*n_strata + stratum_idx position bijection
      """WITH tk AS (SELECT doc_id, lang,
                       [x for x in string_split_regex(trim(text), ' +')
                        if length(x) > 0] AS toks
                     FROM documents),
         g AS (SELECT doc_id, lang, list_concat(toks,
                 [toks[i] || ' ' || toks[i+1]
                  for i in range(1, len(toks))]) AS grams
               FROM tk),
         m AS (SELECT doc_id, lang, CAST(coalesce(list_sum([
                 (list_reduce([ascii(gm[i])
                               for i in range(1, len(gm) + 1)],
                              (a, b) -> (a * 31 + b) % 1000003)
                  % 2001) - 1000
                 for gm in grams]), 0) AS BIGINT) AS score
               FROM g),
         ranked AS (SELECT lang, doc_id, score,
                      row_number() OVER (PARTITION BY lang
                                         ORDER BY score DESC, doc_id) AS rank
                    FROM m QUALIFY rank <= 40),
         strata AS (SELECT lang,
                      row_number() OVER (ORDER BY lang) - 1 AS stratum_idx
                    FROM (SELECT DISTINCT lang FROM documents)),
         n AS (SELECT COUNT(*) AS n_strata FROM strata)
         SELECT CAST((rank - 1) * n_strata + stratum_idx AS BIGINT) AS pos,
                lang AS stratum, doc_id AS id, score
         FROM ranked JOIN strata USING (lang), n
         WHERE (rank - 1) * n_strata + stratum_idx < 40
         ORDER BY pos""",
    "q170_split_manifest" ->
      // same normalization, same rolling-31-mod-999999937 fold (q155's
      // list_reduce idiom), same Knuth spread mod 2^32 as the engine's
      // kmv_key, bucket = key mod 100, 80/10/10 CASE
      """WITH src AS (SELECT doc_id, lang, text,
                        regexp_replace(lower(trim(text)), '[ \t\n\f\r]+', ' ', 'g')
                          AS t
                      FROM documents),
         b AS (SELECT doc_id, lang, text,
                 (CASE WHEN len(t) = 0 THEN 0 ELSE
                    (list_reduce([ascii(t[i])
                                  for i in range(1, len(t) + 1)],
                                 (a, b) -> (CAST(a AS BIGINT) * 31 + b)
                                           % 999999937)
                     * 2654435761) % 4294967296 END) % 100 AS bucket
               FROM src),
         sp AS (SELECT doc_id, lang, text,
                  CASE WHEN bucket < 80 THEN 'train'
                       WHEN bucket < 90 THEN 'val'
                       ELSE 'test' END AS split
                FROM b)
         SELECT split, lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
                CAST(SUM(CASE WHEN len(trim(text)) = 0 THEN 0
                         ELSE len(string_split_regex(trim(text), ' +'))
                         END) AS BIGINT) AS n_tokens,
                CAST(SUM(len(text)) AS BIGINT) AS n_chars,
                CAST(SUM(doc_id) AS BIGINT) AS id_sum
         FROM sp GROUP BY 1, 2 ORDER BY 1, 2""",
    "q171_pii_scrub" ->
      // identical planting (every 13th doc an email, every 17th an IPv4),
      // identical Java-regex/RE2-common patterns, identical [PII]
      // replacement token — counts and char deltas match to the integer
      """WITH p AS (SELECT lang,
                      text || CASE WHEN doc_id % 13 = 0
                                   THEN ' contact user'
                                        || CAST(doc_id AS VARCHAR)
                                        || '@example.com'
                                   ELSE '' END
                           || CASE WHEN doc_id % 17 = 0
                                   THEN ' from 10.0.'
                                        || CAST(doc_id % 256 AS VARCHAR)
                                        || '.7 gateway'
                                   ELSE '' END AS t
                    FROM documents),
         m AS (SELECT lang,
                 len(regexp_extract_all(t,
                   '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS ne,
                 len(regexp_extract_all(t,
                   '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS ni,
                 len(t) - len(regexp_replace(regexp_replace(t,
                   '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '[PII]', 'g'),
                   '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[PII]', 'g'))
                   AS delta
               FROM p)
         SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
                CAST(SUM(CASE WHEN ne > 0 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_email_docs,
                CAST(SUM(ne) AS BIGINT) AS n_emails,
                CAST(SUM(CASE WHEN ni > 0 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_ip_docs,
                CAST(SUM(ni) AS BIGINT) AS n_ips,
                CAST(SUM(delta) AS BIGINT) AS chars_removed
         FROM m GROUP BY 1 ORDER BY 1""",
    "q172_split_leakage" ->
      // q170's split replayed, then val 5-grams IN train 5-grams — the
      // same distinct/semi-join counts per val language
      """WITH src AS (SELECT doc_id, lang, trim(text) AS tt,
                        regexp_replace(lower(trim(text)), '[ \t\n\f\r]+', ' ', 'g')
                          AS t
                      FROM documents),
         b AS (SELECT doc_id, lang, tt,
                 (CASE WHEN len(t) = 0 THEN 0 ELSE
                    (list_reduce([ascii(t[i])
                                  for i in range(1, len(t) + 1)],
                                 (a, b) -> (CAST(a AS BIGINT) * 31 + b)
                                           % 999999937)
                     * 2654435761) % 4294967296 END) % 100 AS bucket
               FROM src),
         sp AS (SELECT doc_id, lang,
                  string_split_regex(tt, ' +') AS toks,
                  CASE WHEN bucket < 80 THEN 'train'
                       WHEN bucket < 90 THEN 'val'
                       ELSE 'test' END AS split
                FROM b),
         tg AS (SELECT DISTINCT g FROM (
                  SELECT unnest([array_to_string(toks[i:i+4], ' ')
                                 for i in range(1, len(toks) - 3)]) AS g
                  FROM sp WHERE split = 'train' AND len(toks) >= 5)),
         vg AS (SELECT lang, doc_id, g FROM (
                  SELECT lang, doc_id,
                         unnest([array_to_string(toks[i:i+4], ' ')
                                 for i in range(1, len(toks) - 3)]) AS g
                  FROM sp WHERE split = 'val' AND len(toks) >= 5)),
         lk AS (SELECT DISTINCT lang, doc_id, g FROM vg
                WHERE g IN (SELECT g FROM tg)),
         base AS (SELECT lang, COUNT(*) AS n_val_docs FROM sp
                  WHERE split = 'val' GROUP BY 1),
         agg AS (SELECT lang, COUNT(DISTINCT doc_id) AS nd,
                        COUNT(DISTINCT g) AS ng FROM lk GROUP BY 1)
         SELECT b.lang, CAST(b.n_val_docs AS BIGINT) AS n_val_docs,
                CAST(COALESCE(a.nd, 0) AS BIGINT) AS n_leaked_docs,
                CAST(COALESCE(a.ng, 0) AS BIGINT) AS n_leaked_grams
         FROM base b LEFT JOIN agg a USING (lang) ORDER BY lang""",
    "q173_freq_spectrum" ->
      // same trigram stream, same type counts, same LEAST(f, 11) tail fold
      """WITH toks AS (SELECT string_split_regex(trim(text), ' +') AS a
                       FROM documents),
         grams AS (SELECT unnest([array_to_string(a[i:i+2], ' ')
                                  for i in range(1, len(a) - 1)]) AS g
                   FROM toks WHERE len(a) >= 3),
         tf AS (SELECT g, COUNT(*) AS f FROM grams GROUP BY 1)
         SELECT CAST(LEAST(f, 11) AS BIGINT) AS fb,
                CAST(COUNT(*) AS BIGINT) AS n_types,
                CAST(SUM(f) AS BIGINT) AS mass
         FROM tf GROUP BY 1 ORDER BY 1""",
    "q174_skew_profile" ->
      // same key counts, same inverse-CDF-over-keys percentile rule
      // (smallest cnt with cumulative keys >= ceil(p*n_keys/100), spelled
      // as ckeys*100 >= n_keys*p), same top-10 (cnt desc, key) mass, same
      // integer floor divisions
      """WITH c AS (SELECT user_id AS key, COUNT(*) AS cnt
                    FROM events GROUP BY 1),
         sp AS (SELECT cnt, COUNT(*) AS nk FROM c GROUP BY 1),
         cu AS (SELECT cnt, SUM(nk) OVER (ORDER BY cnt) AS ckeys FROM sp),
         t AS (SELECT SUM(cnt) AS n_rows, COUNT(*) AS n_keys,
                      MAX(cnt) AS max_cnt FROM c),
         p AS (SELECT
                 MIN(CASE WHEN ckeys * 100 >= n_keys * 50 THEN cnt END)
                   AS p50_cnt,
                 MIN(CASE WHEN ckeys * 100 >= n_keys * 99 THEN cnt END)
                   AS p99_cnt
               FROM cu, t),
         tk AS (SELECT SUM(cnt) AS topk_mass, MAX(cnt) AS top1_mass
                FROM (SELECT cnt FROM c ORDER BY cnt DESC, key LIMIT 10))
         SELECT CAST(n_rows AS BIGINT) AS n_rows,
                CAST(n_keys AS BIGINT) AS n_keys,
                CAST(max_cnt AS BIGINT) AS max_cnt,
                CAST(p50_cnt AS BIGINT) AS p50_cnt,
                CAST(p99_cnt AS BIGINT) AS p99_cnt,
                CAST(top1_mass * 1000000 // n_rows AS BIGINT) AS top1_ppm,
                CAST(topk_mass * 1000000 // n_rows AS BIGINT) AS topk_ppm,
                CAST(max_cnt * 100 // p50_cnt AS BIGINT) AS skew_x100
         FROM t, p, tk""",
    "q175_long_span_dedup" ->
      // gram-STRING ground truth for the engine's xxhash64 window stream
      // (the q99 hash-vs-string equivalence, now with positions): same
      // 50-token windows, same count>=2 repeat rule (within-doc second
      // occurrences count), same gaps-and-islands union with the break at
      // gap > 50 — so spans, token coverage and max length match to the
      // integer, and every gate run audits the engine's hash keying
      """WITH t AS (SELECT doc_id,
                      string_split_regex(trim(text), ' +') AS a
                    FROM documents),
         p AS (SELECT doc_id, a,
                 unnest([i for i in range(1, len(a) - 48)]) AS pos
               FROM t WHERE len(a) >= 50),
         g AS (SELECT doc_id, pos,
                 array_to_string(a[pos:pos+49], ' ') AS gram
               FROM p),
         dup AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(*) >= 2),
         hits AS (SELECT doc_id, pos FROM g
                  WHERE gram IN (SELECT gram FROM dup)),
         isl AS (SELECT doc_id, pos,
                   CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id
                                                  ORDER BY pos) > 50
                        THEN 1 ELSE 0 END AS brk
                 FROM hits),
         isl2 AS (SELECT doc_id, pos,
                    SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos)
                      AS island
                  FROM isl),
         sp AS (SELECT doc_id, MIN(pos) AS s, MAX(pos) + 49 AS e
                FROM isl2 GROUP BY doc_id, island)
         SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
                CAST(SUM(e - s + 1) AS BIGINT) AS dup_tokens,
                CAST(MAX(e - s + 1) AS INTEGER) AS max_span
         FROM sp GROUP BY doc_id ORDER BY doc_id""",
    "q176_domain_blocklist" ->
      // same literal blocklist, same per-lang kept/blocked split
      """SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
                CAST(SUM(CASE WHEN source IN ('src3','src7','src13','src19')
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_blocked,
                CAST(SUM(CASE WHEN source IN ('src3','src7','src13','src19')
                         THEN 0 ELSE 1 END) AS BIGINT) AS n_kept,
                CAST(SUM(CASE WHEN source IN ('src3','src7','src13','src19')
                         THEN 0 ELSE n_chars END) AS BIGINT) AS kept_chars
         FROM documents GROUP BY 1 ORDER BY 1""",
    "q177_domain_mass_cap" ->
      // same Knuth spread (kmv-family constants), same exact HUGEINT
      // cross-multiplied keep rule, same integer-DIV ppm shares
      """WITH c AS (SELECT source AS domain, COUNT(*) AS n_domain
                    FROM documents GROUP BY 1),
         t AS (SELECT SUM(n_domain) AS total FROM c),
         cc AS (SELECT domain, n_domain,
                  total * 40000 // 1000000 AS capN FROM c, t),
         f AS (SELECT cc.domain, cc.n_domain, cc.capN,
                 ((d.doc_id % 999999937) * 2654435761) % 4294967296
                   AS spread
               FROM documents d JOIN cc ON d.source = cc.domain),
         k AS (SELECT domain, COUNT(*) AS n_docs,
                 SUM(CASE WHEN n_domain <= capN
                          OR spread::HUGEINT * n_domain
                             < capN::HUGEINT * 4294967296
                          THEN 1 ELSE 0 END) AS n_kept
               FROM f GROUP BY 1),
         tt AS (SELECT SUM(n_docs) AS t_before, SUM(n_kept) AS t_after
                FROM k)
         SELECT domain, CAST(n_docs AS BIGINT) AS n_docs,
                CAST(n_kept AS BIGINT) AS n_kept,
                CAST(n_docs * 1000000 // t_before AS BIGINT) AS before_ppm,
                CAST(n_kept * 1000000 // t_after AS BIGINT) AS after_ppm
         FROM k, tt ORDER BY domain""",
    "q178_span_removal" ->
      // q175's gram-string stream + the canonical min(id*2^20+pos) key,
      // islands over the NON-canonical positions, list-comprehension cut
      // and rejoin (COALESCE: array_to_string of an empty list is NULL in
      // DuckDB, '' in Spark's concat_ws), and the kmv_key rolling fold
      // over every final text — checksums match to the integer only if
      // every reconstructed byte matches
      """WITH t AS (SELECT doc_id, lang, text,
                      string_split_regex(trim(text), ' +') AS a
                    FROM documents),
         p AS (SELECT doc_id, a,
                 unnest([i for i in range(1, len(a) - 48)]) AS pos
               FROM t WHERE len(a) >= 50),
         g AS (SELECT doc_id, pos,
                 array_to_string(a[pos:pos+49], ' ') AS gram
               FROM p),
         st AS (SELECT gram, COUNT(*) AS c,
                  MIN(doc_id * 1048576 + pos) AS firstkey
                FROM g GROUP BY gram HAVING COUNT(*) >= 2),
         rem AS (SELECT g.doc_id, g.pos FROM g JOIN st USING (gram)
                 WHERE g.doc_id * 1048576 + g.pos <> st.firstkey),
         isl AS (SELECT doc_id, pos,
                   CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id
                                                  ORDER BY pos) > 50
                        THEN 1 ELSE 0 END AS brk
                 FROM rem),
         isl2 AS (SELECT doc_id, pos,
                    SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos)
                      AS island
                  FROM isl),
         sp AS (SELECT doc_id, MIN(pos) AS s, MAX(pos) + 49 AS e
                FROM isl2 GROUP BY doc_id, island),
         cuts AS (SELECT doc_id, list(struct_pack(s := s, e := e)) AS cl
                  FROM sp GROUP BY doc_id),
         fin AS (SELECT t.doc_id, t.lang, t.text, len(t.a) AS nb,
                   c.doc_id IS NOT NULL AS modified,
                   CASE WHEN c.doc_id IS NULL THEN NULL
                        ELSE [t.a[i] for i in range(1, len(t.a) + 1)
                              if len(list_filter(c.cl,
                                x -> i >= x.s AND i <= x.e)) = 0] END
                     AS klist
                 FROM t LEFT JOIN cuts c USING (doc_id)),
         m AS (SELECT lang, nb, modified,
                 CASE WHEN modified THEN nb - len(klist) ELSE 0 END
                   AS removed,
                 CASE WHEN modified
                      THEN COALESCE(array_to_string(klist, ' '), '')
                      ELSE text END AS ftext
               FROM fin),
         ck AS (SELECT lang, nb, modified, removed,
                  CASE WHEN len(ftext) = 0 THEN 0
                       ELSE (list_reduce([ascii(ftext[i])
                               for i in range(1, len(ftext) + 1)],
                              (x, y) -> (CAST(x AS BIGINT) * 31 + y)
                                        % 999999937)
                             * 2654435761) % 4294967296 END AS k
                FROM m)
         SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
                CAST(SUM(CASE WHEN modified THEN 1 ELSE 0 END) AS BIGINT)
                  AS docs_modified,
                CAST(SUM(nb) AS BIGINT) AS tokens_before,
                CAST(SUM(removed) AS BIGINT) AS tokens_removed,
                CAST(SUM(k) AS BIGINT) AS text_checksum
         FROM ck GROUP BY 1 ORDER BY 1""",
    "q179_editdist_blocking_stats" ->
      // the funnel replayed with variant STRINGS (engine: xxhash64 keys) —
      // pos -1 marks the full string, i marks delete-character-i
      // (substr(s,1,i-1)||substr(s,i+1)); the candidate join carries the
      // engine's position-consistency residual (same pos, or either side
      // the full string)
      """WITH base AS (SELECT c_custkey AS id, c_name AS s FROM customer),
              vars AS (
                  SELECT id, s, -1 AS pos, s AS v FROM base
                  UNION ALL
                  SELECT id, s, CAST(i AS INT) AS pos,
                         substr(s, 1, i - 1) || substr(s, i + 1) AS v
                  FROM (SELECT id, s,
                          unnest(generate_series(1, length(s))) AS i
                        FROM base)),
              cand AS (SELECT a.id AS id1, b.id AS id2,
                              a.s AS s1, b.s AS s2
                       FROM vars a JOIN vars b
                       ON a.v = b.v AND a.id < b.id
                          AND (a.pos = b.pos
                               OR a.pos = -1 OR b.pos = -1)),
              ver AS (SELECT id1, id2 FROM cand
                      WHERE levenshtein(s1, s2) <= 1)
         SELECT (SELECT COUNT(*) FROM base) AS n_strings,
                (SELECT COUNT(*) FROM vars) AS n_variant_rows,
                (SELECT COUNT(*) FROM cand) AS n_candidates,
                (SELECT COUNT(*) FROM ver) AS n_verified,
                (SELECT COUNT(*)
                 FROM (SELECT DISTINCT id1, id2 FROM ver) d) AS n_pairs""",
    "q180_prefix_blocking_stats" ->
      // order-blind funnel columns: same shingle builder as q133's oracle;
      // prefix mass is SUM(l - ceil(4l/5) + 1) over per-doc distinct-gram
      // counts (identical to the engine's hash-set sizes absent
      // collisions); the result count reuses the brute-force join
      """WITH toks AS (SELECT doc_id,
                         string_split_regex(trim(text), ' +') AS tk
                       FROM documents),
              sh AS (SELECT doc_id,
                       CASE WHEN len(tk) >= 5
                            THEN list_distinct(
                              [array_to_string(tk[i:i+4], ' ')
                               for i in range(1, len(tk) - 3)])
                            ELSE [array_to_string(tk, ' ')] END AS grams
                     FROM toks),
              lens AS (SELECT CAST(len(grams) AS BIGINT) AS l FROM sh),
              res AS (SELECT a.doc_id AS id1, b.doc_id AS id2
                      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
                      WHERE len(list_intersect(a.grams, b.grams)) * 5
                            >= len(list_distinct(
                                 list_concat(a.grams, b.grams))) * 4)
         SELECT (SELECT COUNT(*) FROM sh) AS n_docs,
                (SELECT CAST(SUM(l - CAST(ceil(CAST(l * 4 AS DOUBLE) / 5)
                                          AS BIGINT) + 1) AS BIGINT)
                 FROM lens) AS n_prefix_rows,
                (SELECT COUNT(*) FROM res) AS n_result_pairs""",
    "q181_bpe_merges64" -> bpeOracleSql(64),
    "q182_planted_dedup_groups" ->
      // the 8 exact-dup pair texts rebuilt literally from the Planted
      // construction (12 'pg<e>x<j>' tokens), md5-hashed — closed form,
      // no table scan
      """WITH e AS (SELECT 40 + i AS g FROM range(8) t(i)),
              txt AS (SELECT g,
                        array_to_string(
                          ['pg' || CAST(g AS VARCHAR) || 'x' ||
                           CAST(j AS VARCHAR) for j in range(12)],
                          ' ') AS text
                      FROM e)
         SELECT md5(text) AS content_hash,
                CAST(900000000 + g * 10 AS BIGINT) AS canonical_id,
                CAST(2 AS BIGINT) AS n_copies
         FROM txt ORDER BY canonical_id""",
    "q183_ann_index_persist" ->
      // recall-floor oracle, q27/q95's shape: every query's loaded-index
      // top-10 must recover >= 6/10 of the exact cosine top-10
      """SELECT vec_id AS query_id, TRUE AS meets_floor
         FROM embeddings WHERE vec_id < 5 ORDER BY vec_id""",
    "q184_gopher_repetition" ->
      // the nine rules replayed per doc: top-n = row_number over
      // (count desc, gram asc) under binary collation; dup-n = distinct
      // covered token positions joined back to token lengths
      gopherOracleSql,
    "q185_planted_gopher_stats" ->
      // the planted construction rebuilt literally + the same battery
      // CTEs, emitting exact per-doc numerators
      gopherPlantedOracleSql,
    "q186_dedup_store_exact" ->
      // the exact stage replayed from the raw table: batch = doc_id >=
      // 250, store = md5 hashes of doc_id < 250 (the staged store's
      // planted rows use corpus-disjoint vocabulary, so they cannot match
      // an organic batch hash and are invisible to this replay)
      """WITH ing AS (SELECT DISTINCT md5(text) AS h FROM documents
                      WHERE doc_id < 250),
              b AS (SELECT doc_id, lang, md5(text) AS h FROM documents
                    WHERE doc_id >= 250),
              k AS (SELECT h, MIN(doc_id) AS keep FROM b GROUP BY 1)
         SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_batch,
                CAST(SUM(CASE WHEN doc_id <> keep THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_dup_in_batch,
                CAST(SUM(CASE WHEN doc_id = keep
                          AND h IN (SELECT h FROM ing) THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_dup_vs_store,
                CAST(SUM(CASE WHEN doc_id = keep
                          AND h NOT IN (SELECT h FROM ing) THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_new_exact
         FROM b JOIN k USING (h) GROUP BY 1 ORDER BY 1""",
    "q187_dedup_store_neardup" ->
      // property oracle (q23/q77 precedent): the planted verdict groups
      // and the out-of-band Hamming consistency audit must all hold
      """SELECT TRUE AS exact_copies_suppressed,
                TRUE AS space_variants_near_suppressed,
                TRUE AS fresh_vocab_survives,
                TRUE AS verdicts_match_recomputed_hamming""",
    "q192_bpe_merges1k" ->
      // the 1023 expected merges generated from the construction's own
      // modular arithmetic: wave w = circle-method matching ({61, w} and
      // {(w+i) mod 61, (w-i) mod 61}), count 100-2w, global order =
      // wave (count desc) then (left, right) binary-lexicographic
      bpe1kScheduleOracleSql,
    "q191_ann_index_append" ->
      // quality-floor + strong-neighbor + completeness oracle (q183's
      // shape): approx top-10 within 0.05 cosine of the exact 10th AND
      // exactly k=10 rows returned (an under-full result would bias the
      // min upward), every cosine>=0.9 neighbor recovered, appended rows
      // all present
      """SELECT vec_id AS query_id, TRUE AS quality_floor, TRUE AS full_k,
                TRUE AS strong_recovered, TRUE AS index_complete
         FROM embeddings WHERE vec_id < 5 ORDER BY vec_id""",
    "q190_gopher_line_rules" ->
      // the same five multiline texts rebuilt literally (chr(10) joins —
      // the q185 contract: change BOTH constructions or neither), the
      // same pinned conventions: literal splits, empty segments out,
      // no trim, len() = characters of the raw segment
      """WITH docs(doc_id, text) AS (VALUES
           (920000200, concat_ws(chr(10), 'gl0x0 line 0', 'gl0x1 line 1',
              'gl0x2 line 2', 'gl0x3 line 3', 'gl0x4 line 4',
              'gl0x5 line 5', 'gl0dup repeated line', 'gl0dup repeated line',
              'gl0dup repeated line', 'gl0dup repeated line')),
           (920000201, concat_ws(chr(10) || chr(10), 'gl1a first para',
              'gl1b second para', 'gl1a first para')),
           (920000202, concat_ws(chr(10), 'gl2x0', 'gl2x1', 'gl2x2',
              'gl2x3', 'gl2x4', 'gl2x5', 'gl2x6', 'gl2x7',
              'gl2long0 gl2long1 gl2long2 gl2long3 gl2long4 gl2long5 gl2long6 gl2long7 gl2long8 gl2long9 gl2long10 gl2long11 gl2long12 gl2long13 gl2long14 gl2long15 gl2long16 gl2long17 gl2long18 gl2long19',
              'gl2long0 gl2long1 gl2long2 gl2long3 gl2long4 gl2long5 gl2long6 gl2long7 gl2long8 gl2long9 gl2long10 gl2long11 gl2long12 gl2long13 gl2long14 gl2long15 gl2long16 gl2long17 gl2long18 gl2long19')),
           (920000203, concat_ws(chr(10) || chr(10),
              'gl3l1' || chr(10) || 'gl3l2', 'gl3only',
              'gl3l1' || chr(10) || 'gl3l2')),
           (920000204, concat_ws(chr(10), 'gl4x0 distinct 0',
              'gl4x1 distinct 1', 'gl4x2 distinct 2', 'gl4x3 distinct 3',
              'gl4x4 distinct 4'))),
         l AS (SELECT doc_id, unnest(string_split(text, chr(10))) AS seg
               FROM docs),
         lc AS (SELECT doc_id, seg, COUNT(*) AS c, len(seg) AS ln
                FROM l WHERE len(seg) > 0 GROUP BY 1, 2),
         la AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_lines,
                  CAST(SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT)
                    AS dup_lines,
                  CAST(SUM(c * ln) AS BIGINT) AS line_chars,
                  CAST(SUM(CASE WHEN c >= 2 THEN c * ln ELSE 0 END)
                       AS BIGINT) AS dup_line_chars
                FROM lc GROUP BY 1),
         p AS (SELECT doc_id,
                 unnest(string_split(text, chr(10) || chr(10))) AS seg
               FROM docs),
         pc AS (SELECT doc_id, seg, COUNT(*) AS c, len(seg) AS ln
                FROM p WHERE len(seg) > 0 GROUP BY 1, 2),
         pa AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_paras,
                  CAST(SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT)
                    AS dup_paras,
                  CAST(SUM(c * ln) AS BIGINT) AS para_chars,
                  CAST(SUM(CASE WHEN c >= 2 THEN c * ln ELSE 0 END)
                       AS BIGINT) AS dup_para_chars
                FROM pc GROUP BY 1)
         SELECT CAST(doc_id AS BIGINT) AS doc_id, n_lines, dup_lines,
                line_chars, dup_line_chars,
                n_paras, dup_paras, para_chars, dup_para_chars
         FROM la JOIN pa USING (doc_id) ORDER BY doc_id""",
    "q189_dedup_store_purge" ->
      // property oracle (q187 precedent): the purge construction's five
      // verdict groups must all hold
      """SELECT TRUE AS purged_exact_reingests_new,
                TRUE AS unpurged_exact_still_suppressed,
                TRUE AS purged_near_reingests_new,
                TRUE AS unpurged_near_still_suppressed,
                TRUE AS fresh_still_new""",
    "q188_soft_dedup" ->
      // same md5 strata over documents + the Planted construction
      // (rebuilt literally — the q182 contract: change BOTH or neither)
      """WITH planted AS (
           SELECT unnest(range(0, 40)) AS g, NULL::BIGINT AS e
           ), pn AS (
           SELECT 900000000 + g * 10 + m AS doc_id,
                  array_to_string([concat('pg', g, 'x', j)
                                   for j in range(0, 30)] ||
                    (CASE WHEN m = 0 THEN [] ELSE [concat('pm', g, 'x', m)] END),
                    ' ') AS text,
                  'planted' AS lang
           FROM planted, unnest(range(0, 4)) AS t(m)
           WHERE m < 2 + g % 3
           ), pe AS (
           SELECT 900000000 + e * 10 + m AS doc_id,
                  array_to_string([concat('pg', e, 'x', j)
                                   for j in range(0, 12)], ' ') AS text,
                  'planted' AS lang
           FROM (SELECT unnest(range(40, 48)) AS e), unnest(range(0, 2)) AS t(m)
           ), ps AS (
           SELECT 900000000 + (48 + j) * 10 AS doc_id,
                  array_to_string([concat('pg', 48 + j, 'x', k)
                                   for k in range(0, 10 + j)], ' ') AS text,
                  'planted' AS lang
           FROM (SELECT unnest(range(0, 10)) AS j)
           ), alld AS (
           SELECT lang, text FROM documents
           UNION ALL SELECT lang, text FROM pn
           UNION ALL SELECT lang, text FROM pe
           UNION ALL SELECT lang, text FROM ps
           ), h AS (
           SELECT lang, text, md5(text) AS hh,
                  CASE WHEN length(trim(text)) = 0 THEN 0
                       ELSE len(string_split_regex(trim(text), ' +')) END AS tok
           FROM alld
           ), c AS (SELECT hh, COUNT(*) AS n_copies FROM h GROUP BY 1)
         SELECT lang, n_copies,
                CAST(COUNT(*) AS BIGINT) AS n_docs,
                CAST(COUNT(DISTINCT h.hh) AS BIGINT) AS n_contents,
                CAST(SUM(tok) AS BIGINT) AS sum_tokens
         FROM h JOIN c ON h.hh = c.hh
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "q193_ann_index_purge" ->
      // property oracle (q189/q191 precedent): the purge set would have
      // been returned (non-vacuity), is never returned post-purge, and
      // the remaining ranking holds the distance-ratio floor at full k
      // over a complete (corpus - purged) index
      """SELECT vec_id AS query_id, TRUE AS purge_tested,
                TRUE AS no_purged_returned, TRUE AS quality_floor,
                TRUE AS full_k, TRUE AS index_complete
         FROM embeddings WHERE vec_id < 5 ORDER BY vec_id""",
    "q195_gopher_line_organic" ->
      // the 50 group texts rebuilt literally (string_agg ordered by
      // doc_id, every 3rd boundary a blank line, first text re-appended
      // — the q185/q190 contract: change BOTH constructions or neither),
      // then the same pinned conventions as q190's replay: literal
      // splits, empty segments out, no trim, len() = raw characters
      """WITH d AS (SELECT doc_id % 50 AS g, text,
                      ROW_NUMBER() OVER (PARTITION BY doc_id % 50
                                         ORDER BY doc_id) - 1 AS pos
                    FROM documents WHERE len(text) > 0),
              t AS (SELECT g, string_agg(
                      CASE WHEN pos = 0 THEN ''
                           WHEN pos % 3 = 0 THEN chr(10) || chr(10)
                           ELSE chr(10) END || text, ''
                      ORDER BY pos) AS body,
                      arg_min(text, pos) AS head
                    FROM d GROUP BY g),
              f AS (SELECT g AS doc_id, body || chr(10) || head AS text
                    FROM t),
              l AS (SELECT doc_id, unnest(string_split(text, chr(10))) AS seg
                    FROM f),
              lc AS (SELECT doc_id, seg, COUNT(*) AS c, len(seg) AS ln
                     FROM l WHERE len(seg) > 0 GROUP BY 1, 2),
              la AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_lines,
                       CAST(SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT)
                         AS dup_lines,
                       CAST(SUM(c * ln) AS BIGINT) AS line_chars,
                       CAST(SUM(CASE WHEN c >= 2 THEN c * ln ELSE 0 END)
                            AS BIGINT) AS dup_line_chars
                     FROM lc GROUP BY 1),
              p AS (SELECT doc_id,
                      unnest(string_split(text, chr(10) || chr(10))) AS seg
                    FROM f),
              pc AS (SELECT doc_id, seg, COUNT(*) AS c, len(seg) AS ln
                     FROM p WHERE len(seg) > 0 GROUP BY 1, 2),
              pa AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_paras,
                       CAST(SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT)
                         AS dup_paras,
                       CAST(SUM(c * ln) AS BIGINT) AS para_chars,
                       CAST(SUM(CASE WHEN c >= 2 THEN c * ln ELSE 0 END)
                            AS BIGINT) AS dup_para_chars
                     FROM pc GROUP BY 1)
         SELECT CAST(doc_id AS BIGINT) AS doc_id, n_lines, dup_lines,
                line_chars, dup_line_chars,
                n_paras, dup_paras, para_chars, dup_para_chars
         FROM la JOIN pa USING (doc_id) ORDER BY doc_id""",
    "q194_quality_train" ->
      // the converged perceptron weights CLOSED-FORM: the construction's
      // 3-round schedule (Planted.qualityTrainRows scaladoc) ends at
      // w[f] = posCount(f) - negCount(f) = SUM(label) over gram
      // occurrences grouped by the q155 feature hash; zero rows dropped
      """WITH docs AS (
           SELECT 1 AS label,
                  array_to_string(
                    [concat('qp', g, 'x', j) for j in range(0, 8)] ||
                    ['qsh'] ||
                    [concat('qp', g, 'r') for k in range(0, 1 + g % 3)],
                    ' ') AS text
           FROM (SELECT unnest(range(0, 20)) AS g)
           UNION ALL
           SELECT -1 AS label,
                  array_to_string(
                    [concat('qn', g, 'x', j) for j in range(0, 8)] ||
                    ['qsh'] ||
                    [concat('qn', g, 'r') for k in range(0, 1 + g % 3)],
                    ' ') AS text
           FROM (SELECT unnest(range(0, 20)) AS g)),
         t AS (SELECT label,
                 [x for x in string_split_regex(trim(text), ' +')
                  if length(x) > 0] AS tk
               FROM docs),
         g AS (SELECT label, list_concat(tk,
                 [tk[i] || ' ' || tk[i+1] for i in range(1, len(tk))]) AS grams
               FROM t),
         o AS (SELECT label, unnest(grams) AS gm FROM g),
         h AS (SELECT label,
                 CAST(list_reduce([ascii(gm[i]) for i in range(1, len(gm) + 1)],
                   (a, b) -> (a * 31 + b) % 1000003) AS BIGINT) AS feat
               FROM o)
         SELECT feat, CAST(SUM(label) AS BIGINT) AS weight
         FROM h GROUP BY 1 HAVING SUM(label) <> 0 ORDER BY feat""",
    "q196_quality_trained_score" ->
      // the trained table rebuilt closed-form (q194's CTE chain), then
      // each held-out eval doc's grams joined against it — absent
      // features (cross-class boundary bigrams) contribute 0, docs with
      // no matched feature score 0
      """WITH docs AS (
           SELECT 1 AS label,
                  array_to_string(
                    [concat('qp', g, 'x', j) for j in range(0, 8)] ||
                    ['qsh'] ||
                    [concat('qp', g, 'r') for k in range(0, 1 + g % 3)],
                    ' ') AS text
           FROM (SELECT unnest(range(0, 20)) AS g)
           UNION ALL
           SELECT -1 AS label,
                  array_to_string(
                    [concat('qn', g, 'x', j) for j in range(0, 8)] ||
                    ['qsh'] ||
                    [concat('qn', g, 'r') for k in range(0, 1 + g % 3)],
                    ' ') AS text
           FROM (SELECT unnest(range(0, 20)) AS g)),
         t AS (SELECT label,
                 [x for x in string_split_regex(trim(text), ' +')
                  if length(x) > 0] AS tk
               FROM docs),
         g AS (SELECT label, list_concat(tk,
                 [tk[i] || ' ' || tk[i+1] for i in range(1, len(tk))]) AS grams
               FROM t),
         o AS (SELECT label, unnest(grams) AS gm FROM g),
         hw AS (SELECT label,
                  CAST(list_reduce([ascii(gm[i]) for i in range(1, len(gm) + 1)],
                    (a, b) -> (a * 31 + b) % 1000003) AS BIGINT) AS feat
                FROM o),
         w AS (SELECT feat, CAST(SUM(label) AS BIGINT) AS weight
               FROM hw GROUP BY 1 HAVING SUM(label) <> 0),
         ev AS (SELECT 950000200 + e AS doc_id,
                  array_to_string(
                    [concat('qp', e, 'x', j) for j in range(0,
                       CASE WHEN e % 2 = 0 THEN 4 + e % 3 ELSE 1 + e % 3 END)] ||
                    [concat('qn', e, 'x', j) for j in range(0,
                       CASE WHEN e % 2 = 0 THEN 1 + e % 3 ELSE 4 + e % 3 END)],
                    ' ') AS text
                FROM (SELECT unnest(range(0, 10)) AS e)),
         et AS (SELECT doc_id,
                  [x for x in string_split_regex(trim(text), ' +')
                   if length(x) > 0] AS tk
                FROM ev),
         eg AS (SELECT doc_id, list_concat(tk,
                  [tk[i] || ' ' || tk[i+1] for i in range(1, len(tk))]) AS grams
                FROM et),
         eo AS (SELECT doc_id, unnest(grams) AS gm FROM eg),
         eh AS (SELECT doc_id,
                  CAST(list_reduce([ascii(gm[i]) for i in range(1, len(gm) + 1)],
                    (a, b) -> (a * 31 + b) % 1000003) AS BIGINT) AS feat
                FROM eo),
         m AS (SELECT eh.doc_id, SUM(w.weight) AS mm
               FROM eh JOIN w USING (feat) GROUP BY 1)
         SELECT CAST(ev.doc_id AS BIGINT) AS doc_id,
                CAST(coalesce(m.mm, 0) AS BIGINT) AS margin_units,
                coalesce(m.mm, 0) > 0 AS kept
         FROM ev LEFT JOIN m ON ev.doc_id = m.doc_id
         ORDER BY doc_id""",
    "q197_bpe_distilled_1k" ->
      // q192's generated closed-form schedule verbatim — both trainers
      // must produce the identical 1023-merge sequence
      bpe1kScheduleOracleSql,
    "q198_quality_trained_budget" ->
      // trained weights rebuilt closed-form (q194's chain), every planted
      // doc's margin re-joined, then q161's (margin DESC, doc_id)
      // running-sum 64-token prefix replayed per lang
      """WITH docs AS (
           SELECT CAST(950000000 + g AS BIGINT) AS doc_id, 'qpos' AS lang,
                  array_to_string(
                    [concat('qp', g, 'x', j) for j in range(0, 8)] ||
                    ['qsh'] ||
                    [concat('qp', g, 'r') for k in range(0, 1 + g % 3)],
                    ' ') AS text
           FROM (SELECT unnest(range(0, 20)) AS g)
           UNION ALL
           SELECT CAST(950000100 + g AS BIGINT) AS doc_id, 'qneg' AS lang,
                  array_to_string(
                    [concat('qn', g, 'x', j) for j in range(0, 8)] ||
                    ['qsh'] ||
                    [concat('qn', g, 'r') for k in range(0, 1 + g % 3)],
                    ' ') AS text
           FROM (SELECT unnest(range(0, 20)) AS g)
           UNION ALL
           SELECT CAST(950000200 + e AS BIGINT) AS doc_id, 'qeval' AS lang,
                  array_to_string(
                    [concat('qp', e, 'x', j) for j in range(0,
                       CASE WHEN e % 2 = 0 THEN 4 + e % 3 ELSE 1 + e % 3 END)] ||
                    [concat('qn', e, 'x', j) for j in range(0,
                       CASE WHEN e % 2 = 0 THEN 1 + e % 3 ELSE 4 + e % 3 END)],
                    ' ') AS text
           FROM (SELECT unnest(range(0, 10)) AS e)),
         t AS (SELECT doc_id, lang,
                 CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                      ELSE len(string_split_regex(trim(text), ' +'))
                      END AS BIGINT) AS nt,
                 [x for x in string_split_regex(trim(text), ' +')
                  if length(x) > 0] AS tk
               FROM docs),
         g AS (SELECT doc_id, lang, nt, list_concat(tk,
                 [tk[i] || ' ' || tk[i+1] for i in range(1, len(tk))]) AS grams
               FROM t),
         o AS (SELECT doc_id, lang, unnest(grams) AS gm FROM g),
         hh AS (SELECT doc_id, lang,
                  CAST(list_reduce([ascii(gm[i]) for i in range(1, len(gm) + 1)],
                    (a, b) -> (a * 31 + b) % 1000003) AS BIGINT) AS feat
                FROM o),
         w AS (SELECT feat, CAST(SUM(CASE WHEN lang = 'qpos' THEN 1
                                          WHEN lang = 'qneg' THEN -1
                                          ELSE 0 END) AS BIGINT) AS weight
               FROM hh GROUP BY 1
               HAVING SUM(CASE WHEN lang = 'qpos' THEN 1
                               WHEN lang = 'qneg' THEN -1 ELSE 0 END) <> 0),
         m AS (SELECT hh.doc_id, SUM(w.weight) AS mm
               FROM hh JOIN w USING (feat) GROUP BY 1),
         sc AS (SELECT t.doc_id, t.lang, t.nt,
                  CAST(coalesce(m.mm, 0) AS BIGINT) AS margin
                FROM t LEFT JOIN m ON t.doc_id = m.doc_id),
         sel AS (SELECT lang, doc_id, nt, margin,
                   SUM(nt) OVER (PARTITION BY lang
                                 ORDER BY margin DESC, doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum
                 FROM sc)
         SELECT lang, COUNT(*) AS n_docs,
                CAST(SUM(nt) AS BIGINT) AS tokens,
                CAST(MIN(margin) AS BIGINT) AS cutoff_margin,
                CAST(MAX(doc_id) AS BIGINT) AS max_doc_id
         FROM sel WHERE cum <= 64 GROUP BY 1 ORDER BY lang""",
    "q199_bpe_encode_32k" ->
      // each planted doc's merge rank regenerated from the schedule
      // arithmetic (the q192/q197 generator extended with doc_id):
      // n_subwords halves exactly when the doc's pair enters the prefix
      """WITH i AS (SELECT unnest(range(0, 31)) AS i),
              w AS (SELECT unnest(range(0, 33)) AS w),
              p AS (SELECT w.w, i.i,
                      CASE WHEN i.i = 0 THEN LEAST(61, w.w)
                           ELSE LEAST((w.w + i.i) % 61, (w.w - i.i + 61) % 61)
                      END AS lo,
                      CASE WHEN i.i = 0 THEN GREATEST(61, w.w)
                           ELSE GREATEST((w.w + i.i) % 61, (w.w - i.i + 61) % 61)
                      END AS hi
                    FROM w, i),
              n AS (SELECT w, i,
                      substr('0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz',
                        CAST(lo AS INT) + 1, 1) AS lft,
                      substr('0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz',
                        CAST(hi AS INT) + 1, 1) AS rgt
                    FROM p),
              r AS (SELECT w, i,
                      ROW_NUMBER() OVER (ORDER BY w, lft, rgt) AS rnk
                    FROM n)
         SELECT CAST(940000000 + w * 31 + i AS BIGINT) AS doc_id,
                CAST(100 - 2 * w AS BIGINT) AS n_words,
                CAST(100 - 2 * w AS BIGINT) AS n_sub_full,
                CAST((100 - 2 * w) * (CASE WHEN rnk <= 500 THEN 1 ELSE 2 END)
                     AS BIGINT) AS n_sub_500
         FROM r ORDER BY doc_id""",
    "q200_ann_drift_audit" ->
      // property oracle (q187/q191 precedent — coarse centroids are
      // engine-internal): the organic held-out batch must NOT trip the
      // monitor, the fixed-direction batch MUST (its tvd is 1 minus one
      // list's training share by construction); n_batch is replayable
      """SELECT 'control' AS batch_tag, COUNT(*) AS n_batch,
                FALSE AS share_drifted, FALSE AS retrain
         FROM embeddings WHERE vec_id % 5 = 4
         UNION ALL
         SELECT 'shifted', COUNT(*), TRUE, TRUE
         FROM embeddings WHERE vec_id % 5 = 4
         ORDER BY batch_tag""",
    "q201_quality_train_averaged" ->
      // the 8-round averaged weights closed-form: per gram OCCURRENCE,
      // +8 if its doc is positive, −7 if negative, +3 more if it sits
      // in the duplicated text (the 2-cycle's alternating-sum residue
      // (6+4+2)−(5+3+1) = 3 — derivation in trainAveraged's scaladoc)
      s"""WITH $avgWeightsCteSql
         SELECT feat, weight_sum FROM w ORDER BY feat""",
    "q202_quality_averaged_score" ->
      // q196's eval-doc scoring chain under the averaged table: same
      // gram extraction, SUM(weight_sum) per doc, absent features 0
      s"""WITH $avgWeightsCteSql,
         ev AS (SELECT 950000200 + e AS doc_id,
                  array_to_string(
                    [concat('qp', e, 'x', j) for j in range(0,
                       CASE WHEN e % 2 = 0 THEN 4 + e % 3 ELSE 1 + e % 3 END)] ||
                    [concat('qn', e, 'x', j) for j in range(0,
                       CASE WHEN e % 2 = 0 THEN 1 + e % 3 ELSE 4 + e % 3 END)],
                    ' ') AS text
                FROM (SELECT unnest(range(0, 10)) AS e)),
         et AS (SELECT doc_id,
                  [x for x in string_split_regex(trim(text), ' +')
                   if length(x) > 0] AS tk
                FROM ev),
         eg AS (SELECT doc_id, list_concat(tk,
                  [tk[i] || ' ' || tk[i+1] for i in range(1, len(tk))]) AS grams
                FROM et),
         eo AS (SELECT doc_id, unnest(grams) AS gm FROM eg),
         eh AS (SELECT doc_id,
                  CAST(list_reduce([ascii(gm[i]) for i in range(1, len(gm) + 1)],
                    (a, b) -> (a * 31 + b) % 1000003) AS BIGINT) AS feat
                FROM eo),
         m AS (SELECT eh.doc_id, SUM(w.weight_sum) AS mm
               FROM eh JOIN w USING (feat) GROUP BY 1)
         SELECT CAST(ev.doc_id AS BIGINT) AS doc_id,
                CAST(coalesce(m.mm, 0) AS BIGINT) AS margin_units,
                coalesce(m.mm, 0) > 0 AS kept
         FROM ev LEFT JOIN m ON ev.doc_id = m.doc_id
         ORDER BY doc_id""",
    "q203_quality_averaged_budget" ->
      // q198's pool and (margin DESC, doc_id) 64-token prefix, margins
      // from the averaged table (the flipped duplicate trains the
      // weights but is NOT in the selection pool)
      s"""WITH $avgWeightsCteSql,
         docs AS (
           SELECT CAST(950000000 + g AS BIGINT) AS doc_id, 'qpos' AS lang,
                  array_to_string(
                    [concat('qp', g, 'x', j) for j in range(0, 8)] ||
                    ['qsh'] ||
                    [concat('qp', g, 'r') for k in range(0, 1 + g % 3)],
                    ' ') AS text
           FROM (SELECT unnest(range(0, 20)) AS g)
           UNION ALL
           SELECT CAST(950000100 + g AS BIGINT) AS doc_id, 'qneg' AS lang,
                  array_to_string(
                    [concat('qn', g, 'x', j) for j in range(0, 8)] ||
                    ['qsh'] ||
                    [concat('qn', g, 'r') for k in range(0, 1 + g % 3)],
                    ' ') AS text
           FROM (SELECT unnest(range(0, 20)) AS g)
           UNION ALL
           SELECT CAST(950000200 + e AS BIGINT) AS doc_id, 'qeval' AS lang,
                  array_to_string(
                    [concat('qp', e, 'x', j) for j in range(0,
                       CASE WHEN e % 2 = 0 THEN 4 + e % 3 ELSE 1 + e % 3 END)] ||
                    [concat('qn', e, 'x', j) for j in range(0,
                       CASE WHEN e % 2 = 0 THEN 1 + e % 3 ELSE 4 + e % 3 END)],
                    ' ') AS text
           FROM (SELECT unnest(range(0, 10)) AS e)),
         t AS (SELECT doc_id, lang,
                 CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                      ELSE len(string_split_regex(trim(text), ' +'))
                      END AS BIGINT) AS nt,
                 [x for x in string_split_regex(trim(text), ' +')
                  if length(x) > 0] AS tk
               FROM docs),
         g AS (SELECT doc_id, lang, nt, list_concat(tk,
                 [tk[i] || ' ' || tk[i+1] for i in range(1, len(tk))]) AS grams
               FROM t),
         o AS (SELECT doc_id, lang, unnest(grams) AS gm FROM g),
         hh AS (SELECT doc_id, lang,
                  CAST(list_reduce([ascii(gm[i]) for i in range(1, len(gm) + 1)],
                    (a, b) -> (a * 31 + b) % 1000003) AS BIGINT) AS feat
                FROM o),
         m AS (SELECT hh.doc_id, SUM(w.weight_sum) AS mm
               FROM hh JOIN w USING (feat) GROUP BY 1),
         sc AS (SELECT t.doc_id, t.lang, t.nt,
                  CAST(coalesce(m.mm, 0) AS BIGINT) AS margin
                FROM t LEFT JOIN m ON t.doc_id = m.doc_id),
         sel AS (SELECT lang, doc_id, nt, margin,
                   SUM(nt) OVER (PARTITION BY lang
                                 ORDER BY margin DESC, doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum
                 FROM sc)
         SELECT lang, COUNT(*) AS n_docs,
                CAST(SUM(nt) AS BIGINT) AS tokens,
                CAST(MIN(margin) AS BIGINT) AS cutoff_margin,
                CAST(MAX(doc_id) AS BIGINT) AS max_doc_id
         FROM sel WHERE cum <= 64 GROUP BY 1 ORDER BY lang""",
    "q204_bpe_encode_ids" ->
      // id sequences regenerated from the schedule arithmetic: merge
      // ranks map to 61+rnk (base block 0..61 = the ASCII-sorted
      // alphabet index — lo/hi ARE the base ids), prefix-unmerged words
      // emit (lo, hi) at positions (2k, 2k+1)
      """WITH i AS (SELECT unnest(range(0, 31)) AS i),
              w AS (SELECT unnest(range(0, 33)) AS w),
              p AS (SELECT w.w, i.i,
                      CASE WHEN i.i = 0 THEN LEAST(61, w.w)
                           ELSE LEAST((w.w + i.i) % 61, (w.w - i.i + 61) % 61)
                      END AS lo,
                      CASE WHEN i.i = 0 THEN GREATEST(61, w.w)
                           ELSE GREATEST((w.w + i.i) % 61, (w.w - i.i + 61) % 61)
                      END AS hi
                    FROM w, i),
              n AS (SELECT w, i, lo, hi,
                      substr('0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz',
                        CAST(lo AS INT) + 1, 1) AS lft,
                      substr('0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz',
                        CAST(hi AS INT) + 1, 1) AS rgt
                    FROM p),
              r AS (SELECT w, i, lo, hi,
                      ROW_NUMBER() OVER (ORDER BY w, lft, rgt) AS rnk
                    FROM n),
              d AS (SELECT CAST(940000000 + w * 31 + i AS BIGINT) AS doc_id,
                      w, lo, hi, rnk
                    FROM r),
              fullv AS (SELECT 'full' AS variant, doc_id,
                          unnest(range(0, 100 - 2 * w)) AS pos,
                          61 + rnk AS token_id
                        FROM d),
              p500m AS (SELECT 'p500' AS variant, doc_id,
                          unnest(range(0, 100 - 2 * w)) AS pos,
                          61 + rnk AS token_id
                        FROM d WHERE rnk <= 500),
              p500u AS (SELECT doc_id, lo, hi,
                          unnest(range(0, 100 - 2 * w)) AS k
                        FROM d WHERE rnk > 500),
              p500ux AS (SELECT 'p500' AS variant, doc_id, 2 * k AS pos,
                           lo AS token_id
                         FROM p500u
                         UNION ALL
                         SELECT 'p500', doc_id, 2 * k + 1, hi FROM p500u)
         SELECT variant, doc_id, CAST(pos AS INT) AS pos,
                CAST(token_id AS INT) AS token_id
         FROM (SELECT * FROM fullv UNION ALL SELECT * FROM p500m
               UNION ALL SELECT * FROM p500ux)
         ORDER BY variant, doc_id, pos""",
    "q205_jpeg_decode" ->
      // JpegCodec.imageParams re-derived literally: w = (n_chars%4+2)*16,
      // h = (doc_id%6+2)*8, gray halves vA = doc_id%256 /
      // vB = (doc_id*7+13)%256 — r = g = b by construction
      """SELECT doc_id AS media_id,
                CAST((n_chars % 4 + 2) * 16 AS INTEGER) AS width,
                CAST((doc_id % 6 + 2) * 8 AS INTEGER) AS height,
                CAST((n_chars % 4 + 2) * 16 * (doc_id % 6 + 2) * 8 AS BIGINT)
                  AS n_pixels,
                CAST(((doc_id % 256) + ((doc_id * 7 + 13) % 256))
                     * ((n_chars % 4 + 2) * 8) * ((doc_id % 6 + 2) * 8)
                     AS BIGINT) AS sum_r,
                CAST(((doc_id % 256) + ((doc_id * 7 + 13) % 256))
                     * ((n_chars % 4 + 2) * 8) * ((doc_id % 6 + 2) * 8)
                     AS BIGINT) AS sum_g,
                CAST(((doc_id % 256) + ((doc_id * 7 + 13) % 256))
                     * ((n_chars % 4 + 2) * 8) * ((doc_id % 6 + 2) * 8)
                     AS BIGINT) AS sum_b
         FROM documents WHERE doc_id % 3 = 0 ORDER BY media_id""",
    "q206_image_dedup_store" ->
      // property oracle (q189's precedent — payload bytes and aHash are
      // engine-internal): every planted verdict is pinned by the
      // two-tone construction
      """SELECT TRUE AS exact_copy_suppressed, TRUE AS batch_canonical_new,
                TRUE AS batch_dup_labeled, TRUE AS near_variant_suppressed,
                TRUE AS fresh_new""",
    "q207_sequence_pack" ->
      // the pack replayed as a window cumsum (fine at DuckDB scale; the
      // engine side uses the two-pass distributed prefix sum): exclusive
      // start offsets in doc_id order, each doc exploded onto the
      // sequences it touches, per-sequence overlap arithmetic
      """WITH t AS (SELECT doc_id,
                      CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                           ELSE len(string_split_regex(trim(text), ' +'))
                           END AS BIGINT) AS nt
                    FROM documents),
              o AS (SELECT doc_id, nt,
                      CAST(SUM(nt) OVER (ORDER BY doc_id
                                         ROWS UNBOUNDED PRECEDING) - nt
                           AS BIGINT) AS s
                    FROM t WHERE nt > 0),
              e AS (SELECT doc_id, nt, s,
                      unnest(range(s // 512, (s + nt - 1) // 512 + 1)) AS seq_id
                    FROM o)
         SELECT seq_id, COUNT(*) AS n_docs,
                CAST(SUM(LEAST((seq_id + 1) * 512, s + nt)
                         - GREATEST(seq_id * 512, s)) AS BIGINT) AS n_tokens,
                MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
         FROM e GROUP BY 1 ORDER BY seq_id""",
    "q208_bpe_pack" ->
      // both stages regenerated: n_ids = 100 − 2w under the full merge
      // table (every planted word is one merge output), then the q207
      // pack arithmetic at capacity 128 in doc_id order
      """WITH t AS (SELECT CAST(940000000 + w.w * 31 + i.i AS BIGINT) AS doc_id,
                      CAST(100 - 2 * w.w AS BIGINT) AS nt
                    FROM (SELECT unnest(range(0, 33)) AS w) w,
                         (SELECT unnest(range(0, 31)) AS i) i),
              o AS (SELECT doc_id, nt,
                      CAST(SUM(nt) OVER (ORDER BY doc_id
                                         ROWS UNBOUNDED PRECEDING) - nt
                           AS BIGINT) AS s
                    FROM t WHERE nt > 0),
              e AS (SELECT doc_id, nt, s,
                      unnest(range(s // 128, (s + nt - 1) // 128 + 1)) AS seq_id
                    FROM o)
         SELECT seq_id, COUNT(*) AS n_docs,
                CAST(SUM(LEAST((seq_id + 1) * 128, s + nt)
                         - GREATEST(seq_id * 128, s)) AS BIGINT) AS n_tokens,
                MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
         FROM e GROUP BY 1 ORDER BY seq_id""",
    "q209_stream_store_ingest" ->
      // property oracle (q189's precedent): every cross-batch verdict is
      // pinned by Planted.streamIngestRows' construction
      """SELECT TRUE AS seed_new, TRUE AS cross_batch_exact_suppressed,
                TRUE AS cross_batch_near_suppressed,
                TRUE AS batch_canonical_new, TRUE AS within_batch_dup_labeled,
                TRUE AS appended_batches_suppress, TRUE AS fresh_new,
                TRUE AS three_batches""",
    "q210_pack_manifest" ->
      // increment-equals-batch, proved by the oracle itself: the grown
      // manifest must reproduce q207's batch cumsum over the WHOLE
      // corpus — same SQL, capacity 512
      """WITH t AS (SELECT doc_id,
                      CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                           ELSE len(string_split_regex(trim(text), ' +'))
                           END AS BIGINT) AS nt
                    FROM documents),
              o AS (SELECT doc_id, nt,
                      CAST(SUM(nt) OVER (ORDER BY doc_id
                                         ROWS UNBOUNDED PRECEDING) - nt
                           AS BIGINT) AS s
                    FROM t WHERE nt > 0),
              e AS (SELECT doc_id, nt, s,
                      unnest(range(s // 512, (s + nt - 1) // 512 + 1)) AS seq_id
                    FROM o)
         SELECT seq_id, COUNT(*) AS n_docs,
                CAST(SUM(LEAST((seq_id + 1) * 512, s + nt)
                         - GREATEST(seq_id * 512, s)) AS BIGINT) AS n_tokens,
                MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
         FROM e GROUP BY 1 ORDER BY seq_id""",
    "q211_stream_store_restart" ->
      // q209's bits plus the restart accounting: TRUE across the board
      """SELECT TRUE AS seed_new, TRUE AS cross_batch_exact_suppressed,
                TRUE AS cross_batch_near_suppressed,
                TRUE AS batch_canonical_new, TRUE AS within_batch_dup_labeled,
                TRUE AS appended_batches_suppress, TRUE AS fresh_new,
                TRUE AS three_batches, TRUE AS exactly_once"""
  )

  /** q184's oracle: the Gopher n-gram battery replayed rule by rule in
    * SQL — per-doc gram counts, `c x len(g)` for the top-2/3/4 winner
    * ((count desc, gram bytewise-asc) tie-break, DuckDB's binary
    * collation = the kernel's UTF-8 byte compare), and position-union
    * coverage for dup-5..10 (distinct covered 1-based token positions
    * joined back to `len(a[p])`). Flags are exact-integer
    * `num x 100 > total x pct`.
    */
  /** The q192/q197 shared oracle: the planted 1-factorization corpus's
    * full 1023-merge schedule GENERATED from its own modular arithmetic
    * (wave w = circle-method matching, count 100−2w, global order =
    * wave then binary-lexicographic pair). Both the batched cluster
    * trainer and the distilled local trainer are pinned to this exact
    * sequence.
    */
  /** q201/q202/q203's shared CTE: the 8-round AVERAGED weights over the
    * noisy (duplicate-flipped) planted set, closed-form. Per gram
    * occurrence: +8 when its doc is positive, −7 when negative, +3 more
    * when it sits in the duplicated text — rounds·pos −
    * (rounds−1)·neg + ((rounds−2)/2)·dup at rounds = 8 (the 2-cycle
    * residue; derivation in QualityTrainer.trainAveraged's scaladoc).
    */
  private val avgWeightsCteSql: String =
    """wdocs AS (
           SELECT 1 AS label, FALSE AS isdup,
                  array_to_string(
                    [concat('qp', g, 'x', j) for j in range(0, 8)] ||
                    ['qsh'] ||
                    [concat('qp', g, 'r') for k in range(0, 1 + g % 3)],
                    ' ') AS text
           FROM (SELECT unnest(range(0, 20)) AS g)
           UNION ALL
           SELECT -1, FALSE,
                  array_to_string(
                    [concat('qn', g, 'x', j) for j in range(0, 8)] ||
                    ['qsh'] ||
                    [concat('qn', g, 'r') for k in range(0, 1 + g % 3)],
                    ' ')
           FROM (SELECT unnest(range(0, 20)) AS g)
           UNION ALL
           SELECT -1, TRUE,
                  array_to_string(
                    [concat('qp0x', j) for j in range(0, 8)] ||
                    ['qsh'] || ['qp0r'], ' ')),
         wt AS (SELECT label, isdup,
                  [x for x in string_split_regex(trim(text), ' +')
                   if length(x) > 0] AS tk
                FROM wdocs),
         wg AS (SELECT label, isdup, list_concat(tk,
                  [tk[i] || ' ' || tk[i+1] for i in range(1, len(tk))]) AS grams
                FROM wt),
         wo AS (SELECT label, isdup, unnest(grams) AS gm FROM wg),
         wh AS (SELECT label, isdup,
                  CAST(list_reduce([ascii(gm[i]) for i in range(1, len(gm) + 1)],
                    (a, b) -> (a * 31 + b) % 1000003) AS BIGINT) AS feat
                FROM wo),
         wsum AS (SELECT feat,
                    CAST(SUM(CASE WHEN label = 1 THEN 8 ELSE -7 END) +
                         3 * SUM(CASE WHEN isdup THEN 1 ELSE 0 END)
                         AS BIGINT) AS weight_sum
                  FROM wh GROUP BY 1),
         w AS (SELECT feat, weight_sum FROM wsum WHERE weight_sum <> 0)"""

  private val bpe1kScheduleOracleSql: String =
    """WITH i AS (SELECT unnest(range(0, 31)) AS i),
            w AS (SELECT unnest(range(0, 33)) AS w),
            p AS (SELECT w.w, i.i,
                    CASE WHEN i.i = 0 THEN LEAST(61, w.w)
                         ELSE LEAST((w.w + i.i) % 61, (w.w - i.i + 61) % 61)
                    END AS lo,
                    CASE WHEN i.i = 0 THEN GREATEST(61, w.w)
                         ELSE GREATEST((w.w + i.i) % 61, (w.w - i.i + 61) % 61)
                    END AS hi
                  FROM w, i),
            n AS (SELECT w,
                    substr('0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz',
                      CAST(lo AS INT) + 1, 1) AS lft,
                    substr('0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz',
                      CAST(hi AS INT) + 1, 1) AS rgt,
                    CAST(100 - 2 * w AS BIGINT) AS pair_count
                  FROM p)
       SELECT CAST(ROW_NUMBER() OVER (ORDER BY w, lft, rgt) AS INT)
                AS round,
              lft AS "left", rgt AS "right", pair_count
       FROM n ORDER BY round"""

  private def gopherOracleSql: String = {
    val rules = graft.operators.GopherRepetition.Rules
    val flags = rules.map { case (name, _, pct) =>
      val src = if (name.startsWith("top")) "t" + name.drop(3) else "d" + name.drop(3)
      s"COALESCE($src.num, 0) * 100 > b.total * $pct"
    }
    val perRule = rules.zip(flags).map { case ((name, _, _), f) =>
      s"CAST(SUM(CASE WHEN $f THEN 1 ELSE 0 END) AS BIGINT) AS n_$name"
    }
    s"""WITH base AS (SELECT doc_id, lang,
                        string_split_regex(trim(text), ' +') AS a,
                        list_sum([len(x)
                                  for x in string_split_regex(trim(text), ' +')])
                          AS total
                      FROM documents),
         $gopherBatteryCtes
         SELECT b.lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
                ${perRule.mkString(",\n                ")},
                CAST(SUM(CASE WHEN ${flags.mkString(" OR ")}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
         FROM base b $gopherBatteryJoins
         GROUP BY 1 ORDER BY 1"""
  }

  /** q185's oracle: [[graft.Planted.gopherDocRows]] rebuilt literally in
    * SQL (block-twice-plus-filler per n = 5..10, all-unique control),
    * then the same battery CTEs emit the per-doc numerators.
    */
  private def gopherPlantedOracleSql: String = {
    val numCols = graft.operators.GopherRepetition.Rules.map { case (name, _, _) =>
      val src = if (name.startsWith("top")) "t" + name.drop(3) else "d" + name.drop(3)
      s"CAST(COALESCE($src.num, 0) AS BIGINT) AS ${name}_chars"
    }
    s"""WITH planted AS (
           SELECT CAST(920000000 + n AS BIGINT) AS doc_id,
                  array_to_string(
                    [concat('gp', n, 'x', j) for j in range(0, n)] ||
                    [concat('gp', n, 'x', j) for j in range(0, n)] ||
                    [concat('gq', n, 'y', j) for j in range(0, n)], ' ') AS text
           FROM (SELECT unnest(range(5, 11)) AS n)
           UNION ALL
           SELECT CAST(920000100 AS BIGINT) AS doc_id,
                  array_to_string(['gc0z' || j for j in range(0, 30)], ' ') AS text),
         base AS (SELECT doc_id,
                    string_split_regex(trim(text), ' +') AS a,
                    list_sum([len(x)
                              for x in string_split_regex(trim(text), ' +')])
                      AS total
                  FROM planted),
         $gopherBatteryCtes
         SELECT b.doc_id, CAST(b.total AS BIGINT) AS total_chars,
                ${numCols.mkString(",\n                ")}
         FROM base b $gopherBatteryJoins
         ORDER BY b.doc_id"""
  }

  /** The nine per-doc rule CTEs shared by the q184/q185 oracles; expects
    * a CTE `base(doc_id, a, total, ...)` in scope.
    */
  private def gopherBatteryCtes: String = {
    def topCte(n: Int) =
      s"""g$n AS (SELECT doc_id, unnest([array_to_string(a[i:i+${n - 1}], ' ')
                                  for i in range(1, len(a) - ${n - 2})]) AS g
                 FROM base WHERE len(a) >= $n),
         c$n AS (SELECT doc_id, g, COUNT(*) AS c FROM g$n GROUP BY 1, 2),
         t$n AS (SELECT doc_id, c * len(g) AS num FROM (
                   SELECT doc_id, g, c, ROW_NUMBER() OVER (
                     PARTITION BY doc_id ORDER BY c DESC, g ASC) AS rn
                   FROM c$n) WHERE rn = 1)"""
    def dupCte(n: Int) =
      s"""p$n AS (SELECT doc_id, st.i AS i, st.g AS g FROM (
                   SELECT doc_id,
                          unnest([{'i': i,
                                   'g': array_to_string(a[i:i+${n - 1}], ' ')}
                                  for i in range(1, len(a) - ${n - 2})]) AS st
                   FROM base WHERE len(a) >= $n)),
         r$n AS (SELECT doc_id, g FROM (
                   SELECT doc_id, g, COUNT(*) AS c FROM p$n GROUP BY 1, 2)
                 WHERE c >= 2),
         v$n AS (SELECT DISTINCT doc_id, p FROM (
                   SELECT p$n.doc_id,
                          unnest([p$n.i + o for o in range(0, $n)]) AS p
                   FROM p$n JOIN r$n USING (doc_id, g))),
         d$n AS (SELECT v.doc_id, SUM(len(b.a[v.p])) AS num
                 FROM v$n v JOIN base b USING (doc_id) GROUP BY 1)"""
    (Seq(2, 3, 4).map(topCte) ++ (5 to 10).map(dupCte))
      .mkString(",\n         ")
  }

  /** One row per doc from each rule CTE — pairs with [[gopherBatteryCtes]]
    * and a `base b` FROM alias.
    */
  private def gopherBatteryJoins: String =
    (Seq(2, 3, 4).map(n => s"LEFT JOIN t$n USING (doc_id)") ++
      (5 to 10).map(n => s"LEFT JOIN d$n USING (doc_id)")).mkString(" ")

  /** Shared oracle for the two exact-kNN forms (window and bounded-agg
    * implementations have the identical output contract).
    */
  private val knnOracleSql: String =
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
              q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 5),
              scored AS (
                SELECT q.qid, e.vec_id nid,
                       list_sum([e.v[i] * q.qv[i] for i in range(1, len(e.v) + 1)])
                         / (sqrt(list_sum([x * x for x in e.v]))
                            * sqrt(list_sum([x * x for x in q.qv]))) AS cos
                FROM e, q WHERE e.vec_id <> q.qid)
         SELECT qid AS query_id, nid AS neighbor_id,
                round(cos, 6) AS cosine, CAST(rk AS INTEGER) AS rank
         FROM (SELECT qid, nid, cos,
                      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, nid) rk
               FROM scored) t
         WHERE rk <= 3 ORDER BY query_id, rank"""

  /** q149's oracle: all `n` BPE rounds unrolled as chained CTEs (the
    * q132 unrolling pattern) — same wrapped-symbol encoding, same
    * frequency-weighted pair count, same (count desc, binary string)
    * tie-break, same literal-replace merge as `operators.BpeTrainer`.
    * Every CTE is MATERIALIZED: DuckDB inlines plain CTEs per reference
    * and each round references its predecessor twice, so an uninlined
    * 64-round chain re-executes the scan exponentially ("too many open
    * files" long before any answer).
    */
  private def bpeOracleSql(n: Int): String = {
    val sb = new StringBuilder
    sb.append(
      """WITH w0 AS MATERIALIZED (SELECT regexp_replace(token, '(.)', '<\1>', 'g') AS enc,
                            COUNT(*) AS freq
                     FROM (SELECT unnest(string_split_regex(trim(text), ' +'))
                             AS token
                           FROM documents)
                     WHERE length(token) > 0 AND token NOT LIKE '%<%'
                       AND token NOT LIKE '%>%'
                     GROUP BY 1)""")
    for (r <- 1 to n) {
      sb.append(s""",
         p$r AS MATERIALIZED (SELECT s[i] AS lft, s[i + 1] AS rgt, SUM(freq) AS cnt
                 FROM (SELECT freq, s, unnest(range(1, len(s))) AS i
                       FROM (SELECT freq,
                               string_split(trim(enc, '<>'), '><') AS s
                             FROM w${r - 1}))
                 GROUP BY 1, 2),
         m$r AS MATERIALIZED (SELECT lft, rgt, cnt FROM p$r
                 ORDER BY cnt DESC, lft, rgt LIMIT 1),
         w$r AS MATERIALIZED (SELECT replace(enc, '<' || m.lft || '><' || m.rgt || '>',
                                '<' || m.lft || m.rgt || '>') AS enc, freq
                 FROM w${r - 1}, m$r m)""")
    }
    sb.append("\n SELECT * FROM (")
    sb.append((1 to n).map(r =>
      s"""SELECT $r AS round, lft AS "left", rgt AS "right",
            CAST(cnt AS BIGINT) AS pair_count FROM m$r""").mkString(" UNION ALL "))
    sb.append(") ORDER BY round")
    sb.toString
  }

  /** q150's oracle: the same `n` unrolled training rounds, then the merge
    * chain applied to the distinct token table (literal nested replaces
    * with each round's pair read via scalar subquery) and joined back
    * onto the token stream for per-doc subword counts.
    */
  private def bpeEncodeOracleSql(n: Int): String = {
    val rounds = {
      val sb = new StringBuilder
      sb.append(bpeOracleSql(n))
      sb.delete(sb.indexOf("\n SELECT * FROM ("), sb.length)
      sb.toString
    }
    val nested = (1 to n).foldLeft(
      """regexp_replace(token, '(.)', '<\1>', 'g')""") { (acc, r) =>
      s"replace($acc, '<' || (SELECT lft FROM m$r) || '><' || " +
        s"(SELECT rgt FROM m$r) || '>', '<' || (SELECT lft FROM m$r) || " +
        s"(SELECT rgt FROM m$r) || '>')"
    }
    rounds + s""",
       toks AS (SELECT doc_id, token
                FROM (SELECT doc_id,
                        unnest(string_split_regex(trim(text), ' +')) AS token
                      FROM documents)
                WHERE length(token) > 0 AND token NOT LIKE '%<%'
                  AND token NOT LIKE '%>%'),
       sized AS (SELECT token,
                   len(string_split(trim($nested, '<>'), '><')) AS n_sub
                 FROM (SELECT DISTINCT token FROM toks))
       SELECT t.doc_id, COUNT(*) AS n_words,
              CAST(SUM(s.n_sub) AS BIGINT) AS n_subwords
       FROM toks t JOIN sized s USING (token)
       GROUP BY 1 ORDER BY doc_id"""
  }

  /** SQL mirror of [[KMeansMR.assignExpr]] over the shared integral
    * centroids: same first-index-wins CASE WHEN argmin, same arithmetic.
    */
  private def kmDistSql(c: Array[Double]): String =
    s"((hour - ${c(0)}) * (hour - ${c(0)}) + (dow - ${c(1)}) * (dow - ${c(1)}))"

  private def kmAssignCaseSql: String = {
    val ds = kmCentroids.map(kmDistSql)
    val n = ds.length
    val branches = (0 until n - 1).map { j =>
      val rest = (j + 1 until n).map(ds)
      val minRest = if (rest.length == 1) rest.head else s"LEAST(${rest.mkString(", ")})"
      s"WHEN ${ds(j)} <= $minRest THEN $j"
    }
    s"CASE ${branches.mkString(" ")} ELSE ${n - 1} END"
  }

  private def kmPointsSql: String =
    """SELECT CAST(hour(ts) AS DOUBLE) AS hour,
              CAST(dayofweek(ts) AS DOUBLE) AS dow
       FROM events"""

  private def kmAssignSql: String =
    s"""WITH pts AS ($kmPointsSql),
            assigned AS (SELECT hour, dow, $kmAssignCaseSql AS cluster FROM pts)
        SELECT cluster, COUNT(*) AS n_points,
               SUM(hour) / COUNT(*) AS mean_hour,
               SUM(dow) / COUNT(*) AS mean_dow
        FROM assigned GROUP BY cluster ORDER BY cluster"""

  private def kmWcssSql: String = {
    val ds = kmCentroids.map(kmDistSql)
    s"""WITH pts AS ($kmPointsSql)
        SELECT SUM(LEAST(${ds.mkString(", ")})) AS wcss, COUNT(*) AS n_points
        FROM pts"""
  }

  /** DuckDB mirror of q41: per-k WCSS over the fixed [[sweepCentroids]],
    * then the reference's elbow arithmetic (argmin of the second discrete
    * difference, first-wins ties → ORDER BY d2, k) in plain SQL.
    */
  private def elbowSweepSql: String = {
    def dist(c: Array[Double]) = s"(hour - ${c(0)}) * (hour - ${c(0)})"
    val perK = sweepCentroids.map { case (k, cs) =>
      s"SELECT $k AS k, SUM(LEAST(${cs.map(dist).mkString(", ")})) AS wcss FROM pts"
    }.mkString(" UNION ALL ")
    s"""WITH pts AS (SELECT CAST(hour(ts) AS DOUBLE) AS hour FROM events),
            w AS ($perK),
            d AS (SELECT k, wcss,
                         lead(wcss, 1) OVER (ORDER BY k) AS w1,
                         lead(wcss, 2) OVER (ORDER BY k) AS w2 FROM w),
            dd AS (SELECT k, wcss - 2 * w1 + w2 AS d2 FROM d WHERE w2 IS NOT NULL),
            e AS (SELECT k FROM dd ORDER BY d2, k LIMIT 1)
        SELECT CAST(w.k AS INTEGER) AS k, w.wcss, CAST(e.k AS INTEGER) AS elbow_k
        FROM w, e ORDER BY w.k"""
  }

  /** DuckDB mirror of the full Lloyd's loop (q40/q43): `maxIter` unrolled
    * assign→update stages over weighted (hour, dow) cells (≤ 24·7 rows per
    * stage). Bit-exact vs the Spark side because every summed value is an
    * integral double (exact regardless of summation order), so each centroid
    * is the same exact-integer-sum / count in both engines, and the argmin
    * comparisons then see identical doubles. Assignment ties break
    * first-index-wins via ORDER BY (dist, cluster) — mirrors
    * [[KMeansMR.assignExpr]]'s `<=` CASE. `iterations`/`converged` replicate
    * KMeansMR.fit's exact-equality convergence: iterations = first stage
    * whose centroids equal the previous stage's (monotone once true), else
    * maxIter; converged = equality held by the last stage.
    */
  private def kmLloydSql(maxIter: Int = 10): String = {
    val k = kmCentroids.length
    val init = kmCentroids.zipWithIndex.map { case (c, i) =>
      s"($i, CAST(${c(0)} AS DOUBLE), CAST(${c(1)} AS DOUBLE))"
    }.mkString(", ")
    val stages = (1 to maxIter).map { i =>
      s"""a$i AS (
            SELECT h, d, n, cluster FROM (
              SELECT w.h, w.d, w.n, c.cluster,
                     ROW_NUMBER() OVER (PARTITION BY w.h, w.d
                       ORDER BY (w.h - c.ch) * (w.h - c.ch)
                              + (w.d - c.cd) * (w.d - c.cd) ASC,
                              c.cluster ASC) AS rk
              FROM w CROSS JOIN c${i - 1} c) WHERE rk = 1),
          c$i AS (SELECT cluster,
                         SUM(h * n) / SUM(n) AS ch,
                         SUM(d * n) / SUM(n) AS cd
                  FROM a$i GROUP BY cluster),
          e$i AS (SELECT (SELECT COUNT(*) FROM c$i x JOIN c${i - 1} y
                          ON x.cluster = y.cluster AND x.ch = y.ch AND x.cd = y.cd)
                         = $k AS same)"""
    }.mkString(",\n")
    val firstSame = (1 to maxIter)
      .map(i => s"WHEN (SELECT same FROM e$i) THEN $i").mkString(" ")
    s"""WITH w AS (SELECT CAST(hour(ts) AS DOUBLE) AS h,
                          CAST(dayofweek(ts) AS DOUBLE) AS d,
                          COUNT(*) AS n
                   FROM events GROUP BY 1, 2),
            c0(cluster, ch, cd) AS (VALUES $init),
            $stages
        SELECT CAST(c.cluster AS INTEGER) AS cluster, c.ch AS hour, c.cd AS dow,
               CAST(CASE $firstSame ELSE $maxIter END AS INTEGER) AS iterations,
               (SELECT same FROM e$maxIter) AS converged
        FROM c$maxIter c ORDER BY cluster"""
  }

  /** DuckDB mirror of the q46 array K-means (fixed first-k-by-id init,
    * `maxIter` unrolled iterations over 64-dim vectors). Centroids drift at
    * ULP between engines (non-integral double sums), but the compared output
    * is cluster COUNTS, which only change if an assignment flips — margins
    * are real, so the counts are deterministic across engines.
    */
  private def arrayKmSql(k: Int = 5, maxIter: Int = 5, dim: Int = 64): String = {
    def assign(prev: String, out: String) =
      s"""$out AS (SELECT vec_id, v, cluster FROM (
            SELECT e.vec_id, e.v, c.cluster,
                   ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
                     list_sum([(e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i])
                               for i in range(1, ${dim + 1})]) ASC,
                     c.cluster ASC) AS rk
            FROM e CROSS JOIN $prev c) WHERE rk = 1)"""
    def update(a: String, out: String) =
      s"""$out AS (SELECT cluster, list(mn ORDER BY dim) AS cv FROM (
            SELECT cluster, i AS dim, SUM(v[i]) / COUNT(*) AS mn
            FROM $a, range(1, ${dim + 1}) t(i) GROUP BY 1, 2) GROUP BY cluster)"""
    val stages = (1 to maxIter)
      .map(i => s"${assign(s"c${i - 1}", s"a$i")},\n${update(s"a$i", s"c$i")}")
      .mkString(",\n")
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
            c0 AS (SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cluster, v AS cv
                   FROM e WHERE vec_id < $k),
            $stages,
            ${assign(s"c$maxIter", "fin")}
        SELECT CAST(cluster AS INTEGER) AS cluster, COUNT(*) AS n_vectors
        FROM fin GROUP BY 1 ORDER BY cluster"""
  }

  /** SQL mirror of [[TextFunctions.langId]] with the default lexicons. */
  private def langIdSql: String = {
    def hits(words: Seq[String]): String =
      s"len(regexp_extract_all(lower(text), '\\b(${words.mkString("|")})\\b'))"
    val scores = TextFunctions.defaultLexicons.map { case (lang, ws) => (lang, hits(ws)) }
    val cols = scores.map { case (lang, e) => s"CAST($e AS INTEGER) AS ${lang}_h" }.mkString(", ")
    val best = s"GREATEST(${scores.map(s => s"${s._1}_h").mkString(", ")})"
    val caseExpr = scores.map { case (lang, _) =>
      s"WHEN ${lang}_h = $best AND ${lang}_h > 0 THEN '$lang'"
    }.mkString(" ")
    s"""WITH s AS (SELECT doc_id, $cols FROM documents)
        SELECT doc_id, en_h AS en_hits,
               CASE $caseExpr ELSE 'und' END AS lang_guess
        FROM s ORDER BY doc_id"""
  }
}
