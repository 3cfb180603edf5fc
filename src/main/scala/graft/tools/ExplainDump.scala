package graft.tools

import java.nio.file.{Files, Paths}

/** Dumps `explain("formatted")` for a representative query per plan shape
  * into PLANS.md — the written record of the per-operator plan audit
  * (pushdown, broadcast, partial agg, top-k, bucketing, codegen spans).
  *
  * Usage: runMain graft.tools.ExplainDump [sfDir] [outFile]
  */
object ExplainDump {

  private val representative = Seq(
    "q11_pushdown_filter" -> "filter+projection pushdown into the parquet scan",
    "q01_pricing_summary" -> "partial→final hash aggregation (integer-cents money path)",
    "q02_top_orders" -> "sort+limit planned as TakeOrderedAndProject (top-k)",
    "q03_revenue_by_nation" -> "fact-fact shuffle join + broadcast dimensions",
    "q06_window_topn" -> "ranking window after one partition-key shuffle",
    "q19_kmeans_assign" -> "K-means assignment as codegen'd CASE WHEN argmin + partial agg",
    "q24_knn_bruteforce" -> "broadcast query set × corpus, no corpus shuffle",
    "q22_minhash_neardups" -> "MinHash LSH: staged projections → banded bucket join",
    "q17_lang_id" -> "language-ID: staged per-language scores, argmax over plain refs",
    "q36_asof_join" -> "as-of join as a merge-scan: union, ONE keyed shuffle, running last() window",
    "q54_bucketed_join" -> "bucketed co-located join: zero exchanges on either side",
    "q55_cosine_neardups" -> "sign-LSH cosine near-dup: banded bucket join + exact verify",
    "q78_repetition_filter" -> "repetition ratio: codegen'd shingle kernel + one lang agg, no extra shuffle",
    "q80_contamination" -> "decontamination: eval grams broadcast-semi-joined onto the training scan",
    "q83_doc_chunking" -> "context-window chunking: sequence() explode + single lang agg",
    "q84_anomaly_zscore" -> "z-score gate: one moment agg, stats broadcast back onto the scan",
    "q85_incremental_dedup" -> "incremental ingestion: anti-join against the hash-only ingested index",
    "q98_bm25_retrieval" -> "BM25: isin-pruned postings, broadcast df/stats, TakeOrdered top-10",
    "q99_span_dedup" -> "duplicated spans: partial agg above the gram explode, ONE gram-keyed exchange",
    "q101_length_buckets" -> "length buckets: narrow integer CASE ladder + one (lang, cap) agg",
    "q103_quantile_buckets" -> "quantile bucketing: sketch boundaries broadcast back, no ranking window",
    "q105_pagerank" -> "PageRank result consumption: the copied-out file-backed ranks (per-round shape dumped separately below)",
    "q106_vocab_coverage" -> "vocab coverage: vocab-sized agg, TakeOrdered top-1000, k-bounded threshold join",
    "q113_rolling_anomaly" -> "rolling anomaly: per-type window partitions, exact-long frame sums, no global sort",
    "q122_hourly_gap_fill" -> "gap fill: grid from a broadcast 1-row bounds aggregate via sequence(), broadcast fill join",
    "q123_triangle_count" -> "triangles top-20 over the copied-out per-vertex counts (adjacency-intersection shape dumped separately below)",
    "q116_component_histogram" -> "component histogram: aggregates over the k-sized file-staged component table, no window",
    "q127_incremental_rollup" -> "incremental rollup: base ∪ delta merge with partial aggs (PlanSpec proves partition-level pruning on a date-partitioned store)",
    "q128_attribution" -> "attribution: as-of merge-scan window + keys-only anti-join, every join equi",
    "q129_sliding_distinct" -> "sliding distinct: one sketch pass, k-sized day-grid merge, events never revisited",
    "q130_bloom_join" -> "runtime Bloom-filter join: codegen'd bitset probe planted below the join — the probe-side exchange carries pruned rows only",
    "q133_prefix_filter_join" -> "prefix-filter similarity join: df-sorted prefix explode → ONE shingle-keyed candidate equi-join → semi-join-pruned exact verify, no all-pairs stage",
    "q134_unigram_perplexity" -> "unigram perplexity: tf-row token-keyed join, UNHINTED so AQE broadcasts only while the vocab fits (it does here) and shuffles at 100 TB; exact DECIMAL term sums in partial aggs, no window",
    "q136_editdist_dedup" -> "edit-distance join: deletion-variant explode → ONE variant-keyed candidate equi-join → distinct → codegen levenshtein verify; no all-pairs stage, recall by theorem",
    "q137_ks_drift" -> "KS drift: ONE data-sized (side,bucket) partial agg; the cumulative window and max-gap pass run over the metadata-sized bucket table (1-row broadcasts for sides/totals/max)",
    "q139_audio_features" -> "WAV decode: narrow parquet scan → object-mapped partition decode → fixed-width stats; payloads never reach an exchange",
    "q140_planted_neardup_pairs" -> "planted gate: the 145-row local relation unions into the corpus BELOW the LSH stages — same banded plan as q22, one scan of each side",
    "q148_hybrid_rrf" -> "hybrid RRF: both rankers keep their own shapes (pruned postings + bounded top-k agg; broadcast query vectors); the fusion union/agg/window touch k-bounded per-query groups only",
    "q150_bpe_encode" -> "BPE encode: merge chain applied to the DISTINCT token table, vocab-joined back onto the token stream (AQE broadcasts while the vocab fits, shuffles at 100 TB)",
    "q151_int8_quant" -> "int8 quantization audit: narrow codegen array expressions end-to-end, one broadcast query vector, no shuffle before the final sort",
    "q155_quality_classifier" -> "hashed-n-gram quality classifier: ONE codegen'd static-call expression on a narrow scan — no explode, no join, no shuffle before the output sort",
    "q156_audio_audit" -> "audio audit: q139's decode shape with the one-pass clip/silence/peak/energy counters — narrow scan → partition decode → fixed-width stats, payloads never reach an exchange",
    "q157_snapshot_diff" -> "snapshot diff: ONE co-partitioned full-outer sort-merge join on the key, null-safe struct compare + status CASE above it, rollup agg — no second exchange",
    "q158_kmv_overlap" -> "KMV overlap: bottom-k sketch as an algebraic ObjectHashAggregate — map-side partials reduce each partition to k values before the 2-group exchange",
    "q159_dsir_selection" -> "DSIR selection: token explode → two 512-row bucket aggs → broadcast weight join back onto per-doc tf → per-doc agg, TakeOrdered top-25",
    "q160_mad_anomaly" -> "MAD anomaly: exact-percentile value→count map aggs (domain-bounded state), group-stat broadcast joins back onto the narrow scan — three passes, no sort",
    "q161_quality_budget" -> "quality budget: margins computed in the scan projection, ONE per-lang running-sum window (range-partitioned sort), prefix filter + rollup",
    "q162_template_canon" -> "template canon: associative max(struct) argmax — ONE partial→final agg over the narrow (key, id, score) projection, no window exchange",
    "q163_epoch_expand" -> "epoch expand: gated copy count + sequence() explode in the map stage — zero shuffle below the (lang, epoch) report agg",
    "q164_retrieval_eval" -> "retrieval eval: isin-pruned postings → bounded top-k agg per term (never a ranking window), broadcast integer discount/IDCG-prefix tables, probe-seeded left joins",
    "q165_bigram_perplexity" -> "bigram perplexity: map-only arrays_zip pair stream (no self-join), tf-row model aggs, UNHINTED model joins (AQE broadcasts while the bigram vocab fits, shuffles at 100 TB), exact DECIMAL surprisal sums",
    "q166_heavy_hitters" -> "exact heavy hitters: pass 1 = KB-state Misra-Gries ObjectHashAggregate + count in ONE scan; pass 2 = the <=k candidates pushed to the scan as an In filter, then a candidate-only agg — the vocab-sized shuffle never happens",
    "q167_shard_plan" -> "shard plan: DistRank range-repartition + per-partition offsets (one long per partition on the driver — no single-partition row_number), serpentine shard formula in the projection, 8-row summary agg",
    "q168_embedding_audit" -> "embedding audit: two codegen kernel calls per row on a narrow scan, ONE label-keyed partial→final agg — no join, no window",
    "q169_curriculum_interleave" -> "curriculum interleave: per-stratum ranking windows pruned by rank<=take BEFORE the position formula; stratum index + count as broadcasts; final sort sees <=take rows",
    "q170_split_manifest" -> "split manifest: one codegen'd kmv_key per row (map-only assign), ONE (split, lang) partial→final agg — no RNG, no shuffle before the 15-row report",
    "q171_pii_scrub" -> "PII scrub audit: two codegen'd regexp passes per row (map-only), one lang agg — the regexp cost IS the operator at 100 TB",
    "q172_split_leakage" -> "split leakage: map-only assign on both sides, gram explode, train-side distinct, ONE gram-keyed semi-join, per-lang distinct counts — the q80 decontamination shape at the split boundary",
    "q173_freq_spectrum" -> "frequency spectrum: gram explode (map-only) → vocab-sized type count with map-side partial agg → <=11-row spectrum fold; output size independent of corpus size",
    "q174_skew_profile" -> "skew profile: ONE key-count agg, percentile window over the <= sqrt(2n)-row count-of-counts table (never the key table), TakeOrdered top-k mass, integer DIV ratios — one output row",
    "q175_long_span_dedup" -> "long-span dedup: codegen'd position-ordered window-hash kernel → gram-keyed count>=2 (AQE: broadcast semi-join while the dup set is small, exchange-reused shuffle when it is not) → per-DOC gaps-and-islands union (sort bounded by doc length, never corpus size) — no suffix array, no all-pairs",
    "q176_domain_blocklist" -> "domain blocklist: broadcast left join carries the blocked bit onto the corpus scan (never an anti-join plus a recount) — one lang agg, the corpus side never shuffles",
    "q177_domain_mass_cap" -> "domain mass cap: vocab-sized domain-count agg + 1-row total broadcast, keep decided by an exact DECIMAL cross-multiply in the map stage — no division, no RNG, no per-domain sort (the giant domain is never sorted), no data-sized shuffle before the 20-row audit",
    "q178_span_removal" -> "span removal (the dedup itself): q175's hashed window stream + a gram-keyed (count, min-key) agg decide canonical occurrences; non-canonical positions island per doc; the cut/rejoin is per-row array work above a left join of doc-sized cut lists — no suffix array, no driver state, text bytes pinned by a kmv_key checksum",
    "q184_gopher_repetition" -> "Gopher repetition battery: ONE codegen kernel call per doc (all nine numerators in one pass) + one lang agg with map-side partials — no explode, no join, no shuffle before the report",
    "q186_dedup_store_exact" -> "persisted-store incremental dedup: batch-side md5 canonical agg + LEFT join against the loaded 48 B/doc hash table (parquet scan, never the corpus payload) + one lang agg",
    "q153_corpus_build" -> "corpus-build capstone CARD over the five staged hops: every upstream stage (mix/dedup/decon) is a file-backed parquet scan by the time this plan runs — the stage shapes themselves are audited under q152/q68/q22/q80/q70; what remains here is the pack window over one lang-keyed exchange plus 1-row crossJoined count/distinct passes (q117's Expand-free card discipline) over narrow scans of the staged files",
    "q200_ann_drift_audit" -> "ANN drift audit: one codegen min-dist kernel per subspace on a narrow scan (distortion), frozen-coarse argmin assign + nLists-row share agg, broadcast 1-row totals, an nLists-row full-outer TVD join — the retrain decision never shuffles anything corpus-sized",
    "q204_bpe_encode_ids" -> "BPE id encoding: token posexplode → DISTINCT-token mapPartitions with the broadcast rank map + vocab (each token encoded once) → join back → per-doc ordered flatten (collect_list bounded by doc length) — the q134 vocab-join discipline with ids instead of counts",
    "q205_jpeg_decode" -> "JPEG decode: narrow staged-payload scan → object-mapped partition decode (real JFIF parse) → fixed-width stats; payloads never reach an exchange (q139's shape)",
    "q206_image_dedup_store" -> "image dedup ingest: ONE decode pass emits both signatures (payload MD5 + raster aHash), then the shared ingestSigned stages — md5 canonical agg, LEFT join against the 40 B/image store scan, chunk-blocked signature join with bucket caps",
    "q207_sequence_pack" -> "sequence pack: two-pass range-shuffle prefix sum (one long per partition on the driver — never a single-partition window), seq arithmetic in the projection, bounded explode (tokens/capacity + 2 rows per doc) → per-seq agg",
    "q210_pack_manifest" -> "incremental pack manifest: the grown store read back as a plain parquet scan of placements — the increment's prefix-sum work happened at append time, O(increment); what remains is q207's bounded explode + per-seq agg over the scan")

  /** Shapes whose production path is a SUBSET of the oracle-gated query
    * (the composed query carries a gate/recall side that exists only to be
    * checked) — dumped from the path a user would actually ship.
    */
  private def extraShapes(spark: org.apache.spark.sql.SparkSession, sfDir: String)
      : Seq[(String, String, org.apache.spark.sql.DataFrame)] = {
    import org.apache.spark.sql.functions.col
    val emb = graft.Tables.embeddings(spark, sfDir)
    val cb = graft.similarity.ProductQuantization.train(emb, "embedding", m = 8, k = 16, maxIter = 1)
    val codes = graft.similarity.ProductQuantization.encode(emb, "embedding", cb)
    val q = graft.similarity.ProductQuantization.normalized(
        emb.filter(col("vec_id") === 0), "embedding", "nvec")
      .select(col("nvec")).collect()(0).getSeq[Double](0).toArray
    val eps = 0.01
    val ev = graft.Tables.events(spark, sfDir)
      .select(org.apache.spark.sql.functions.to_date(col("ts")).as("d"),
        col("value"))
    val daily = graft.operators.HistogramQuantile.sketch(ev, Seq("d"), col("value"), eps)
    val grid = daily.select(col("d")).distinct()
    val merged = grid.as("g").join(daily.as("s"),
        col("s.d") >= org.apache.spark.sql.functions.date_sub(col("g.d"), 6)
          && col("s.d") <= col("g.d"))
      .groupBy(col("g.d").as("d"), col("bucket"))
      .agg(org.apache.spark.sql.functions.sum(col("cnt")).as("cnt"))
    val li = graft.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val triPairs = li.as("x").join(li.as("y"), col("x.ok") === col("y.ok")
        && col("x.pk") < col("y.pk"))
      .select(col("x.pk").as("a"), col("y.pk").as("b"))
    Seq((
      "q123 intersection stage (lazy form)",
      "triangles: degree-oriented adjacency intersection, equi joins only, wedges never materialize as rows — the whole plan below the eager orient/adjacency stages of the shipped path",
      graft.operators.Triangles.perVertexCounts(triPairs, materialize = false)), (
      "q105 PageRank round (unstaged form)",
      "one damped iteration: edge join + dst-keyed partial agg (Pregel-as-joins) — the per-round shape the shipped path checkpoints between",
      graft.operators.PageRank.ranksMillionths(
        graft.Tables.events(spark, sfDir)
          .select(col("user_id").as("s"), (col("event_id") % 500).as("d")),
        iterations = 1, checkpoint = false)), (
      "q95_pq_ann (production ADC search path)",
      "PQ ANN: codes-only scan with LUT literals — zero joins/windows before the bounded top-k aggregate (q95's oracle side adds a brute-force recall gate; this is the half a user ships)",
      graft.similarity.ProductQuantization.search(codes, Seq((0L, q)), cb, k = 5)), (
      "q131_sketch_quantiles (production sketch path)",
      "histogram quantiles: ONE raw-data pass builds (day, bucket, cnt) sketch rows; the trailing window and the quantile extraction run over metadata-sized sketch rows only (q131's oracle side adds a 7x-replicating exact gate; this is the half a user ships)",
      graft.operators.HistogramQuantile.quantiles(merged, "d", eps, Seq(0.5, 0.95))), (
      "q135_zorder_layout (production cluster path)",
      "z-order clustering: codegen'd Morton interleave + ONE range exchange + in-partition (non-global) sort — the whole cost of the layout write; q135's gate query adds the hash control layout and the box probes, which exist only to be checked",
      {
        // minute must be RELATIVE to the corpus start (as the q135 fixture
        // derives it): ZOrder.spread16 keeps the low 16 bits, so absolute
        // epoch minutes (~28M) would wrap mod 65536 and silently lose
        // temporal locality in the shipped recipe
        val ev = graft.Tables.events(spark, sfDir)
          .select(col("event_id"), col("ts"), col("user_id"), col("value"))
        val t0 = ev.agg(org.apache.spark.sql.functions.min(col("ts")).as("t0"))
        val withMinute = ev
          .crossJoin(org.apache.spark.sql.functions.broadcast(t0))
          .withColumn("minute", org.apache.spark.sql.functions
            .floor((col("ts").cast("long") - col("t0").cast("long")) / 60))
          .drop("t0")
        graft.operators.ZOrder.cluster(
          withMinute, col("user_id"), col("minute"), numFiles = 16)
      }), (
      "q158 sketch stage (distributed half)",
      "KMV sketches: kmv_key codegen in the scan projection, bottom-k ObjectHashAggregate partial→final around the 2-group exchange — the distributed half q158's 1-row result frame hides (the sketch COMBINE is a driver-side k-array merge by design)",
      {
        val src = graft.Tables.documents(spark, sfDir)
          .withColumn("sn", org.apache.spark.sql.functions
            .regexp_extract(col("source"), "(\\d+)", 1).cast("int"))
          .withColumn("h", graft.functions.KmvSketch.kmvKey(
            org.apache.spark.sql.functions.regexp_replace(
              org.apache.spark.sql.functions.lower(
                org.apache.spark.sql.functions.trim(col("text"))),
              "\\s+", " ")))
        src.select(org.apache.spark.sql.functions
            .when(col("sn") % 2 === 0, "a").otherwise("b").as("side"),
            col("h"))
          .groupBy(col("side"))
          .agg(graft.functions.KmvSketch.sketch(128)(col("h")).as("sk"))
      }))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = if (args.length > 1) args(1) else "PLANS.md"
    val spark = graft.Sessions.local("explain-dump")
    try {
      val sb = new StringBuilder
      sb.append("# PLANS — formatted physical plans (generated by graft.tools.ExplainDump)\n\n")
      sb.append(s"Input: `$sfDir`. One representative query per plan shape; ")
      sb.append("`*(n)` prefixes mark whole-stage-codegen spans.\n")
      def dump(name: String, why: String, df: org.apache.spark.sql.DataFrame): Unit = {
        val w = new java.io.ByteArrayOutputStream()
        Console.withOut(w) { df.explain("formatted") }
        sb.append(s"\n## $name — $why\n\n```\n${w.toString.trim}\n```\n")
      }
      representative.foreach { case (name, why) =>
        dump(name, why, graft.SparkEntry.queries(name)(spark, sfDir))
      }
      extraShapes(spark, sfDir).foreach { case (name, why, df) => dump(name, why, df) }
      Files.writeString(Paths.get(out), sb.toString)
      println(s"[explain] wrote ${representative.length + 1} plans to $out")
    } finally spark.stop()
  }
}
