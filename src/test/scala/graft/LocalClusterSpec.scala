package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Serialization-boundary proof (the half of the 100 TB story `local[n]`
  * cannot show): in local mode driver and executors share ONE JVM, so
  * broadcast values, custom `Aggregator` buffers (bounded top-k rows, HLL
  * register arrays, Bloom bitsets), task closures and codegen'd custom
  * Expressions are never actually serialized across a process boundary.
  * `local-cluster[2,4,mem]` launches TWO REAL executor JVMs through the
  * SPARK_HOME distribution — every task binary, closure, broadcast and
  * partial-aggregation buffer crosses process boundaries exactly as on a
  * multi-executor cluster.
  *
  * Method: each representative query's rows are computed under plain
  * `local[4]` first (the configuration the whole oracle-gated suite runs
  * in), then the SAME query re-runs under local-cluster and must match row
  * for row. Representatives chosen for what they serialize:
  *
  *  - q43: RDD k-means — `broadcast` centroids + iterative task closures
  *    (`KMeansRDD.scala:40`);
  *  - q30: bounded top-k — typed `Aggregator` with an `Encoder`-serialized
  *    mutable buffer (`TopKAggregator`);
  *  - q45: HLL distinct — 4 KiB register-array buffers merged ACROSS
  *    executors (partial → final crosses the wire);
  *  - q90: Bloom prefilter — MB-scale bitset aggregation buffers + the
  *    codegen'd probe expression compiled on executors;
  *  - q22: MinHash LSH — custom codegen Expressions + the ReusedExchange
  *    signature subtree shipped as shuffle blocks between processes;
  *  - q92: weighted stratified sample — A-ES keyed typed aggregator;
  *  - q130: runtime Bloom join — the collected bitset re-enters the plan
  *    as a BinaryType literal that must ship inside task binaries to the
  *    executor JVMs, where the codegen'd probe reads it;
  *  - q133: prefix-filter join — shingle-kernel codegen + struct-array
  *    sort buffers crossing the candidate-join shuffle;
  *  - q134: unigram perplexity — DECIMAL(29,9) partial-sum buffers merged
  *    across executors (exactness must survive the wire, not just the
  *    math);
  *  - q136: edit-distance join — deletion-variant explode + the
  *    levenshtein codegen verify compiled on executor JVMs;
  *  - q137: KS drift — wide-DECIMAL cross-product gap buffers and the
  *    file-staged bucket table re-read across the process boundary;
  *  - q138: image perceptual hash — the ImageIO decode + aHash closure
  *    runs INSIDE executor JVMs (javax.imageio static state, codec
  *    object serialization), payloads read from parquet executor-side;
  *  - q139: audio features — the javax.sound.sampled WAV container parse
  *    runs inside executor JVMs over parquet-read binary payloads;
  *  - q140: planted near-dup gate — the driver-built planted corpus is
  *    shipped to executors (parallelized local rows + union) and must
  *    band/verify identically there;
  *  - q147: star-rewrite components — alternating large/small-star join
  *    rounds whose edge tables cross shuffle boundaries every round, plus
  *    the (count, xxhash64-sum) convergence fingerprint aggregated across
  *    executors;
  *  - q148: RRF fusion — the two ranker subtrees' window ranks and the
  *    integer micro-unit fusion agg merge across the process boundary;
  *  - q149/q150: BPE train + encode — per-round pair-count partial aggs and
  *    the 1-row argmax collect cross the wire; encode ships the merge list
  *    in task binaries where the replace-chain codegen applies it;
  *  - q151: int8 quantization — the narrow codegen array expressions
  *    (scale derivation, per-element quantize, integer code sums) compile
  *    and run on executor JVMs;
  *  - q152: temperature mixing — lang-count stats collected from executor
  *    partials, sqrt-share rates recomputed and shipped back inside the
  *    sampling closure;
  *  - q153: the corpus-build capstone — five IterState.copyOut staging
  *    hops where executor processes write the parquet partitions and the
  *    next stage's scan reads them back across the process boundary (the
  *    shared-scratch contract, exercised for real on a shared local fs);
  *  - q155: quality classifier — the quality_margin codegen kernel
  *    compiled and evaluated inside executor JVMs;
  *  - q156: audio audit — the shared RIFF parse + one-pass clip/silence/
  *    peak/energy counters run inside executor JVMs over parquet-read
  *    payloads;
  *  - q157: snapshot diff — the full-outer join's null-safe packed-struct
  *    comparison evaluated on shuffled rows that crossed the process
  *    boundary;
  *  - q158: KMV overlap — the sorted-array bottom-k `Aggregator` buffers
  *    are Encoder-serialized and MERGED across executors (the sketch's
  *    algebraic-merge claim, tested on the wire), plus the kmv_key
  *    codegen kernel compiled executor-side;
  *  - q159: DSIR selection — two bucket-sized partial aggs and the
  *    broadcast weight table ship across processes; the floor-quantized
  *    weights must come out identical wherever the ln is evaluated;
  *  - q160: MAD anomaly — exact-percentile value→count maps merged across
  *    executors twice (median, then MAD), with the group-stat broadcast
  *    joins re-entering executor plans;
  *  - q161: quality budget — per-stratum running-sum window over
  *    range-partitioned shuffled rows, margins computed executor-side;
  *  - q162: template canon — the associative max(struct) argmax buffers
  *    merge across executor partials (pick correctness must survive the
  *    partial→final split, not just single-JVM evaluation);
  *  - q163: epoch expand — the gated copy-count + sequence explode runs
  *    executor-side and the per-(lang, epoch) masses merge on the wire;
  *  - q164: retrieval eval — bounded top-k `Aggregator` buffers rank the
  *    postings across executor partials; the integer discount tables
  *    re-enter the plan as broadcasts read executor-side;
  *  - q165: bigram LM — DECIMAL(29,9) surprisal partial sums and the
  *    AQE-planned model joins cross the process boundary;
  *  - q166: heavy hitters — the Misra-Gries `Aggregator`'s mutable HashMap
  *    buffer is Encoder-frozen, shipped, and re-admitted by `merge` on
  *    another JVM (the exact freeze/merge cycle HeavyHittersSpec simulates,
  *    run for real), then the k-bounded candidate collect re-enters pass 2
  *    as literals inside task binaries;
  *  - q167: shard plan — DistRank's two-pass RDD scheme (range shuffle,
  *    per-partition counts collected, offsets shipped back inside the
  *    index-add closure) is exactly the code that differs between one JVM
  *    and many;
  *  - q168: embedding audit — the non-finite/quant-norm codegen kernels
  *    compile and evaluate inside executor JVMs over parquet-read vectors;
  *  - q169: curriculum interleave — per-stratum ranks over shuffled rows
  *    plus the stratum-index broadcast recombine across processes;
  *  - q170: split manifest — the kmv_key codegen hash compiles and
  *    evaluates on executor JVMs and the (split, lang) partials merge on
  *    the wire (a split that differed across processes would be
  *    catastrophic — this is the determinism claim, tested for real);
  *  - q172: split leakage — the gram distinct + semi-join shuffles cross
  *    the process boundary on top of the q170 assignment;
  *  - q173: frequency spectrum — the vocabulary-sized type-count partials
  *    and the spectrum fold merge across executors;
  *  - q174: skew profile — key-count partials, the count-of-counts window
  *    and the TakeOrdered top-k all recombine across the wire;
  *  - q123: triangle count — the varint-delta pack/unpack/intersect
  *    codegen kernels compile on executor JVMs and the PACKED binary
  *    adjacency payloads cross the shuffle_hash probe join as shuffle
  *    blocks between processes;
  *  - q184: Gopher repetition — the nine-numerator gopher_stats kernel
  *    compiles executor-side and its array results feed partial aggs
  *    merged on the wire;
  *  - q186: persisted dedup store — parquet STATE staged by one process
  *    is loaded and anti-joined by executor JVMs (the store round-trip
  *    crossing a real process boundary).
  */
class LocalClusterSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"
  private val queryNames = Seq(
    "q43_kmeans_rdd",
    "q30_knn_topk_agg",
    "q45_hll_distinct",
    "q90_bloom_incremental_dedup",
    "q22_minhash_neardups",
    "q92_weighted_sample",
    "q130_bloom_join",
    "q133_prefix_filter_join",
    "q134_unigram_perplexity",
    "q136_editdist_dedup",
    "q137_ks_drift",
    "q138_image_phash_dedup",
    "q139_audio_features",
    "q140_planted_neardup_pairs",
    "q147_bigstar_components",
    "q148_hybrid_rrf",
    "q149_bpe_merges",
    "q150_bpe_encode",
    "q151_int8_quant",
    "q152_temperature_mix",
    "q153_corpus_build",
    "q155_quality_classifier",
    "q156_audio_audit",
    "q157_snapshot_diff",
    "q158_kmv_overlap",
    "q159_dsir_selection",
    "q160_mad_anomaly",
    "q161_quality_budget",
    "q162_template_canon",
    "q163_epoch_expand",
    "q164_retrieval_eval",
    "q165_bigram_perplexity",
    "q166_heavy_hitters",
    "q167_shard_plan",
    "q168_embedding_audit",
    "q169_curriculum_interleave",
    "q170_split_manifest",
    "q171_pii_scrub",
    "q172_split_leakage",
    "q173_freq_spectrum",
    "q174_skew_profile",
    "q175_long_span_dedup",
    "q176_domain_blocklist",
    "q177_domain_mass_cap",
    "q178_span_removal",
    "q123_triangle_count",
    "q184_gopher_repetition",
    "q186_dedup_store_exact")

  private def rows(spark: SparkSession, name: String): Seq[String] =
    SparkEntry.queries(name)(spark, sfDir).collect().map(_.toString).sorted.toSeq

  private def stopAndClear(s: SparkSession): Unit = {
    s.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
  }

  // JDK17 module opens for the executor JVMs (the build injects these into
  // the test JVM via javaOptions; launched executors need them explicitly)
  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar")
    .map(p => s"--add-opens=$p=ALL-UNNAMED").mkString(" ")

  test("representative suite is row-identical across a real executor-process boundary (local-cluster[2,4])") {
    assume(new java.io.File(sys.env.getOrElse("SPARK_HOME", "/opt/spark"), "bin").isDirectory,
      "local-cluster needs a SPARK_HOME distribution to launch executor JVMs")

    // expected rows under the canonical single-JVM session
    SparkSession.getActiveSession.foreach(stopAndClear)
    val local = Sessions.local("cluster-spec-expected", cores = 4)
    val expected = try queryNames.map(n => n -> rows(local, n)).toMap
    finally stopAndClear(local)

    // same engine semantics as Sessions.local, master swapped for a real
    // 2-process cluster; executors inherit the test JVM's full classpath so
    // graft classes + codegen'd expressions resolve in the executor JVMs
    val cluster = SparkSession.builder()
      .master("local-cluster[2,4,2048]")
      .appName("cluster-spec")
      .config("spark.executor.memory", "1536m")
      .config("spark.executor.extraClassPath", sys.props("java.class.path"))
      .config("spark.executor.extraJavaOptions", addOpens)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .config("spark.sql.warehouse.dir",
        sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft-warehouse")
      .getOrCreate()
    try {
      cluster.sparkContext.setLogLevel("WARN")
      // the boundary is real only if executors are separate processes
      assert(cluster.sparkContext.master.startsWith("local-cluster"), cluster.sparkContext.master)
      for (name <- queryNames) {
        val got = rows(cluster, name)
        assert(got == expected(name),
          s"$name diverged across the executor-process boundary:\n" +
            s"  local:   ${expected(name).take(5).mkString(" | ")}\n" +
            s"  cluster: ${got.take(5).mkString(" | ")}")
      }
    } finally stopAndClear(cluster)
  }
}
