package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.IterState
import graft.dedup.{ConnectedComponents, ExactDedup, MinHashExprs, MinHashLSH}
import graft.functions.TextFunctions

/** The composed corpus-build capstone: the five-stage pipeline a
  * pretraining-data owner actually runs, chained end to end WITHOUT driver
  * materialization between the stages —
  *
  *   1. MIX — temperature-flattened language sampling (T=2, q152's rule:
  *      rate_l ∝ sqrt(share_l), normalized so the largest language keeps
  *      everything; exact-integer Knuth keep-gate);
  *   2. EXACT DEDUP — min-id canonical per md5(text) group (q68 stage 1);
  *   3. NEAR DEDUP — MinHash-LSH candidate pairs verified at true Jaccard
  *      >= threshold, connected components, non-canonical members dropped
  *      (q68 stages 2-3);
  *   4. DECONTAMINATE — drop any surviving training doc (doc_id >=
  *      evalMaxId) sharing a word 8-gram with the PRISTINE eval slice
  *      (doc_id < evalMaxId of the input corpus — q80's rule; eval docs
  *      themselves never enter the built corpus);
  *   5. PACK — per-language sequence packing into ~shardTokens-token
  *      shards by running prefix sum (q70's rule);
  *
  * finishing with the q117-style dataset card: ONE row carrying the final
  * corpus headline numbers AND every intermediate stage's cardinality, so
  * the oracle pins the whole composition, not just the end state.
  *
  * Scale shape: each stage's output is STAGED to storage via
  * [[graft.IterState.copyOut]] (configurable `spark.graft.scratch.dir` —
  * shared scratch on a cluster) and downstream stages read the staged
  * files, exactly the stage-to-storage form a 100 TB build uses (the q76
  * discipline, generalized to five stages): no stage's subtree is ever
  * recomputed per consumer, and the card's count/distinct passes are
  * narrow scans of the staged parquet. The only collects are the
  * lang-count mixing stats (q152's sanction). The card itself follows
  * q117's Expand-free discipline — never multiple countDistincts in one
  * agg (which rewrite to an input-multiplying Expand); a SINGLE distinct
  * aggregate beside non-distinct ones is Expand-free (two-level
  * aggregation) and is how the card keeps its sliced scans to two.
  *
  * `slice` restricts the REPORTED card to a sub-corpus (the planted-gate
  * q154 slices to `doc_id >= Planted.base`) while every stage still runs
  * over the full input. It must be a doc_id-only predicate selecting a
  * union of whole language strata: packing windows partition by lang, so
  * shard statistics are slice-consistent only for whole strata.
  */
object CorpusBuild {

  def card(docs: DataFrame, slice: Column = lit(true),
           evalMaxId: Long = 50L, shardTokens: Long = 4096L,
           threshold: Double = 0.3): DataFrame = {
    // --- stage 1: temperature mix (rates computed from corpus counts;
    //     sqrt/divide are correctly-rounded IEEE on every engine) ---
    val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = counts.values.sum
    val shares = counts.map { case (l, c) => l -> math.sqrt(c.toDouble / total) }
    val maxShare = shares.values.max
    val rates = shares.map { case (l, sh) => l -> sh / maxShare }
    val mixed = IterState.copyOut(Mixing.sampleStrata(docs, "lang", rates))

    // --- stage 2: exact dedup over the staged mix ---
    val exact = IterState.copyOut(ExactDedup.deduplicate(mixed))

    // --- stage 3: near-dup pairs + component dedup over the staged
    //     exact-deduped corpus (both consumers read the staged files) ---
    val pairs = MinHashLSH.nearDuplicatePairs(exact, threshold = threshold)
      .select(col("id1"), col("id2"))
    val cleaned = IterState.copyOut(
      ConnectedComponents.deduplicate(exact, pairs))

    // --- stage 4: decontamination — the eval side is tiny by nature and
    //     comes from the PRISTINE corpus, so it broadcasts; the training
    //     side never shuffles its payload ---
    val grams = explode(MinHashExprs.shingleHashes(
      split(trim(col("text")), " +"), 8)).as("g")
    val evalGrams = docs.filter(col("doc_id") < evalMaxId)
      .select(grams).distinct()
    val train = cleaned.filter(col("doc_id") >= evalMaxId)
    val contaminated = IterState.copyOut(
      train.select(col("doc_id"), grams)
        .join(broadcast(evalGrams), Seq("g"), "left_semi")
        .select(col("doc_id")).distinct())
    val corpus = IterState.copyOut(
      train.join(contaminated, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("lang"), col("source"),
          TextFunctions.tokenCount(col("text")).cast("bigint").as("nt")))

    // --- stage 5: pack the sliced corpus per language stratum ---
    val sliced = corpus.filter(slice)
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    // n_langs rides the shard-count-sized per-(lang, shard) frame: a lang
    // with >= 1 sliced doc has >= 1 shard, so COUNT(DISTINCT lang) over it
    // equals the distinct-lang count over `sliced` — one pass saved. A
    // SINGLE distinct aggregate beside non-distinct ones plans as two-level
    // aggregation (partial by lang, then final), never Expand, so the q117
    // Expand-free discipline holds (it forbids MULTIPLE countDistincts in
    // one agg, which rewrite to an Expand multiplying the input).
    val shardStats = sliced.withColumn("cum", sum(col("nt")).over(w))
      .withColumn("shard", expr(s"(cum - nt) div $shardTokens"))
      .groupBy(col("lang"), col("shard")).agg(sum(col("nt")).as("st"))
      .agg(count(lit(1)).as("n_shards"), max(col("st")).as("max_shard_tokens"),
        count_distinct(col("lang")).as("n_langs"))

    // --- the card: stage cardinalities + final headline numbers. The four
    //     stage counts scan four DIFFERENT staged tables (irreducible); the
    //     `sliced` branches fuse to TWO passes (round-17): headline +
    //     n_sources in one agg (single distinct — no Expand, see above),
    //     n_langs on the shard frame. The round-15 form ran four separate
    //     sliced scans (headline, langs, sources, shards). ---
    val stageCounts = mixed.filter(slice).agg(count(lit(1)).as("n_mixed"))
      .crossJoin(exact.filter(slice).agg(count(lit(1)).as("n_exact")))
      .crossJoin(cleaned.filter(slice).agg(count(lit(1)).as("n_clean")))
      .crossJoin(contaminated.filter(slice)
        .agg(count(lit(1)).as("n_contaminated")))
    val headline = sliced.agg(count(lit(1)).as("n_docs"),
      sum(col("nt")).as("total_tokens"), max(col("nt")).as("max_tokens"),
      count_distinct(col("source")).as("n_sources"))
    stageCounts.crossJoin(headline).crossJoin(shardStats)
      .withColumn("mean_tokens", round(
        col("total_tokens").cast("double") / col("n_docs").cast("double"), 6))
      // exact round-15 column order — the correctness gate hashes schemas
      .select(col("n_mixed"), col("n_exact"), col("n_clean"),
        col("n_contaminated"), col("n_docs"), col("total_tokens"),
        col("max_tokens"), col("n_langs"), col("n_sources"),
        col("n_shards"), col("max_shard_tokens"), col("mean_tokens"))
  }
}
