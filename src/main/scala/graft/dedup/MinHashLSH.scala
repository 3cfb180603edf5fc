package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + banded LSH near-duplicate detection:
  * shingle → minhash signature → band → bucket-join → exact-Jaccard verify.
  *
  * Scale design (the 100 TB path):
  *  - Shingling and signatures are narrow per-row expressions (no UDF, no
  *    shuffle); signature width is `numHashes` longs per doc regardless of
  *    document size, so the shuffled candidate-generation payload is tiny.
  *  - Banding explodes each doc into `bands` rows keyed by (band index,
  *    band hash) — the ONLY shuffle before verification, and it is keyed by
  *    a hash, so it distributes uniformly.
  *  - Buckets above `maxBucketSize` are dropped (they are degenerate — e.g.
  *    boilerplate shingles) rather than allowed to explode the pair join
  *    quadratically; dropped-bucket counts should be monitored at scale.
  *  - Only candidate pairs (same bucket) pay the exact-Jaccard verification,
  *    which re-joins the shingle sets by doc id — two hash joins, no
  *    cartesian anywhere.
  */
object MinHashLSH {

  /** (bandIdx, bandHash) array for banded LSH: `bands` groups of `rowsPerBand`
    * signature entries, hashed together.
    */
  def bandHashes(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64(slice(sig, b * rowsPerBand + 1, rowsPerBand)).as("bh"))
    }: _*)

  /** Docs → (id, sh_hash, sig): 64-bit shingle hashes + minhash signature,
    * each stage ONE codegen'd kernel call ([[MinHashKernels]] — the old
    * transform-lambda pipeline interpreted per shingle). Shingle hashes,
    * not shingle strings, flow downstream: set arithmetic over longs is
    * cheaper than over strings and the shuffled payload shrinks, while
    * Jaccard values are unchanged absent 64-bit collisions (the same
    * equivalence [[NgramJaccard]]'s oracle verifies).
    */
  def signatures(documents: DataFrame, textCol: String = "text",
                 idCol: String = "doc_id", numHashes: Int = 32,
                 shingleSize: Int = 3): DataFrame =
    documents
      .select(col(idCol).as("id"), split(trim(col(textCol)), " +").as("toks"))
      .select(col("id"), MinHashExprs.shingleHashes(col("toks"), shingleSize).as("sh_hash"))
      .select(col("id"), col("sh_hash"),
        MinHashExprs.minhashSig(col("sh_hash"), numHashes).as("sig"))

  /** Candidate near-dup pairs (id1 < id2) from banded LSH, with bucket-size
    * cap. Pure DataFrame: explode → self-join on (band, bandHash).
    */
  def candidatePairs(sigs: DataFrame, bands: Int = 8, rowsPerBand: Int = 4,
                     maxBucketSize: Int = 64): DataFrame = {
    val banded = sigs
      .select(col("id"), explode(bandHashes(col("sig"), bands, rowsPerBand)).as("b"))
      .select(col("id"), col("b.band").as("band"), col("b.bh").as("bh"))
    // cap pathological buckets before the pair join: groupBy().count() +
    // semi-join instead of count-over-window — same (band, bh) shuffle key
    // (the exchange is shared via ReusedExchange), but no per-bucket SORT
    val smallBuckets = banded.groupBy(col("band"), col("bh"))
      .agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n") <= maxBucketSize)
      .select(col("band"), col("bh"))
    val sized = banded.join(smallBuckets, Seq("band", "bh"), "left_semi")
    val l = sized.select(col("band"), col("bh"), col("id").as("id1"))
    val r = sized.select(col("band"), col("bh"), col("id").as("id2"))
    l.join(r, Seq("band", "bh"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"))
      .distinct()
  }

  /** Exact Jaccard similarity over the (hashed) shingle sets for given
    * (id1, id2) pairs — two hash joins against the shingle table, then set
    * arithmetic over 64-bit values.
    */
  def verifyPairs(pairs: DataFrame, sigs: DataFrame): DataFrame = {
    val s1 = sigs.select(col("id").as("id1"), col("sh_hash").as("sh1"))
    val s2 = sigs.select(col("id").as("id2"), col("sh_hash").as("sh2"))
    pairs.join(s1, "id1").join(s2, "id2")
      .withColumn("inter", size(array_intersect(col("sh1"), col("sh2"))))
      .withColumn("uni", size(array_union(col("sh1"), col("sh2"))))
      .select(col("id1"), col("id2"),
        (col("inter").cast("double") / col("uni").cast("double")).as("jaccard"))
  }

  /** Full pipeline: near-dup pairs with exact Jaccard >= threshold.
    *
    * The signature table has FIVE runtime consumers (banding's pair join
    * feeds both sides and its bucket cap, plus both verify joins). Through
    * round 16 it was routed through one hash-partition exchange on the
    * theory that exchange reuse / AQE stage caching would compute the
    * shingle+minhash subtree once — but the round-17 final-plan audit
    * showed that does NOT hold: Catalyst pushes each consumer's own
    * predicates (join-key isnotnull, callers' planted-id restrictions)
    * BELOW the exchange, the five subtrees stop being canonically
    * identical, and the signature kernel ran five times per chain
    * (ShuffleQueryStages 9/10/12/13/16 in the committed q140 final plan).
    * Above the [[graft.IterState.shouldStage]] input-size gate the SLIM
    * (id, sig) table is therefore FILE-STAGED once
    * ([[graft.IterState.copyOut]] — the PrefixFilterJoin/Triangles
    * stage-to-scratch form): the minhash-mix kernel (the heavy half) runs
    * once and the banding branches scan 8·numHashes B/doc from parquet.
    * The verify branches keep the lazy gram fetch — Catalyst prunes the
    * sig expression there, so they re-run only the cheap shingle kernel;
    * staging the corpus-sized sh_hash column was A/B'd and lost (see
    * nearDuplicatePairs). Below the gate the shared-exchange lazy form is
    * kept (small inputs recompute cheaper than they stage).
    * EXECUTION CONTRACT above the gate: eager staging at construction
    * time; the returned frame is invalidated by `IterState.purge`.
    */
  def nearDuplicates(documents: DataFrame, threshold: Double = 0.7,
                     textCol: String = "text", idCol: String = "doc_id",
                     numHashes: Int = 32, bands: Int = 8,
                     shingleSize: Int = 3): DataFrame =
    nearDuplicatePairs(documents, threshold, textCol, idCol, numHashes,
      bands, shingleSize)
      .orderBy(col("id1"), col("id2"))

  /** [[nearDuplicates]] without the final global sort — the form for
    * pipeline consumers (connected components, dedup drops, corpus builds)
    * whose downstream aggregations are order-blind: the range exchange +
    * sort bought nothing there (guide §2.4 — an `orderBy` used only to make
    * output deterministic is an accidental shuffle; Catalyst's
    * EliminateSorts does not reach through the staged/checkpointed
    * consumers these pipelines feed). Pair SET is identical.
    */
  def nearDuplicatePairs(documents: DataFrame, threshold: Double = 0.7,
                         textCol: String = "text", idCol: String = "doc_id",
                         numHashes: Int = 32, bands: Int = 8,
                         shingleSize: Int = 3): DataFrame = {
    val raw = signatures(documents, textCol, idCol, numHashes, shingleSize)
    if (graft.IterState.shouldStage(documents)) {
      // Stage the SLIM (id, sig) table only — 8·numHashes B/doc — for the
      // banding path's three consumers: the minhash kernel (numHashes
      // mixes per shingle, the heavy half) runs once. The verify's two
      // gram fetches stay LAZY on purpose: staging sh_hash too was A/B'd
      // and LOST at sf1 (q22 2.9 → 6.8 s — the per-doc shingle array is
      // the corpus-sized column, and writing + re-decoding it costs more
      // than re-running the cheap shingle kernel, whose sig expression
      // Catalyst prunes away in these branches).
      val sigsSlim = graft.IterState.copyOut(raw.select(col("id"), col("sig")))
      verifyPairs(candidatePairs(sigsSlim, bands, numHashes / bands), raw)
        .filter(col("jaccard") >= threshold)
    } else {
      val sigs = raw.repartition(col("id"))
      verifyPairs(candidatePairs(sigs, bands, numHashes / bands), sigs)
        .filter(col("jaccard") >= threshold)
    }
  }
}
