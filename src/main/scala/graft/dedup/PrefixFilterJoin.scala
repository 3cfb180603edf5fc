package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EXACT similarity self-join via df-ordered prefix filtering — the
  * recall-guaranteed complement to the LSH family. MinHash/SimHash/cosine
  * LSH trade recall for cost (a true pair can land in no shared bucket);
  * prefix filtering enumerates a candidate superset that PROVABLY contains
  * every pair with Jaccard >= t, then verifies exactly — the SSJoin/PPJoin
  * construction (Chaudhuri et al., ICDE 2006; Xiao et al., WWW 2008).
  *
  * The filtering principle: order every document's token set by one global
  * total order and take each set's first ℓ − ⌈t·ℓ⌉ + 1 tokens as its
  * prefix. If J(A,B) >= t then |A∩B| >= ⌈t·max(ℓa,ℓb)⌉, and two sets with
  * an intersection that large MUST share at least one token inside these
  * prefixes — so joining on prefix tokens misses nothing. The global order
  * is ascending document frequency (rarest first): prefixes then hold each
  * document's RAREST tokens, and the candidate join's per-token fan-out is
  * bounded by the df of rare tokens. A size filter (den·min(ℓa,ℓb) >=
  * num·max — a necessary condition for J >= num/den) prunes candidates
  * before the verify.
  *
  * Tokens are WORD w-gram shingles (the [[MinHashLSH]] kernel), not char
  * n-grams — prefix filtering lives or dies on token cardinality. Measured
  * on the 5k-doc corpus: char 3-grams give ~380 distinct grams, so every
  * "rare" prefix token still hits ~1000 docs and the candidate join
  * explodes to ~5·10⁷ slots; word 5-grams give ~240k distinct shingles
  * and ~2.4·10³ candidate slots — four orders of magnitude, same corpus.
  *
  * Threshold arithmetic is exact-rational throughout (t = num/den over
  * longs): ⌈t·ℓ⌉ is ⌈(num·ℓ)/den⌉ in integer arithmetic, and the final
  * gate is den·|A∩B| >= num·|A∪B| — no float ever decides membership, so
  * the result is bit-stable and oracle-matchable.
  *
  * Shuffle shape at 100 TB: shingle (narrow codegen kernel) → one
  * shingle-keyed exchange for df → one doc-keyed exchange to assemble
  * df-sorted shingle arrays → prefix explode (~(1−t)·ℓ rows per doc) →
  * one shingle-keyed candidate join → semi-join-pruned verify over
  * candidate docs only. No all-pairs stage anywhere; every join is an
  * equi-join.
  */
object PrefixFilterJoin {

  /** ⌈(num·ℓ)/den⌉ — exact for ℓ·num far below 2^53 (the double division
    * below is exact up to there; set sizes are bounded by document token
    * counts, orders of magnitude under the limit).
    */
  private def ceilMul(l: org.apache.spark.sql.Column, num: Long, den: Long) =
    ceil((l.cast("long") * num).cast("double") / den).cast("long")

  /** All pairs (id1 < id2) with word-`shingleWords`-gram Jaccard
    * >= num/den, exactly. Output: id1, id2, inter_size, union_size
    * (longs; the similarity is inter/union — kept as exact integers so
    * the result is engine-independent).
    *
    * EXECUTION CONTRACT (round-16 ADVICE): above the [[shouldStage]]
    * input-size threshold this runs EAGER work at DataFrame-construction
    * time (a full shingle pass staged to scratch parquet via
    * [[graft.IterState.copyOut]]) — the returned frame scans those staged
    * files and is INVALIDATED by `IterState.purge`; build it only when you
    * will execute it, and purge only after consuming it. Below the
    * threshold the plan is fully lazy (small inputs recompute cheaper than
    * they stage — measured crossover between sf0.1 and sf1).
    */
  def similarPairs(documents: DataFrame, num: Long, den: Long,
                   shingleWords: Int = 5, textCol: String = "text",
                   idCol: String = "doc_id"): DataFrame = {
    val (grams, _, candSlots) =
      stages(documents, num, den, shingleWords, textCol, idCol)
    verify(candSlots.select(col("id1"), col("id2")).distinct(),
      grams, num, den)
  }

  /** Stage-to-scratch gate — the shared [[graft.IterState.shouldStage]]
    * policy (`spark.graft.stage.minBytes`, default 250 KB; for this
    * family sf0.1 staging measured a wash on this host — 1.6/1.8/1.9 s
    * staged vs 1.8/1.7/1.9 s lazy for q133/q145/q180 — and sf1 a clear
    * win, 6.4 → 3.4 s on q133).
    */
  private def shouldStage(documents: DataFrame): Boolean =
    graft.IterState.shouldStage(documents)

  /** The construction, staged: `(grams, prefix, candidate-slots)` — shared
    * by [[similarPairs]] and [[blockingStats]] so the audited counts are
    * counts of the REAL plan's frames, not a parallel reimplementation.
    *
    * Above the [[shouldStage]] input-size threshold the `grams` frame is
    * FILE-STAGED eagerly ([[graft.IterState.copyOut]]): it feeds three
    * downstream consumers (the df→sorted→prefix chain and the verify's two
    * gram fetches) whose subtrees Catalyst does not share — the round-15
    * plan re-ran the shingling kernel over the corpus once per consumer
    * (q133's physical plan held SIX documents scans; guide §1.2 step 1:
    * don't compute things twice). Staging writes one narrow (id, grams)
    * table to scratch and every consumer scans that instead — at 100 TB
    * this is the stage-to-scratch form the other multi-consumer operators
    * (Triangles adjacency, CorpusBuild hops) already use. Below the
    * threshold the staging write costs more than the recompute it saves
    * (round-16 measured q133 sf0.1 2.0 → 2.5 s) and the plan stays lazy.
    */
  private def stages(documents: DataFrame, num: Long, den: Long,
                     shingleWords: Int, textCol: String,
                     idCol: String): (DataFrame, DataFrame, DataFrame) = {
    require(num > 0 && den > 0 && num <= den,
      s"threshold must be a rational in (0,1]: $num/$den")
    // staging gated on input size (round-17, guide §1.2/§6): above the
    // [[shouldStage]] threshold each multi-consumer frame is file-staged
    // once; below it the fixed staging I/O costs more than the recompute
    // it saves and the plan stays lazy (the round-15 shape)
    val stageLarge = shouldStage(documents)
    def staged(df: DataFrame): DataFrame =
      if (stageLarge) graft.IterState.copyOut(df) else df
    // distinct 64-bit shingle-hash set per doc (same tokenization and
    // short-doc whole-text fallback as MinHashLSH.signatures / q22)
    // ensure() parallelizes the shingle kernel over one-row-group local
    // inputs (single-task scans otherwise run the whole tokenize+hash pass
    // on one core); no-op at real scale. Staged output is written once.
    val grams = staged(
      graft.Parallelize.ensure(documents
        .select(col(idCol).as("id"), col(textCol).as("__text")))
      .select(col("id"), split(trim(col("__text")), " +").as("toks"))
      .select(col("id"),
        MinHashExprs.shingleHashes(col("toks"), shingleWords).as("grams")))
    val tokens = grams.select(col("id"), explode(col("grams")).as("g"))
    val df = tokens.groupBy(col("g")).agg(count(lit(1)).as("df"))
    // assemble each doc's shingles sorted by the global (df asc, hash)
    // order; struct sort is lexicographic by field position
    val sorted = tokens.join(df, "g")
      .groupBy(col("id"))
      .agg(array_sort(collect_list(struct(col("df"), col("g")))).as("sorted"))
      .select(col("id"), col("sorted"), size(col("sorted")).cast("long").as("len"))
    // prefix length ℓ − ⌈t·ℓ⌉ + 1; explode only the prefix rows. Staged for
    // the same reason as grams: it feeds both sides of the candidate
    // self-join (whose exchanges Catalyst did not reuse) plus the funnel's
    // count branch, and its df-join + array_sort chain is two shuffles deep.
    val prefix = staged(sorted
      .select(col("id"), col("len"),
        explode(slice(col("sorted"), lit(1),
          (col("len") - ceilMul(col("len"), num, den) + 1).cast("int")))
          .as("p"))
      .select(col("id"), col("len"), col("p.g").as("g")))
    // candidates: shared prefix token + the size-ratio necessary condition
    val candSlots = prefix.as("x").join(prefix.as("y"),
        col("x.g") === col("y.g") && col("x.id") < col("y.id")
          && least(col("x.len"), col("y.len")) * den
             >= greatest(col("x.len"), col("y.len")) * num)
      .select(col("x.id").as("id1"), col("y.id").as("id2"))
    (grams, prefix, candSlots)
  }

  /** Exact verify over candidate docs only (semi-join-pruned gram fetch). */
  private def verify(cands: DataFrame, grams: DataFrame,
                     num: Long, den: Long): DataFrame = {
    val g1 = grams.select(col("id").as("id1"), col("grams").as("gr1"))
    val g2 = grams.select(col("id").as("id2"), col("grams").as("gr2"))
    cands.join(g1, "id1").join(g2, "id2")
      .select(col("id1"), col("id2"),
        size(array_intersect(col("gr1"), col("gr2"))).cast("long").as("inter_size"),
        size(array_union(col("gr1"), col("gr2"))).cast("long").as("union_size"))
      .filter(col("inter_size") * den >= col("union_size") * num)
  }

  /** One-row blocking-funnel audit — the no-silent-caps ledger for the
    * prefix-filter join: `(n_docs, n_prefix_rows, n_candidate_slots,
    * n_candidate_pairs, n_result_pairs)`. n_candidate_slots is the raw
    * prefix-join output (one row per shared prefix token passing the size
    * filter), n_candidate_pairs its distinct, n_result_pairs the verified
    * answer. n_docs / n_prefix_rows / n_result_pairs are independent of
    * the global token order and thus DuckDB-replayable (the oracle orders
    * by shingle STRING where the engine orders by 64-bit hash, so only the
    * order-blind counts can gate — the candidate counts are the logged
    * adjudication numbers, asserted by spec invariants instead).
    */
  def blockingStats(documents: DataFrame, num: Long, den: Long,
                    shingleWords: Int = 5, textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame = {
    val (grams, prefix, candSlots0) =
      stages(documents, num, den, shingleWords, textCol, idCol)
    // candSlots feeds three branches (slot count, distinct-pair count, the
    // verify path) — stage it once instead of re-running the prefix join
    // per branch; the verify reuses the SAME staged grams/candidates the
    // counts are counts of, so the funnel stays an audit of the real plan
    // (the round-15 form rebuilt the whole pipeline via similarPairs for
    // n_result_pairs: q180's physical plan held 26 documents scans).
    // Same input-size gate as stages(): below the threshold recompute
    // beats the staging write. Eager-execution + purge-lifetime contract
    // as documented on [[similarPairs]].
    val candSlots =
      if (shouldStage(documents)) graft.IterState.copyOut(candSlots0)
      else candSlots0
    val slots = candSlots
      .agg(count(lit(1)).as("n_candidate_slots"),
        count_distinct(struct(col("id1"), col("id2"))).as("n_candidate_pairs"))
    grams.agg(count(lit(1)).as("n_docs"))
      .crossJoin(prefix.agg(count(lit(1)).as("n_prefix_rows")))
      .crossJoin(slots)
      .crossJoin(verify(candSlots.select(col("id1"), col("id2")).distinct(),
          grams, num, den)
        .agg(count(lit(1)).as("n_result_pairs")))
      .select(col("n_docs"), col("n_prefix_rows"), col("n_candidate_slots"),
        col("n_candidate_pairs"), col("n_result_pairs"))
  }
}
