package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance (Levenshtein <= 1) similarity self-join with GUARANTEED
  * recall via deletion neighborhoods — the SymSpell blocking idea: if
  * lev(s, t) <= 1 then D1(s) ∩ D1(t) is non-empty, where D1(x) is {x} plus
  * every string obtained by deleting ONE character of x. (Equal strings
  * share x itself; a substitution at position i puts the common
  * delete-at-i string in both sets; an insertion/deletion puts the shorter
  * string in both.) So a candidate equi-join on deletion variants provably
  * contains every qualifying pair, and a codegen'd `levenshtein` verify
  * removes the false candidates — the entity-resolution analogue of the
  * prefix-filter join: exact answer, no all-pairs stage, recall is a
  * theorem rather than an LSH probability.
  *
  * Scale shape: |s|+1 variant rows per string, ONE variant-keyed
  * equi-join, distinct on id pairs, then the verify filter. A variant
  * bucket can only hold strings within edit distance 2 of each other, so
  * bucket sizes stay bounded by the data's true near-duplicate density —
  * no quadratic blowup on skew. The verify is Spark's built-in
  * `levenshtein` (whole-stage codegen, O(|s|^2) per CANDIDATE pair only).
  */
object EditDistanceJoin {

  /** 1..len as an array, empty when len = 0: Spark's `sequence(1, 0)`
    * DESCENDS ([1, 0] — the same trap BpeTrainer's pair builder guards),
    * so an empty string must short-circuit or it grows two phantom
    * deletion positions.
    */
  private def positions(len: Column): Column =
    when(len < 1, array().cast("array<int>"))
      .otherwise(sequence(lit(1), len.cast("int")))

  /** The deletion-1 neighborhood of `s` as a distinct array: s itself plus
    * every delete-one-character variant. Length and the string are staged
    * as plain refs so the lambda body stays cheap per element.
    */
  def deletionVariants(s: Column, len: Column): Column =
    array_distinct(concat(
      array(s),
      transform(positions(len), i =>
        concat(s.substr(lit(1), i - 1), s.substr(i + 1, len)))))

  /** All unordered pairs (id1 < id2) with lev(str1, str2) <= 1, with the
    * verified distance. Exact — the deletion-neighborhood candidates are a
    * superset of the answer by construction.
    *
    * Stage order matters at scale (round-10): the verify runs BEFORE the
    * pair distinct, in the same stage as the candidate join, so the false
    * candidates die in place and never cross the distinct's exchange; only
    * true pairs (counted once per surviving shared-variant channel, a
    * small constant) reach it. The verify itself is the THRESHOLD form of
    * `levenshtein` (banded DP, O(len·(2k+1)) instead of O(len²), returns
    * -1 above the bound) — both changes together took q136 from 37 s to
    * the single digits at sf1.
    *
    * Round 12, adjudicated by the measured funnel (THREESCALE.md): the
    * candidate join keys on xxhash64 of each variant (8-byte keys on the
    * wire instead of ~18-byte UTF8 strings; recall survives hashing
    * deterministically — a lev<=1 pair shares a variant STRING v, so both
    * sides emit exactly xxhash64(v) and the equi-join matches, while a
    * cross-string collision can only ADD a candidate that the exact
    * verify kills) and PRUNES cross-position deletion matches with a
    * residual position
    * test. Every lev<=1 pair survives through a position-consistent
    * channel — equal strings match full-vs-full (pos -1 = -1), a
    * substitution at p matches delete-at-p vs delete-at-p (same pos), and
    * an insert/delete pair matches the shorter FULL string (pos -1)
    * against the longer side's deletion — so recall stays a theorem,
    * while delete-at-i(s) = delete-at-j(t) with i != j (the
    * transposition-shaped distance-2 bulk: 78% of all candidate rows at
    * sf1, measured 15.2M -> 3.5M) dies in the join's residual instead of
    * reaching the levenshtein.
    */
  def similarPairs(df: DataFrame, idCol: String, strCol: String): DataFrame =
    verified(variantRows(df, idCol, strCol))
      .filter(col("dist") >= 0) // -1 = distance above the threshold
      .distinct() // true pairs sharing several variants appear once

  /** `(id, s, pos, vh)` — the full string at pos -1 plus one row per
    * deletion position (positions kept distinct even when two deletions
    * of a run of equal characters produce the same variant string — the
    * position is part of the candidate-channel key).
    */
  private def variantRows(df: DataFrame, idCol: String, strCol: String): DataFrame =
    df.select(col(idCol).as("id"), col(strCol).as("s"))
      .withColumn("len", length(col("s")))
      .withColumn("pv", explode(concat(
        array(struct(lit(-1).as("pos"), xxhash64(col("s")).as("vh"))),
        transform(positions(col("len")), i =>
          struct(i.cast("int").as("pos"),
            xxhash64(concat(col("s").substr(lit(1), i - 1),
              col("s").substr(i + 1, col("len")))).as("vh"))))))
      .select(col("id"), col("s"), col("pv.pos").as("pos"), col("pv.vh").as("vh"))

  /** Candidate join + in-stage threshold verify, pre-distinct: one row per
    * position-consistent shared variant hash, `dist` = lev or -1 above
    * the threshold. The vh equality is the hash-join key; the position
    * test rides the join as a residual (an int compare per matched row,
    * evaluated before any downstream expression).
    *
    * The SHUFFLE_HASH hint matters: Catalyst sizes the variant stream from
    * the parquet FILE bytes and misses the (len+1)-fold explode
    * amplification, so it happily broadcasts millions of variant rows
    * (measured at sf1: a 2.85M-row BroadcastHashJoin build, 20 s vs 7 s
    * shuffled, and a driver OOM waiting to happen at any real scale). A
    * variant-keyed shuffle splits both sides by vh — per-partition state
    * is corpus/partitions-sized, the 100 TB-safe shape — and beats
    * sort-merge because neither side needs a sort.
    */
  private def verified(variants: DataFrame): DataFrame =
    variants.as("a").hint("shuffle_hash").join(variants.as("b"),
        col("a.vh") === col("b.vh") && col("a.id") < col("b.id")
          && (col("a.pos") === col("b.pos")
            || col("a.pos") === -1 || col("b.pos") === -1))
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        col("a.s").as("s1"), col("b.s").as("s2"))
      .withColumn("dist", levenshtein(col("s1"), col("s2"), 1))

  /** One-row blocking-funnel audit — the no-silent-caps ledger for the
    * candidate join: `(n_strings, n_variant_rows, n_candidates,
    * n_verified, n_pairs)`. n_candidates is the join's output BEFORE the
    * verify (the stage whose growth rate decides whether the plan holds
    * at 100 TB), n_verified counts post-threshold rows pre-distinct, and
    * n_pairs is the final answer size. Oracle-replayable with variant
    * STRINGS on the DuckDB side, so a passing gate is simultaneously the
    * hash-collision audit for [[deletionVariantHashes]] (a cross-string
    * collision would inflate n_candidates on the engine side only).
    */
  def blockingStats(df: DataFrame, idCol: String, strCol: String): DataFrame = {
    val base = df.select(col(idCol).as("id"), col(strCol).as("s"))
    val variants = variantRows(df, idCol, strCol)
    val funnel = verified(variants).agg(
      count(lit(1)).as("n_candidates"),
      sum(when(col("dist") >= 0, lit(1L)).otherwise(lit(0L))).as("n_verified"),
      count_distinct(when(col("dist") >= 0,
        struct(col("id1"), col("id2")))).as("n_pairs"))
    base.agg(count(lit(1)).as("n_strings"))
      .crossJoin(variants.agg(count(lit(1)).as("n_variant_rows")))
      .crossJoin(funnel)
      .select(col("n_strings"), col("n_variant_rows"), col("n_candidates"),
        col("n_verified"), col("n_pairs"))
  }
}
