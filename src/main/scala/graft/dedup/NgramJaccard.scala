package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Character n-gram Jaccard similarity — the exact-verification complement
  * to MinHash (which approximates Jaccard over word shingles).
  *
  * Pair enumeration is delegated to a blocking strategy (LSH candidates, or
  * any caller-provided pair table): all-pairs Jaccard is O(n²) and is never
  * materialized here. The similarity itself is per-row set arithmetic over
  * n-gram arrays — narrow, codegen'd, shuffle-free.
  */
object NgramJaccard {

  /** Whitespace-collapsed lowercased text — materialize this as its OWN
    * projected column before calling the n-gram builders: an expression
    * inlined into a `transform` lambda is re-evaluated per array element
    * (regex-per-ngram instead of regex-per-row — an order-of-magnitude trap).
    *
    * The whitespace class is the EXPLICIT `[ \t\n\f\r]+`, not `\s+`:
    * Java's `\s` includes vertical tab (\x0B) while RE2's does not — the
    * [[graft.operators.SplitPlan]] cross-engine discipline, applied here so
    * the DuckDB oracles replaying this normalization agree on \x0B-bearing
    * text.
    */
  def normalized(text: Column): Column =
    regexp_replace(lower(trim(text)), "[ \\t\\n\\f\\r]+", " ")

  /** All character n-grams of a pre-normalized text column, with
    * duplicates. `norm` should be a plain column reference (see
    * [[normalized]]).
    */
  def rawCharNgrams(norm: Column, n: Int = 3): Column = {
    val len = length(norm)
    when(len >= n,
      transform(sequence(lit(1), len - n + 1), i => norm.substr(i, lit(n))))
      .otherwise(array(norm))
  }

  /** Distinct character n-grams. */
  def charNgrams(norm: Column, n: Int = 3): Column =
    array_distinct(rawCharNgrams(norm, n))

  /** Distinct 64-bit hashes of the n-grams. Set arithmetic over longs is
    * ~an order of magnitude cheaper than over UTF8 strings (array_distinct /
    * array_intersect are quadratic scans, so element-compare cost dominates);
    * at 64 bits the collision probability for ~10³-gram documents is
    * negligible, so Jaccard over hashes equals Jaccard over strings.
    */
  def charNgramHashes(norm: Column, n: Int = 3): Column =
    array_distinct(transform(rawCharNgrams(norm, n), g => xxhash64(g)))

  /** Jaccard of two n-gram(-hash) arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** Exact n-gram Jaccard for given (id1, id2) pairs against the corpus.
    * Gram sets are computed ONLY for documents referenced by a pair (semi
    * join first), normalization is a separate projection (per-row, not
    * per-element), and the two pair-joins are plain hash joins.
    */
  def forPairs(pairs: DataFrame, documents: DataFrame, n: Int = 3,
               textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val ids = pairs.select(col("id1").as("id"))
      .union(pairs.select(col("id2").as("id"))).distinct()
    val grams = documents
      .join(broadcast(ids), col(idCol) === col("id"), "left_semi")
      .select(col(idCol).as("id"), normalized(col(textCol)).as("t"))
      .select(col("id"), charNgramHashes(col("t"), n).as("grams"))
    val g1 = grams.select(col("id").as("id1"), col("grams").as("gr1"))
    val g2 = grams.select(col("id").as("id2"), col("grams").as("gr2"))
    pairs.join(g1, "id1").join(g2, "id2")
      .select(col("id1"), col("id2"), jaccard(col("gr1"), col("gr2")).as("ngram_jaccard"))
  }

  /** Containment C(a, b) = |a ∩ b| / |a|: the asymmetric companion to
    * Jaccard that catches SUBSTRING duplication — when document a is a
    * prefix/excerpt of document b, every n-gram of a appears in b, so
    * C(a, b) = 1 while J(a, b) can be arbitrarily small. Real corpus
    * cleaning needs both (truncated re-crawls and quote-heavy pages are
    * containment-dups, not Jaccard-dups). Broder's resemblance/containment
    * pair, "On the resemblance and containment of documents", 1997.
    */
  def containment(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(a).cast("double")

  /** Jaccard AND containment-of-id1-in-id2 for given (id1, id2) pairs —
    * same semi-join-pruned, shuffle-light shape as [[forPairs]].
    */
  def forPairsWithContainment(pairs: DataFrame, documents: DataFrame, n: Int = 3,
                              textCol: String = "text",
                              idCol: String = "doc_id"): DataFrame = {
    val ids = pairs.select(col("id1").as("id"))
      .union(pairs.select(col("id2").as("id"))).distinct()
    val grams = documents
      .join(broadcast(ids), col(idCol) === col("id"), "left_semi")
      .select(col(idCol).as("id"), normalized(col(textCol)).as("t"))
      .select(col("id"), charNgramHashes(col("t"), n).as("grams"))
    val g1 = grams.select(col("id").as("id1"), col("grams").as("gr1"))
    val g2 = grams.select(col("id").as("id2"), col("grams").as("gr2"))
    pairs.join(g1, "id1").join(g2, "id2")
      .select(col("id1"), col("id2"),
        jaccard(col("gr1"), col("gr2")).as("ngram_jaccard"),
        containment(col("gr1"), col("gr2")).as("containment_1_in_2"))
  }

  /** Near-dups: MinHash-LSH candidates verified by char-n-gram Jaccard. */
  def nearDuplicates(documents: DataFrame, threshold: Double = 0.8,
                     n: Int = 3): DataFrame = {
    val sigs = MinHashLSH.signatures(documents)
    val cands = MinHashLSH.candidatePairs(sigs)
    forPairs(cands, documents, n)
      .filter(col("ngram_jaccard") >= threshold)
      .orderBy(col("id1"), col("id2"))
  }
}
