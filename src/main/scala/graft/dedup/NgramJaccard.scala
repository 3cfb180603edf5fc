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

  /** Distinct character n-grams of lowercased text (whitespace collapsed). */
  def charNgrams(text: Column, n: Int = 3): Column = {
    val norm = regexp_replace(lower(trim(text)), "\\s+", " ")
    val len = length(norm)
    when(len >= n,
      array_distinct(transform(sequence(lit(1), len - n + 1),
        i => norm.substr(i, lit(n)))))
      .otherwise(array(norm))
  }

  /** Jaccard of two n-gram arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** Exact n-gram Jaccard for given (id1, id2) pairs against the corpus. */
  def forPairs(pairs: DataFrame, documents: DataFrame, n: Int = 3,
               textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val grams = documents.select(col(idCol).as("id"),
      charNgrams(col(textCol), n).as("grams"))
    val g1 = grams.select(col("id").as("id1"), col("grams").as("g1"))
    val g2 = grams.select(col("id").as("id2"), col("grams").as("g2"))
    pairs.join(g1, "id1").join(g2, "id2")
      .select(col("id1"), col("id2"), jaccard(col("g1"), col("g2")).as("ngram_jaccard"))
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
