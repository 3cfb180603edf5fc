package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Soft (weight-based) exact dedup — the modern alternative to dropping
  * duplicates: every copy of a duplicated content is KEPT but its
  * sampling weight is 1/n_copies, so each distinct content contributes
  * total mass exactly 1 to the training distribution regardless of how
  * many times it was crawled (the "SoftDeDup" idea — e.g. Xia et al.,
  * arXiv 2401.00588 — and the down-weighting CC-pipeline variants use).
  * Dropping loses the copies' provenance and any cross-copy metadata;
  * weighting preserves them and lets the sampler decide.
  *
  * Weights are EXACT RATIONALS, never floats: each row carries
  * (weight_num = 1, weight_den = n_copies). Downstream samplers either
  * consume the rational directly (A-ES keying uses a double anyway) or
  * group by denominator — [[massProfile]] is that grouped audit:
  * per (lang, n_copies): docs, distinct contents, token mass. Every
  * column is an exact integer, and the soft token mass of a stratum is
  * derivable as sum_tokens / n_copies without any row-level division.
  *
  * 100 TB shape: one md5-keyed count aggregate (the q16/q21 exact-dedup
  * shuffle — map-side partials, O(1) reducer state) joined back onto the
  * corpus by the same key (exchange-reused), then a vocab-sized report
  * agg. No sort, no window, no driver state.
  */
object SoftDedup {

  /** The corpus with (n_copies, weight_num, weight_den) appended. */
  def weights(documents: DataFrame, textCol: String = "text"): DataFrame = {
    val withH = documents.withColumn("__h", md5(col(textCol)))
    val counts = withH.groupBy(col("__h"))
      .agg(count(lit(1)).as("n_copies"))
    withH.join(counts, Seq("__h"))
      .withColumn("weight_num", lit(1L))
      .withColumn("weight_den", col("n_copies"))
      .drop("__h")
  }

  /** Per (lang, n_copies) audit: docs, distinct contents, exact token
    * mass. n_copies is the GLOBAL copy count of the content (so a group
    * whose copies span languages contributes rows to several langs under
    * one n_copies — n_docs within a row is the copies-in-this-lang count,
    * and `n_docs = n_contents x n_copies` holds exactly when no group
    * crosses a language; SoftDedupSpec pins both cases).
    */
  def massProfile(documents: DataFrame, textCol: String = "text",
                  langCol: String = "lang"): DataFrame = {
    val withH = documents.withColumn("__h", md5(col(textCol)))
    val counts = withH.groupBy(col("__h")).agg(count(lit(1)).as("n_copies"))
    withH.join(counts, Seq("__h"))
      .groupBy(col(langCol), col("n_copies"))
      .agg(count(lit(1)).as("n_docs"),
        count_distinct(col("__h")).as("n_contents"),
        sum(graft.functions.TextFunctions.tokenCount(col(textCol)).cast("bigint"))
          .as("sum_tokens"))
      .orderBy(col(langCol), col("n_copies"))
  }
}
