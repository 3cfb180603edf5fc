package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram language-model perplexity scoring — the classic statistical
  * quality filter for LLM training corpora (CCNet-style: score every
  * document's cross-entropy under a language model and gate/bucket on it;
  * here the LM is the corpus's own unigram distribution, so the score is
  * "how surprising is this document relative to the corpus").
  *
  * Determinism across engines is the hard part: a per-document SUM of
  * `ln p(token)` doubles is order-dependent, and Spark and DuckDB sum in
  * different orders. So each token type's surprisal `-ln p` is rounded to
  * 9 decimals ONCE and carried as an exact DECIMAL; the per-document sum of
  * `tf * surprisal` is then exact integer-scaled arithmetic — bit-identical
  * regardless of summation order (the q125/q82 ln-parity + exact-moments
  * pattern). Only the final division is float, applied to already-equal
  * operands.
  *
  * Scale shape: one (doc, token) partial-aggregated count, one token-keyed
  * vocab aggregation, one token-keyed equi-join (tf rows, not raw token
  * occurrences — bounded by distinct doc×token, with AQE handling the
  * stop-word skew), one doc-keyed aggregation. No window over data-sized
  * partitions, nothing collected; the vocab join carries NO broadcast hint,
  * so size-based planning broadcasts it only while the measured vocab fits
  * and falls back to the token-keyed shuffle join when a 100 TB corpus's
  * vocabulary doesn't (PlanSpec pins the unhinted form).
  */
object UnigramLM {

  /** Per-(doc, token) term frequencies over whitespace tokens — the shared
    * first aggregation (same tokenization as the q49/q82 text surface).
    */
  def termFrequencies(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), explode(split(trim(col("text")), " +")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))

  /** Per-document cross-entropy under the corpus unigram model:
    * `(doc_id, n_tokens, cross_entropy)` where cross_entropy =
    * -(1/n) * sum_i ln p(token_i) and p(t) = corpus count of t / corpus
    * token total. Higher = more surprising (rarer vocabulary).
    */
  def crossEntropy(documents: DataFrame): DataFrame = {
    val tf = termFrequencies(documents)
    val vocab = tf.groupBy(col("token")).agg(sum(col("tf")).as("c"))
    val total = vocab.agg(sum(col("c")).as("n_total")) // 1-row broadcast
    // decimal(19,9) * decimal(9,0) = decimal(29,9): comfortably inside
    // Spark's 38-digit exact range (above it Spark silently drops scale,
    // breaking the cross-engine bit-equality this hinges on). tf per doc
    // is < 10^9 tokens and surprisal < 10^10, so no overflow either.
    val surprisal = round(-log(col("c").cast("double") /
      col("n_total").cast("double")), 9).cast("decimal(19,9)")
    tf.join(vocab, Seq("token"))
      .crossJoin(broadcast(total))
      .select(col("doc_id"), col("tf"),
        (col("tf").cast("decimal(9,0)") * surprisal).as("term"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_tokens"), sum(col("term")).as("sum_nll"))
      .select(col("doc_id"), col("n_tokens"),
        round(col("sum_nll").cast("double") /
          col("n_tokens").cast("double"), 6).as("cross_entropy"))
  }
}
