package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interpolated bigram language-model perplexity — the next rung above
  * [[UnigramLM]] on the statistical-quality-filter ladder (CCNet scores
  * documents under a 5-gram KenLM; the mechanics at any order are the ones
  * here: n-gram counts, a backoff/interpolation mix with the (n-1)-gram
  * model, per-event surprisal, per-document average).
  *
  *   p(w2 | w1) = lambda * c(w1 w2) / c(w1 *)  +  (1 - lambda) * c(w2) / N
  *
  * with lambda = 0.75; `c(w1 *)` is the count of bigram events starting
  * with w1 and `c(w2)/N` the corpus unigram model over the SAME bigram
  * event stream (second-token occurrences), so every probability is a
  * ratio of event counts from one consistent sample space and the
  * interpolation can never produce p = 0 for an observed event.
  *
  * Determinism across engines follows the round-9 DECIMAL-surprisal rule
  * ([[UnigramLM]] scaladoc): `-ln p` is rounded to 9dp ONCE per distinct
  * bigram type — evaluated inside the vocab-keyed `model` frame, BEFORE
  * the join back to per-document tf rows, so the plan computes exactly
  * one log per type — and carried as DECIMAL(19,9); the per-document sum of
  * `tf * surprisal` is exact integer-scaled arithmetic, order-independent;
  * only the final per-document division is float, on already-equal
  * operands (ln parity per the q82/q125/q134 precedent).
  *
  * Scale shape: the bigram stream is a map-only arrays_zip over each
  * document's token array (no self-join, no window); one (doc, w1, w2)
  * partial-aggregated count; bigram-vocab / left-context / unigram tables
  * are token-keyed aggregates of THAT table (tf rows, not raw events); the
  * three model joins are unhinted equi-joins — AQE broadcasts them while
  * the measured vocab fits and falls back to token-keyed shuffles when a
  * 100 TB corpus's bigram vocabulary doesn't. No data-sized windows,
  * nothing collected.
  */
object BigramLM {

  /** Per-(doc, w1, w2) adjacent-pair frequencies over whitespace tokens —
    * map-only pair construction via slice+zip of the token array.
    */
  def bigramFrequencies(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), split(trim(col("text")), " +").as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"),
        explode(arrays_zip(
          slice(col("toks"), lit(1), size(col("toks")) - 1),
          slice(col("toks"), lit(2), size(col("toks")) - 1))).as("pair"))
      .select(col("doc_id"),
        col("pair.0").as("w1"), col("pair.1").as("w2"))
      .filter(length(col("w1")) > 0 && length(col("w2")) > 0)
      .groupBy(col("doc_id"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("tf"))

  /** Per-document cross-entropy under the interpolated bigram model:
    * `(doc_id, n_bigrams, cross_entropy)`, ordered by doc_id upstream.
    */
  def crossEntropy(documents: DataFrame, lambda: Double = 0.75): DataFrame = {
    val tf = bigramFrequencies(documents)
    val vocab = tf.groupBy(col("w1"), col("w2")).agg(sum(col("tf")).as("c12"))
    val left = vocab.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val uni = vocab.groupBy(col("w2")).agg(sum(col("c12")).as("c2"))
    val total = vocab.agg(sum(col("c12")).as("n_total")) // 1-row broadcast
    val p = lit(lambda) * col("c12").cast("double") / col("c1").cast("double") +
      lit(1.0 - lambda) * col("c2").cast("double") / col("n_total").cast("double")
    // surprisal lives in the vocab-keyed model frame: one log+round per
    // DISTINCT bigram type, not per (doc, bigram) joined row
    val model = vocab
      .join(left, Seq("w1"))
      .join(uni, Seq("w2"))
      .crossJoin(broadcast(total))
      .select(col("w1"), col("w2"),
        round(-log(p), 9).cast("decimal(19,9)").as("surprisal"))
    tf.join(model, Seq("w1", "w2"))
      .select(col("doc_id"), col("tf"),
        (col("tf").cast("decimal(9,0)") * col("surprisal")).as("term"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_bigrams"), sum(col("term")).as("sum_nll"))
      .select(col("doc_id"), col("n_bigrams"),
        round(col("sum_nll").cast("double") /
          col("n_bigrams").cast("double"), 6).as("cross_entropy"))
  }
}
