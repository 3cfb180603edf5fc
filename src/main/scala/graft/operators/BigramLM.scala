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
  * the join back to per-document event rows, so the plan computes
  * exactly one log per type — and carried as DECIMAL(19,9); the
  * per-document surprisal sum is exact integer-scaled arithmetic,
  * order-independent (summing per event equals summing tf-weighted per
  * type bit-for-bit); only the final per-document division is float, on
  * already-equal operands (ln parity per the q82/q125/q134 precedent).
  *
  * Scale shape (round-13 funnel-adjudicated, THREESCALE.md §13): the
  * bigram stream is a map-only arrays_zip over each document's token
  * array (no self-join, no window); the bigram-vocab table is a
  * map-side-compressing aggregate of that stream (events collapse to
  * vocab rows inside each scan partition — the shuffle ships ~vocab-
  * sized partials), left-context / unigram tables are token-keyed
  * aggregates of the vocab table; the model joins are SHUFFLE_HASH with
  * the vocab-sized side as build (probe streams unsorted, per-reducer
  * hash state is vocab/partitions — no broadcast cliff, no probe sort).
  * The event stream joins the model DIRECTLY — no per-(doc, bigram)
  * pre-aggregation, which the funnel measured at 3.5% compression for a
  * full event-sized exchange. One event-sized shuffle total (the model
  * probe), then a doc-keyed partial-aggregated reduce. No data-sized
  * windows, nothing collected.
  */
object BigramLM {

  /** Per-(doc, w1, w2) adjacent-pair frequencies over whitespace tokens —
    * map-only pair construction via slice+zip of the token array.
    */
  def bigramFrequencies(documents: DataFrame): DataFrame =
    bigramEvents(documents)
      .groupBy(col("doc_id"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("tf"))

  /** Funnel numbers behind the q165 decade-scaling adjudication (the
    * q136/q133 measured-not-argued discipline): one row of per-corpus
    * sizes for every stage of the model build — bigram events, tf rows
    * (the join probe side), bigram vocabulary (the model build side and
    * the join key space), left-context and unigram vocabularies. The
    * decade ratios of these five counts decide whether q165's wall-clock
    * growth is vocab-driven (model tables outgrowing broadcast — the
    * designed AQE shift) or event-driven (the pair stream itself).
    */
  def funnelStats(documents: DataFrame): DataFrame = {
    val tf = bigramFrequencies(documents)
    tf.agg(
      countDistinct(col("doc_id")).as("n_docs"),
      sum(col("tf")).as("n_events"),
      count(lit(1)).as("n_tf_rows"),
      countDistinct(col("w1"), col("w2")).as("n_vocab"),
      countDistinct(col("w1")).as("n_left"),
      countDistinct(col("w2")).as("n_uni"))
  }

  /** Per-document cross-entropy under the interpolated bigram model:
    * `(doc_id, n_bigrams, cross_entropy)`, ordered by doc_id upstream.
    */
  /** Raw per-event bigram stream `(doc_id, w1, w2)` — map-only, no
    * aggregation. [[crossEntropy]] probes the model with THIS rather than
    * [[bigramFrequencies]]: the round-13 funnel measured the per-(doc,
    * bigram) pre-aggregation compressing events by only 3.5% (25.6M tf
    * rows vs 26.5M events at sf10 — documents rarely repeat a bigram)
    * while costing a full-size exchange on (doc, w1, w2). Dropping it
    * removes one of the two event-sized shuffles outright; the decimal
    * surprisal sum is order-independent, so summing per-event equals
    * summing tf-weighted per-type bit-for-bit.
    */
  def bigramEvents(documents: DataFrame): DataFrame =
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

  def crossEntropy(documents: DataFrame, lambda: Double = 0.75): DataFrame = {
    val events = bigramEvents(documents)
    val vocab = events.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12"))
    val left = vocab.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val uni = vocab.groupBy(col("w2")).agg(sum(col("c12")).as("c2"))
    val total = vocab.agg(sum(col("c12")).as("n_total")) // 1-row broadcast
    val p = lit(lambda) * col("c12").cast("double") / col("c1").cast("double") +
      lit(1.0 - lambda) * col("c2").cast("double") / col("n_total").cast("double")
    // surprisal lives in the vocab-keyed model frame: one log+round per
    // DISTINCT bigram type, not per (doc, bigram) joined row
    // SHUFFLE_HASH on the vocab-sized sides (the round-13 q165 funnel
    // adjudication, THREESCALE.md §13): at sf10 the unhinted joins left
    // AQE's broadcast envelope and fell back to SortMergeJoin — sorting
    // the 25.6M-row event probe stream for a join whose build side is
    // the 77k-row model table. The hint builds the hash map on the
    // model side (vocab rows / partition, bounded per-reducer state —
    // no broadcast driver-memory cliff at a 100 TB corpus's
    // vocabulary) and streams the events unsorted.
    val model = vocab
      .join(left.hint("shuffle_hash"), Seq("w1"))
      .join(uni.hint("shuffle_hash"), Seq("w2"))
      .crossJoin(broadcast(total))
      .select(col("w1"), col("w2"),
        round(-log(p), 9).cast("decimal(19,9)").as("surprisal"))
    events.join(model.hint("shuffle_hash"), Seq("w1", "w2"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("surprisal")).as("sum_nll"))
      .select(col("doc_id"), col("n_bigrams"),
        round(col("sum_nll").cast("double") /
          col("n_bigrams").cast("double"), 6).as("cross_entropy"))
  }
}
