package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level overlap estimation via MinHash sketches: the Jaccard
  * similarity of two corpora's (normalized-)document SETS, estimated from
  * `H` per-corpus minima instead of a cross-corpus distinct join — the
  * question "how much of crawl B is already in crawl A?" answered with
  * `H · 8` bytes of mergeable state per corpus.
  *
  * Estimator (Broder's classic min-wise permutation argument, public):
  * for each of `H` seeded hash functions, P[min over A == min over B] =
  * J(A, B); the mean of the H indicators is an unbiased estimate with
  * variance J(1−J)/H (±0.06 absolute at H=256).
  *
  * Scale shape: the sketch is a `groupBy(corpus, i)` min-aggregate —
  * map-side combine collapses every partition to H rows per corpus before
  * the exchange, so the shuffle is O(H · corpora) regardless of corpus
  * size. A duplicated document cannot change any minimum, so the sketch
  * needs NO distinct pre-pass. Sketches for daily increments OR-merge by
  * taking element-wise min (same mergeability story as the HLL rollup,
  * q67) — the 100 TB form stores one tiny sketch per partition-day and
  * never rescans history.
  */
object CorpusOverlap {

  /** Per-(corpus, hash-index) minima: `(corpusCol, i, minh)`, H rows per
    * corpus. `i` fans out row-side via a literal-array explode — the rows
    * exist only map-side; the aggregate collapses them before any shuffle.
    */
  def sketches(df: DataFrame, corpusCol: String, textCol: String,
               numHashes: Int = 256): DataFrame = {
    val th = xxhash64(NgramJaccard.normalized(col(textCol)))
    df.select(col(corpusCol), th.as("th"))
      .select(col(corpusCol),
        explode(typedLit((0 until numHashes).toArray)).as("i"), col("th"))
      .groupBy(col(corpusCol), col("i"))
      .agg(min(xxhash64(col("i"), col("th"))).as("minh"))
  }

  /** Merge two sketch sets for the same hash family: element-wise min —
    * the union sketch (how daily sketches roll up).
    */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col(a.columns.head), col("i"))
      .agg(min(col("minh")).as("minh"))

  /** Jaccard estimate between two corpora out of a sketch table: one row
    * `(est_jaccard)`. The H-row join is trivially broadcast.
    */
  def estimate(sk: DataFrame, corpusCol: String,
               corpusA: String, corpusB: String): DataFrame = {
    val a = sk.filter(col(corpusCol) === corpusA)
      .select(col("i"), col("minh").as("min_a"))
    val b = sk.filter(col(corpusCol) === corpusB)
      .select(col("i"), col("minh").as("min_b"))
    a.join(b, Seq("i"))
      .agg((sum(when(col("min_a") === col("min_b"), 1L).otherwise(0L))
        .cast("double") / count(lit(1)).cast("double")).as("est_jaccard"))
  }
}
