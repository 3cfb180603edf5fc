package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** N-gram frequency-spectrum audit — the corpus statistician's view of
  * type/token structure: for each occurrence count f = 1..capF, how many
  * distinct n-gram TYPES occur exactly f times and how much token mass
  * they carry, with everything above capF collapsed into one tail bucket
  * (reported as capF+1). The f=1 row is the hapax-legomenon count — the
  * single most-watched number when judging whether a crawl slice is
  * natural text, boilerplate, or template spam (natural corpora are
  * Zipfian: roughly half the types are hapaxes; template-heavy corpora
  * collapse into the tail bucket).
  *
  * Scale shape: one token/n-gram explode (map-only), one type-keyed
  * count aggregate (the vocabulary-sized table every LM stage already
  * builds — partial aggregation collapses repeats map-side), then a
  * capF+1-row spectrum aggregate. Nothing is collected; the output is at
  * most capF+1 rows regardless of corpus size.
  */
object FreqSpectrum {

  /** `(fb, n_types, mass)` for fb = 1..capF plus the capF+1 tail bucket,
    * ordered by fb; empty buckets are absent. `mass` is the total token
    * occurrences carried by that bucket's types.
    */
  def spectrum(docs: DataFrame, textCol: String, n: Int = 3,
               capF: Int = 10): DataFrame = {
    require(n >= 1 && capF >= 1, s"invalid spectrum params n=$n capF=$capF")
    val toks = split(trim(col(textCol)), " +")
    val grams = docs
      .withColumn("toks", toks)
      .filter(size(col("toks")) >= n)
      .select(explode(transform(
        sequence(lit(1), size(col("toks")) - lit(n - 1)),
        i => concat_ws(" ", slice(col("toks"), i, lit(n))))).as("g"))
    grams.groupBy(col("g")).agg(count(lit(1)).as("f"))
      .withColumn("fb", least(col("f"), lit(capF + 1L)))
      .groupBy(col("fb"))
      .agg(count(lit(1)).as("n_types"), sum(col("f")).as("mass"))
      .orderBy(col("fb"))
  }
}
