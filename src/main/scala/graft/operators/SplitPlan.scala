package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.KmvSketch

/** Deterministic content-hash train/val/test split + cross-split leakage
  * audit — the dataset-versioning half every training run needs before it
  * can trust its eval numbers.
  *
  * The split key is the CONTENT hash, not the row id: the bucket is
  * `kmv_key(normalized text) mod 100` (the engine-replayable rolling-31 →
  * Knuth-spread key of the KMV/dedup family, [[graft.functions.KmvKernels]]),
  * so byte-identical documents land in the SAME split by construction —
  * the dedup-coherent property that stops an exact duplicate of a training
  * document from inflating eval scores. Reassigning after re-shuffling,
  * re-partitioning or re-ingesting the corpus yields the identical split:
  * no RNG, no row order, no id allocation anywhere in the decision.
  *
  * Scale shape: `assign` is map-only (one codegen'd hash per row);
  * `manifest` is one (split, lang) aggregate over narrow columns.
  * `leakage` explodes token n-grams on both sides of the split boundary,
  * distincts the train side, and semi-joins val grams against it — all
  * gram-keyed equi-joins (the q80 decontamination shape applied to the
  * split boundary); nothing is broadcast except what AQE chooses.
  */
object SplitPlan {

  /** Normalized content bucket in [0, 100): collapse whitespace, lowercase,
    * hash, spread, mod. Identical text → identical bucket, any engine.
    *
    * The whitespace class is the EXPLICIT `[ \t\n\f\r]+`, not `\s+`: Java's
    * `\s` includes vertical tab (\x0B) while RE2's does not, so a `\s+`
    * normalization would bucket a \x0B-bearing document differently in
    * Spark vs a RE2-based engine replaying the split — and a cross-engine
    * split divergence is the one failure this operator exists to prevent.
    * Same engine-identical-subset discipline as [[PiiScrub]].
    */
  def contentBucket(text: Column): Column =
    pmod(KmvSketch.kmvKey(
      regexp_replace(lower(trim(text)), "[ \\t\\n\\f\\r]+", " ")), lit(100L))

  /** Adds `bucket` and `split` ("train" / "val" / "test") columns.
    * Fractions are integer percents; train takes [0, pctTrain), val
    * [pctTrain, pctTrain+pctVal), test the rest.
    */
  def assign(docs: DataFrame, textCol: String,
             pctTrain: Int = 80, pctVal: Int = 10): DataFrame = {
    require(pctTrain > 0 && pctVal >= 0 && pctTrain + pctVal < 100,
      s"invalid split percents ($pctTrain, $pctVal)")
    docs
      .withColumn("bucket", contentBucket(col(textCol)))
      .withColumn("split",
        when(col("bucket") < pctTrain, lit("train"))
          .when(col("bucket") < pctTrain + pctVal, lit("val"))
          .otherwise(lit("test")))
  }

  /** Split manifest: `(split, lang, n_docs, n_tokens, n_chars, id_sum)`
    * ordered by (split, lang) — the card a training run records so the
    * exact split is auditable later (id_sum is the cheap integrity
    * checksum: same corpus + same percents must reproduce it).
    */
  def manifest(assigned: DataFrame, idCol: String, textCol: String,
               langCol: String): DataFrame = {
    val t = trim(col(textCol))
    assigned.groupBy(col("split"), col(langCol).as("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(length(t) === 0, lit(0))
          .otherwise(size(split(t, " +")))).as("n_tokens"),
        sum(length(col(textCol))).as("n_chars"),
        sum(col(idCol)).as("id_sum"))
      .orderBy(col("split"), col("lang"))
  }

  /** Token n-grams of each row as one exploded `(… , gram)` stream; rows
    * shorter than `n` tokens contribute nothing (guarded BEFORE sequence()
    * so the range never runs backwards).
    */
  private def grams(df: DataFrame, textCol: String, n: Int): DataFrame = {
    val toks = split(trim(col(textCol)), " +")
    df.withColumn("toks", toks)
      .filter(size(col("toks")) >= n)
      .withColumn("gram", explode(transform(
        sequence(lit(1), size(col("toks")) - lit(n - 1)),
        i => concat_ws(" ", slice(col("toks"), i, lit(n))))))
  }

  /** Cross-split leakage audit: per val-side language,
    * `(lang, n_val_docs, n_leaked_docs, n_leaked_grams)` where a leak is a
    * val-document token n-gram that also occurs anywhere in the train
    * split. Exact duplicates can never leak here — the content-hash split
    * puts them in one split — so what this surfaces is PARTIAL overlap
    * (shared boilerplate, near-duplicate passages) crossing the boundary.
    */
  def leakage(assigned: DataFrame, idCol: String, textCol: String,
              langCol: String, n: Int = 5): DataFrame = {
    val train = assigned.filter(col("split") === "train")
    val valSide = assigned.filter(col("split") === "val")
    val trainGrams = grams(train, textCol, n).select(col("gram")).distinct()
    val valGrams = grams(valSide, textCol, n)
      .select(col(langCol).as("lang"), col(idCol).as("id"), col("gram"))
    val leaked = valGrams.join(trainGrams, Seq("gram"), "left_semi")
    val leakedAgg = leaked.groupBy(col("lang"))
      .agg(countDistinct(col("id")).as("n_leaked_docs"),
        countDistinct(col("gram")).as("n_leaked_grams"))
    valSide.groupBy(col(langCol).as("lang"))
      .agg(count(lit(1)).as("n_val_docs"))
      .join(leakedAgg, Seq("lang"), "left")
      .select(col("lang"), col("n_val_docs"),
        coalesce(col("n_leaked_docs"), lit(0L)).as("n_leaked_docs"),
        coalesce(col("n_leaked_grams"), lit(0L)).as("n_leaked_grams"))
      .orderBy(col("lang"))
  }
}
