package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Template-family collapse with QUALITY-AWARE canonical selection — the
  * boilerplate stage of a corpus build: web-scale corpora are full of
  * template families (same opening boilerplate, different tails: listings,
  * mirrors, generated pages). Exact dedup (q16/q21) only collapses
  * byte-identical copies and must keep an arbitrary member (min doc_id —
  * within an exact group every member is identical, so quality cannot
  * discriminate). Here the grouping key is the document's OPENING PREFIX
  * (first `prefixTokens` whitespace tokens, hashed), members genuinely
  * differ, and the canonical pick is the member with the highest quality
  * score — "keep the best copy of each template", not "keep the first".
  *
  * Determinism/replay: key = md5 of the space-joined prefix (md5 is the
  * q16/q21 cross-engine content-hash contract), score = any integer
  * quality column (the gated query uses the q155 hashed-n-gram margin),
  * ties broken by doc_id.
  *
  * Scale shape: ONE partial→final aggregation — the argmax is
  * `max(struct(score, -id))`, which combines associatively, so the map
  * side reduces every partition to one candidate per family before the
  * exchange (no window sort, no second shuffle). At 100 TB this is a
  * plain keyed agg over a narrow (key, id, score) projection.
  */
object TemplateCanon {

  /** md5 key over the first `n` whitespace tokens (whole text if shorter —
    * the q99 short-doc convention).
    */
  def prefixKey(text: Column, n: Int): Column =
    md5(array_join(slice(split(trim(text), " +"), 1, n), " "))

  /** One row per template family with >= 2 members: the kept (highest
    * score, then lowest id) member, family size, and dropped count.
    */
  def collapse(docs: DataFrame, scoreCol: Column, prefixTokens: Int = 8)
      : DataFrame = {
    val m = docs.select(col("doc_id"),
      prefixKey(col("text"), prefixTokens).as("family_key"),
      scoreCol.cast("long").as("_score"))
    m.groupBy(col("family_key"))
      .agg(count(lit(1)).as("n_members"),
        max(struct(col("_score"), (-col("doc_id")).as("_negid"))).as("_best"))
      .filter(col("n_members") > 1)
      .select(col("family_key"), col("n_members"),
        (-col("_best._negid")).as("kept_id"),
        col("_best._score").as("kept_score"),
        (col("n_members") - 1).as("n_dropped"))
  }
}
