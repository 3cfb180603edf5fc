package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact deduplication by content hash — the first stage of any
  * training-data dedup stack.
  *
  * Scale design: the groupBy shuffles on the 128-bit content hash (md5), so
  * data distributes uniformly regardless of content skew; each group keeps
  * only min(doc_id) + a count, so reducer state is O(1) per distinct
  * document. At 100 TB this is one well-balanced shuffle; no driver
  * materialization.
  */
object ExactDedup {

  /** One row per distinct text: canonical (lowest) doc_id, duplicate count. */
  def groups(documents: DataFrame, textCol: String = "text",
             idCol: String = "doc_id"): DataFrame =
    documents
      .groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("canonical_id"),
        count(lit(1)).as("n_copies"))

  /** Only the groups that actually have duplicates. */
  def duplicateGroups(documents: DataFrame): DataFrame =
    groups(documents).filter(col("n_copies") > 1)
      .orderBy(col("canonical_id"))

  /** Corpus-level dedup summary (always one row): total docs, distinct
    * texts, and docs that are non-canonical copies.
    */
  def summary(documents: DataFrame, textCol: String = "text"): DataFrame =
    documents.agg(
      count(lit(1)).as("n_docs"),
      countDistinct(md5(col(textCol))).as("n_distinct"),
      (count(lit(1)) - countDistinct(md5(col(textCol)))).as("n_dup_copies"))

  /** The deduplicated corpus: keep exactly the canonical (min-id) row per
    * distinct text. Implemented as a self-semi-join on (hash, id) against
    * the canonical set — no row explosion, hash join on uniform keys.
    */
  def deduplicate(documents: DataFrame, textCol: String = "text",
                  idCol: String = "doc_id"): DataFrame = {
    val canon = groups(documents, textCol, idCol)
      .select(col("canonical_id").as(idCol))
    documents.join(canon, Seq(idCol), "left_semi")
  }
}
