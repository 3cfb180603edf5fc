package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL/domain-level corpus curation — the CCNet/C4-style source controls a
  * pretraining pipeline applies before any content-level filter: drop
  * documents from blocklisted domains, then cap any single domain's share
  * of the corpus so no crawl bucket dominates the mixture.
  *
  * Both decisions are exact-integer and RNG-free so a DuckDB oracle can
  * replay them to the row:
  *
  *  - the blocklist is a BROADCAST anti-join (a real blocklist is
  *    ~100k domains — KBs against a 100 TB fact side; the corpus never
  *    shuffles for it);
  *  - the mass cap thins an over-cap domain by a deterministic hash test
  *    instead of a per-domain rank: keep iff
  *    `spread(doc_id) * n_domain < capN * 2^32` where `spread` is the
  *    Knuth multiplicative spread of the id reduced mod 999999937
  *    (the kmv-family constants, overflow-free for any BIGINT id) and
  *    `capN = total_docs * cap_ppm div 1e6`. Expected survivors per
  *    over-cap domain ≈ capN, selection independent of row order,
  *    partitioning, and ingestion history. The alternative — per-domain
  *    `row_number() <= capN` — would sort the BIGGEST domains (the
  *    precise partitions a skew-prone window cannot handle at 100 TB);
  *    the hash test is a map-side predicate after one domain-count
  *    aggregate joins back, so the giant domain is never sorted at all.
  *
  * Scale shape: one vocab-sized domain-count aggregate (map-side
  * partials), a 1-row total broadcast, a broadcast threshold join, then a
  * codegen'd integer comparison per row. No window, no sort, no
  * data-sized shuffle before the audit aggregates.
  */
object DomainFilter {

  /** Registrable-ish domain from a URL: the lowercased host (scheme and
    * userinfo stripped, port/path/query dropped) minus one leading
    * `www.`. Pattern restricted to the Java-regex/RE2-identical subset
    * (explicit classes, no `\s`/`\w`) per the PiiScrub discipline.
    */
  def domainOf(url: Column): Column =
    regexp_replace(
      regexp_extract(lower(trim(url)),
        "^(?:[a-z][a-z0-9+.-]*:)?//(?:[^/@]*@)?([^/:?#]+)", 1),
      "^www\\.", "")

  /** Documents whose `domainCol` is NOT in `blocklist`'s `domain` column
    * (broadcast anti-join — the corpus side never shuffles).
    */
  def applyBlocklist(docs: DataFrame, domainCol: String,
                     blocklist: DataFrame): DataFrame =
    docs.join(broadcast(blocklist.select(col("domain"))),
      docs(domainCol) === col("domain"), "left_anti")

  /** Per-language blocklist audit:
    * `(lang, n_docs, n_blocked, n_kept, kept_chars)` ordered by lang —
    * one pass over the corpus with the blocked bit computed by a
    * broadcast LEFT join (null ⇒ kept), so audit and filter agree by
    * construction.
    */
  def blocklistAudit(docs: DataFrame, domainCol: String, langCol: String,
                     charsCol: String, blocklist: DataFrame): DataFrame =
    docs
      .join(broadcast(blocklist.select(col("domain"), lit(1).as("blocked"))),
        docs(domainCol) === col("domain"), "left")
      .groupBy(col(langCol).as("lang"))
      .agg(count(lit(1)).as("n_docs"),
        count(col("blocked")).as("n_blocked"),
        sum(when(col("blocked").isNull, lit(1)).otherwise(lit(0))).as("n_kept"),
        sum(when(col("blocked").isNull, col(charsCol)).otherwise(lit(0L)))
          .as("kept_chars"))
      .orderBy(col("lang"))

  /** Knuth spread of an id in [0, 2^32): reduce mod 999999937 first so
    * the multiply never overflows a BIGINT for any non-negative id.
    */
  def idSpread(id: Column): Column =
    pmod(pmod(id, lit(999999937L)) * lit(2654435761L), lit(4294967296L))

  /** Per-domain `(domain, n_domain, capN)` for a corpus-share cap of
    * `capPpm` parts-per-million: `capN = total_docs * capPpm div 1e6` is
    * the maximum documents any one domain may keep.
    */
  def domainCounts(docs: DataFrame, domainCol: String,
                   capPpm: Long): DataFrame = {
    require(capPpm > 0 && capPpm <= 1000000L, s"capPpm $capPpm out of (0, 1e6]")
    val counts = docs.groupBy(col(domainCol).as("domain"))
      .agg(count(lit(1)).as("n_domain"))
    val total = counts.agg(sum(col("n_domain")).as("total")) // 1-row broadcast
    counts.crossJoin(broadcast(total))
      .select(col("domain"), col("n_domain"),
        expr(s"total * $capPpm DIV 1000000").as("capN"))
  }

  /** The keep rule, as exact cross-multiplied integers (DECIMAL(38,0), so
    * neither side can overflow for any corpus size and no division's
    * rounding mode can diverge between engines): a domain at or under the
    * cap keeps everything; an over-cap domain keeps ids with
    * `spread * n_domain < capN * 2^32` — expected survivors ≈ capN.
    */
  private def keepRule(spread: Column, nDomain: Column, capN: Column): Column =
    nDomain <= capN ||
      spread.cast("decimal(38,0)") * nDomain <
        capN.cast("decimal(38,0)") * lit(4294967296L)

  /** The capped corpus: every row of `docs` whose domain is within cap,
    * plus the hash-selected survivors of over-cap domains. Join-side
    * columns are referenced and dropped through the counts frame's own
    * refs — a by-name drop("domain") would also delete a caller's column
    * when `domainCol == "domain"` (or a corpus column named
    * n_domain/capN), silently breaking the same-schema-as-docs contract.
    */
  def capDomainMass(docs: DataFrame, domainCol: String, idCol: String,
                    capPpm: Long): DataFrame = {
    val counts = domainCounts(docs, domainCol, capPpm)
    docs.join(broadcast(counts), docs(domainCol) === counts("domain"))
      .filter(keepRule(idSpread(docs(idCol)), counts("n_domain"), counts("capN")))
      .drop(counts("domain")).drop(counts("n_domain")).drop(counts("capN"))
  }

  /** Per-domain cap audit:
    * `(domain, n_docs, n_kept, before_ppm, after_ppm)` ordered by domain —
    * ppm shares as exact integer DIV against the pre/post totals.
    */
  def capAudit(docs: DataFrame, domainCol: String, idCol: String,
               capPpm: Long): DataFrame = {
    val counts = domainCounts(docs, domainCol, capPpm)
    val flagged = docs.join(broadcast(counts), docs(domainCol) === counts("domain"))
      .withColumn("keep",
        when(keepRule(idSpread(docs(idCol)), counts("n_domain"), counts("capN")),
          lit(1L)).otherwise(lit(0L)))
    val perDomain = flagged.groupBy(counts("domain"))
      .agg(count(lit(1)).as("n_docs"), sum(col("keep")).as("n_kept"))
    val totals = perDomain
      .agg(sum(col("n_docs")).as("t_before"), sum(col("n_kept")).as("t_after"))
    perDomain.crossJoin(broadcast(totals))
      .select(col("domain"), col("n_docs"), col("n_kept"),
        expr("n_docs * 1000000 DIV t_before").as("before_ppm"),
        expr("n_kept * 1000000 DIV t_after").as("after_ppm"))
      .orderBy(col("domain"))
  }
}
