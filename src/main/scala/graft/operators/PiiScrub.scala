package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII scrubbing audit — the redaction pass a text corpus takes before
  * training: find email addresses and IPv4 literals, replace them with a
  * fixed `[PII]` token, and report per-language counts plus the exact
  * number of characters removed.
  *
  * The patterns are deliberately restricted to the regex subset whose
  * semantics are IDENTICAL under Java regex (Spark) and RE2 (DuckDB /
  * most native engines): character classes, bounded/unbounded repetition
  * and `\b` word boundaries — no lookaround, no backreferences, no
  * possessive quantifiers. That is what makes the audit oracle-checkable
  * to the integer: both engines find the same matches, remove the same
  * characters.
  *
  * Scale shape: map-only — two codegen'd regexp passes per row — plus one
  * language-keyed aggregate. At 100 TB the regexp cost IS the operator;
  * there is no shuffle before the per-language report.
  */
object PiiScrub {

  /** Email: local part @ dotted domain with a 2+ letter TLD. */
  val EmailPattern = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"

  /** IPv4 literal: four 1-3 digit octets, word-bounded. */
  val Ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** The scrubbed text: both pattern families replaced by `[PII]`. */
  def scrub(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailPattern, "[PII]"),
      Ipv4Pattern, "[PII]")

  /** Per-language audit:
    * `(lang, n_docs, n_email_docs, n_emails, n_ip_docs, n_ips,
    *   chars_removed)` ordered by lang. `chars_removed` is
    * len(text) − len(scrubbed) summed — negative only if the corpus's PII
    * spans were shorter than the `[PII]` token, which is itself a signal.
    */
  def audit(docs: DataFrame, textCol: String, langCol: String): DataFrame = {
    val t = col(textCol)
    val emails = regexp_count(t, lit(EmailPattern))
    val ips = regexp_count(t, lit(Ipv4Pattern))
    docs.select(col(langCol).as("lang"),
        emails.as("ne"), ips.as("ni"),
        (length(t) - length(scrub(t))).cast("bigint").as("delta"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum((col("ne") > 0).cast("bigint")).as("n_email_docs"),
        sum(col("ne")).cast("bigint").as("n_emails"),
        sum((col("ni") > 0).cast("bigint")).as("n_ip_docs"),
        sum(col("ni")).cast("bigint").as("n_ips"),
        sum(col("delta")).as("chars_removed"))
      .orderBy(col("lang"))
  }
}
