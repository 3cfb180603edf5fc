package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis surface for a training-data pipeline, composed entirely from
  * codegen'd built-ins (no UDFs on the hot path): token counting, lexical
  * quality scoring, stopword-based language scoring. All per-row narrow
  * transformations — zero shuffle, scale linearly with input.
  */
object TextFunctions {

  /** Whitespace token count. Empty/blank text → 0. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, 0)
      .otherwise(size(split(trim(text), " +")))

  /** Distinct whitespace tokens. */
  def uniqueTokenCount(text: Column): Column =
    when(length(trim(text)) === 0, 0)
      .otherwise(size(array_distinct(split(trim(text), " +"))))

  /** Lexical-diversity ratio = unique/total tokens (0 for empty text). */
  def lexicalDiversity(text: Column): Column =
    when(tokenCount(text) === 0, lit(0.0))
      .otherwise(uniqueTokenCount(text).cast("double") / tokenCount(text).cast("double"))

  /** Mean token length = non-space chars / tokens. */
  def meanTokenLength(text: Column): Column =
    when(tokenCount(text) === 0, lit(0.0))
      .otherwise(
        (length(trim(text)) - (tokenCount(text) - 1)).cast("double")
          / tokenCount(text).cast("double"))

  /** BPE-ish pre-tokenizer count: GPT-2-style segmentation (optional leading
    * space + letter run / digit run / punctuation run), simplified to an
    * RE2-compatible form (no lookahead) so the SAME pattern runs in Spark
    * (java.util.regex) and the DuckDB oracle (RE2). Pure whitespace runs are
    * not tokens. A narrow codegen'd per-row expression — zero shuffle.
    */
  val bpeTokenPattern: String = " ?[\\p{L}]+| ?[\\p{N}]+| ?[^\\s\\p{L}\\p{N}]+"

  def bpeTokenCount(text: Column): Column =
    regexp_count(text, lit(bpeTokenPattern))

  /** Occurrences of a literal word at word boundaries. `\b` behaves the same
    * in Java regex (Spark) and RE2 (DuckDB), keeping the oracle comparable.
    */
  def wordOccurrences(text: Column, word: String): Column =
    regexp_count(text, lit(s"\\b$word\\b"))

  /** Stopword hits: total occurrences of the given word list at word
    * boundaries — semantically `regexp_count(text, "\\b(w1|...|wn)\\b")`, but
    * computed by the count-only codegen'd [[TextKernels.stopwordCount]] scan.
    * The regex form plans as `size(regexp_extract_all(...))`, materializing
    * every match as a UTF8String array just to count it (this was ~12% of the
    * whole bench suite); the kernel is one allocation-free pass per row.
    */
  def stopwordHits(text: Column, stopwords: Seq[String]): Column =
    TextExprs.stopwordCount(text, stopwords)

  /** Heuristic language score table: per-language stopword hit counts.
    * Language ID = argmax over languages (ties → first language listed).
    * The lexicons are tiny top-stopword lists — this is the n-gram/stopword
    * heuristic shape, not a trained model.
    */
  val defaultLexicons: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "la", "de", "et", "les"))

  /** Best-scoring language (first wins ties; "und" = undetermined if all 0).
    *
    * NOTE: as a single Column the argmax re-embeds every per-language
    * regexp_count inside each CASE branch (the `best` subtree appears once per
    * language, and conditional branches defeat subexpression elimination), so
    * the codegen'd tree runs O(langs²) regex scans per row. Fine for tests /
    * tiny lexicon counts; for the hot path use [[withLangId]], which stages
    * each score as a materialized projection column first.
    */
  def langId(text: Column, lexicons: Seq[(String, Seq[String])] = defaultLexicons): Column = {
    val lowered = lower(text)
    val scores = lexicons.map { case (lang, words) => (lang, stopwordHits(lowered, words)) }
    argmaxLang(scores)
  }

  /** Column name used for a staged per-language score. */
  def langScoreCol(lang: String): String = s"lang_hits_$lang"

  /** Stage per-language stopword-hit counts as real projection columns — ONE
    * regexp scan per (row, language). Downstream argmax then references plain
    * attribute refs. Catalyst's CollapseProject will NOT inline these back into
    * the consumer (each staged column is non-cheap and referenced several
    * times), so the two-projection shape survives optimization — this is what
    * keeps language-ID linear in the lexicon count at 100 TB.
    */
  def withLangScores(df: DataFrame,
                     textCol: String,
                     lexicons: Seq[(String, Seq[String])] = defaultLexicons): DataFrame = {
    val lowered = lower(col(textCol))
    val scoreCols = lexicons.map { case (lang, words) =>
      stopwordHits(lowered, words).as(langScoreCol(lang))
    }
    df.select(col("*") +: scoreCols: _*)
  }

  /** Argmax over already-staged score columns (see [[withLangScores]]). */
  def langIdFromScores(lexicons: Seq[(String, Seq[String])] = defaultLexicons): Column =
    argmaxLang(lexicons.map { case (lang, _) => (lang, col(langScoreCol(lang))) })

  /** Stage scores, compute the language ID into `out`, drop the helpers. */
  def withLangId(df: DataFrame,
                 textCol: String,
                 out: String,
                 lexicons: Seq[(String, Seq[String])] = defaultLexicons): DataFrame =
    withLangScores(df, textCol, lexicons)
      .withColumn(out, langIdFromScores(lexicons))
      .drop(lexicons.map(l => langScoreCol(l._1)): _*)

  /** First-wins-ties argmax over (language, score) pairs; "und" if all 0. */
  private def argmaxLang(scores: Seq[(String, Column)]): Column = {
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, s), els) =>
      when(s === best && s > 0, lit(lang)).otherwise(els)
    }
  }

  /** Quality score in [0,1]: blend of length saturation, lexical diversity,
    * and mean-token-length sanity (heuristic quality scoring surface).
    */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / 400.0, lit(1.0))
    val divScore = lexicalDiversity(text)
    val mtl = meanTokenLength(text)
    val mtlScore = when(mtl >= 3 && mtl <= 10, 1.0).otherwise(0.5)
    round((lenScore * 0.4 + divScore * 0.4 + mtlScore * 0.2), 6)
  }

  /** Per-document stats frame used by the oracle-checked text queries. */
  def docStats(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      col("n_chars"),
      length(col("text")).as("len_chars"),
      tokenCount(col("text")).as("n_tokens"),
      uniqueTokenCount(col("text")).as("n_unique_tokens"))
      .orderBy(col("doc_id"))
}
