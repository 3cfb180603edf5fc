package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Long-span substring deduplication — the Lee et al. "Deduplicating
  * Training Data Makes Language Models Better" (arXiv 2107.06499) repeated-
  * substring pass, re-expressed as gram-keyed joins instead of the paper's
  * single-machine suffix array: a span of >= `n` tokens that occurs at
  * least twice anywhere in the corpus (across documents OR twice inside
  * one document) is exactly a maximal run of token positions whose
  * length-`n` windows are each corpus-repeated, so
  *
  *   1. stream every document's position-ordered window hashes
  *      (one codegen'd kernel call per doc, xxhash64 of the " "-joined
  *      window — the [[MinHashKernels]] shingle hash WITHOUT the dedup,
  *      because positions are the whole point here);
  *   2. count occurrences per window hash (map-side partial agg; a window
  *      is "repeated" iff its corpus count >= 2 — the within-document
  *      second occurrence counts, per the paper);
  *   3. semi-join the stream against the repeated hashes — AQE picks the
  *      physical form: a BROADCAST semi-join while the repeated-gram set
  *      is small (the gate-scale plan: the probe stream never shuffles),
  *      falling back to the gram-keyed shuffled semi-join that shares the
  *      count's exchange (q22/q99's ReusedExchange pattern) when a 100 TB
  *      corpus's duplicated-gram set outgrows the broadcast threshold;
  *   4. merge each document's surviving positions into maximal
  *      interval-unions (gaps-and-islands over a PER-DOCUMENT window, so
  *      the sort is bounded by document length, never by corpus size).
  *
  * No suffix array, no driver-side state, no all-pairs join: the one
  * data-sized shuffle is the window-hash aggregate, and AQE's skew-join
  * handling covers the pathological boilerplate gram that repeats across
  * millions of documents. Windows travel as 8-byte xxhash64 values, never
  * as n-token strings — at 50 tokens a string key would multiply the
  * exchange by ~30x; the DuckDB oracle carries full gram STRINGS and so
  * doubles as the collision audit (the same hash-vs-string equivalence
  * [[NgramJaccard]] relies on, oracle-verified at every gate scale).
  *
  * Documents shorter than `n` tokens contribute no windows and can never
  * flag. The synthetic corpus makes the gate non-vacuous without planting:
  * its template near-duplicates share >= 50-token prefixes at every scale
  * (28 flagged docs at sf0.001, 2590 at sf1).
  */
object SpanDedup {

  /** Position-ordered window hashes as a Column: `span_gram_hashes(toks, n)
    * → array<bigint>` where element i (0-based) is xxhash64(seed 42) of
    * tokens [i, i+n) joined by " " — empty array when the doc is shorter
    * than one window.
    */
  def gramHashSeq(toks: Column, n: Int): Column = {
    import org.apache.spark.sql.graft.bridge.{column, expression}
    column(GramHashSeqExpr(expression(toks), n))
  }

  /** `(idCol, pos)` for every 1-based token position whose `n`-token
    * window occurs at least twice in the corpus.
    */
  def repeatedWindows(docs: DataFrame, idCol: String, textCol: String,
                      n: Int): DataFrame = {
    require(n >= 2, s"window length $n must be >= 2")
    val stream = docs
      .select(col(idCol),
        gramHashSeq(split(trim(col(textCol)), " +"), n).as("ghs"))
      .select(col(idCol), posexplode(col("ghs")).as(Seq("pos0", "gh")))
      .select(col(idCol), (col("pos0") + 1).as("pos"), col("gh"))
    val dup = stream.groupBy(col("gh")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2).select(col("gh"))
    stream.join(dup, Seq("gh"), "left_semi").select(col(idCol), col("pos"))
  }

  /** Gaps-and-islands interval union over a `(idCol, pos)` window-position
    * stream: maximal `(idCol, span_start, span_end, span_len)` spans,
    * merging windows whose starts are within `n` of each other. The only
    * sort is the PER-DOCUMENT window — bounded by doc length.
    */
  private def islandSpans(hits: DataFrame, idCol: String, n: Int): DataFrame = {
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    hits
      // first row's lag is NULL -> comparison NULL -> otherwise(0): the
      // first window of a doc never "breaks", it opens island 0
      .withColumn("brk",
        when(col("pos") - lag(col("pos"), 1).over(w) > n, lit(1))
          .otherwise(lit(0)))
      .withColumn("island", sum(col("brk")).over(w))
      .groupBy(col(idCol), col("island"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + n - 1).as("span_end"))
      .select(col(idCol), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("span_len"))
  }

  /** Maximal duplicated spans per document:
    * `(idCol, span_start, span_end, span_len)` — each span the union of
    * overlapping-or-adjacent repeated windows (next window start within
    * `n` positions of the previous), 1-based inclusive token bounds.
    */
  def spans(docs: DataFrame, idCol: String, textCol: String,
            n: Int): DataFrame =
    islandSpans(repeatedWindows(docs, idCol, textCol, n), idCol, n)

  // ---- removal: the dedup itself, not just the audit -------------------

  /** Window stream + the canonical-occurrence stats join: `(idCol, pos)`
    * of every NON-canonical repeated window — the positions the removal
    * cuts. The canonical occurrence of a repeated window is its minimal
    * `(doc, pos)`, compared as the single integer `id * 2^20 + pos` so
    * both engines take a plain BIGINT min (ids must stay below 2^43 and
    * docs below 2^20 tokens — the RollingWindow-style documented bound,
    * enforced by `assert_true` in the encode so a violating corpus fails
    * loudly instead of mis-keying).
    */
  private def removedWindows(docs: DataFrame, idCol: String, textCol: String,
                             n: Int): DataFrame = {
    val stream = docs
      .select(col(idCol),
        gramHashSeq(split(trim(col(textCol)), " +"), n).as("ghs"))
      .select(col(idCol), posexplode(col("ghs")).as(Seq("pos0", "gh")))
      // the assert_true rides the key expression (never pruned): NULL on
      // success, throws on a doc at/over 2^20 tokens OR an id at/over 2^43
      // — either would overflow okey silently (ANSI off) and mis-pick
      // canonical occurrences
      .select(col(idCol), (col("pos0") + 1).as("pos"), col("gh"))
      .withColumn("okey",
        col(idCol) * lit(1048576L) + col("pos") +
          coalesce(assert_true(col(idCol) < lit(8796093022208L) &&
            col("pos") < lit(1048576L)).cast("long"), lit(0L)))
    val stats = stream.groupBy(col("gh"))
      .agg(count(lit(1)).as("c"), min(col("okey")).as("firstkey"))
      .filter(col("c") >= 2)
      .select(col("gh"), col("firstkey"))
    stream.join(stats, Seq("gh"))
      .filter(col("okey") =!= col("firstkey"))
      .select(col(idCol), col("pos"))
  }

  /** Adds a `cuts` column — the doc's removal spans as an array of
    * `(s, e)` structs, NULL for untouched docs.
    */
  private def withCuts(docs: DataFrame, idCol: String, textCol: String,
                       n: Int): DataFrame = {
    val cuts = islandSpans(removedWindows(docs, idCol, textCol, n), idCol, n)
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("span_start").as("s"),
        col("span_end").as("e"))).as("cuts"))
    docs.join(cuts, Seq(idCol), "left")
  }

  /** Final text after cutting: tokens outside every cut interval rejoined
    * with single spaces (whitespace-normalized by construction — a doc
    * cut down to nothing becomes the empty string); untouched docs keep
    * their original text byte-for-byte.
    */
  private def cutText(textCol: String): Column = {
    val toks = split(trim(col(textCol)), " +")
    val indexed = transform(toks, (t, i) => struct((i + 1).as("p"), t.as("t")))
    val kept = filter(indexed, x => !exists(col("cuts"),
      c => x.getField("p") >= c.getField("s") &&
        x.getField("p") <= c.getField("e")))
    when(col("cuts").isNull, col(textCol))
      .otherwise(concat_ws(" ", transform(kept, _.getField("t"))))
  }

  /** The deduplicated corpus — Lee et al.'s actual dedup, not just the
    * audit: every repeated `n`-token window keeps exactly its canonical
    * (lowest `(doc, pos)`) occurrence, and tokens covered only by
    * non-canonical repeated windows are cut. Same schema as `docs`,
    * `textCol` rewritten; all other columns ride through.
    */
  def removeSpans(docs: DataFrame, idCol: String, textCol: String,
                  n: Int): DataFrame =
    withCuts(docs, idCol, textCol, n)
      .withColumn(textCol, cutText(textCol))
      .drop("cuts")

  /** Per-language removal audit: `(lang, n_docs, docs_modified,
    * tokens_before, tokens_removed, text_checksum)` ordered by lang —
    * the checksum is the per-doc kmv_key of the FINAL text summed per
    * language, so the oracle pins the reconstructed bytes of every
    * document, not just the counts.
    */
  def removalAudit(docs: DataFrame, idCol: String, textCol: String,
                   langCol: String, n: Int): DataFrame = {
    val toks = split(trim(col(textCol)), " +")
    withCuts(docs, idCol, textCol, n)
      .withColumn("nb", size(toks))
      .withColumn("ftext", cutText(textCol))
      .withColumn("removed",
        when(col("cuts").isNull, lit(0))
          .otherwise(col("nb") - size(split(col("ftext"), " ")) +
            when(length(col("ftext")) === 0, lit(1)).otherwise(lit(0))))
      .groupBy(col(langCol).as("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("cuts").isNull, lit(0)).otherwise(lit(1)))
          .as("docs_modified"),
        sum(col("nb")).as("tokens_before"),
        sum(col("removed")).as("tokens_removed"),
        sum(graft.functions.KmvSketch.kmvKey(col("ftext")))
          .as("text_checksum"))
      .orderBy(col("lang"))
  }

  /** Per-document duplication profile over the maximal spans:
    * `(idCol, n_spans, dup_tokens, max_span)` ordered by id — only
    * documents with at least one duplicated span appear.
    */
  def profile(docs: DataFrame, idCol: String, textCol: String,
              n: Int): DataFrame =
    spans(docs, idCol, textCol, n)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("span_len")).as("dup_tokens"),
        max(col("span_len")).as("max_span"))
      .orderBy(col(idCol))
}

/** `span_gram_hashes(tokens, n) → array<bigint>`, position-ordered,
  * non-distinct — [[MinHashKernels.shingleHashes]]'s window walk minus the
  * dedup and the sub-`n` whole-doc fallback (a doc shorter than one window
  * has no window, rather than an artificial one).
  */
case class GramHashSeqExpr(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "span_gram_hashes"
  override protected def nullSafeEval(input: Any): Any =
    SpanKernels.gramHashSeq(input.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.dedup.SpanKernels.gramHashSeq($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): GramHashSeqExpr =
    copy(child = newChild)
}

/** Static kernel for [[GramHashSeqExpr]] (codegen calls it directly).
  *
  * Karp-Rabin rolling polynomial over per-token xxhash64 values (round-12;
  * the round-11 form re-joined the window's tokens per position, touching
  * every token ~n times — O(n·len) hashing per doc, the dominant map-stage
  * constant in q175/q178 at n=50). Now each token is xxhash64'd ONCE and
  * window i's key is Σ h(tok_{i+j})·B^(n-1-j) mod 2^64, rolled in O(1) per
  * step: equal token windows give equal keys by construction, and distinct
  * windows collide with ~2^-64 probability over xxhash64'd terms — and the
  * DuckDB oracle carries full gram STRINGS at every gate scale, so any
  * collision that ever mattered would fail the q175/q178/q99 hash gates
  * (the same audit that licensed hashing in the first place). NULL tokens
  * hash as 0 at their position instead of being skipped concat_ws-style —
  * unreachable from the library's `split`-produced arrays, which never
  * contain NULLs.
  */
object SpanKernels {
  /** Odd 64-bit base (golden-ratio constant): multiplication by an odd
    * number is a bijection mod 2^64, so the leading term never degenerates.
    */
  private val B = 0x9E3779B97F4A7C15L

  def gramHashSeq(toks: ArrayData, n: Int): ArrayData = {
    val cnt = toks.numElements()
    if (cnt < n) return new GenericArrayData(Array.emptyLongArray)
    val th = new Array[Long](cnt) // per-token hash, computed once per token
    var i = 0
    while (i < cnt) {
      th(i) =
        if (toks.isNullAt(i)) 0L
        else XxHash64Function.hash(toks.getUTF8String(i), StringType, 42L)
      i += 1
    }
    var bn = 1L // B^(n-1), the weight the outgoing token leaves with
    i = 1
    while (i < n) { bn *= B; i += 1 }
    val out = new Array[Long](cnt - n + 1)
    var h = 0L
    i = 0
    while (i < n) { h = h * B + th(i); i += 1 }
    out(0) = h
    i = 1
    while (i + n <= cnt) {
      h = (h - th(i - 1) * bn) * B + th(i + n - 1)
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }
}
