package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

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

  /** Maximal duplicated spans per document:
    * `(idCol, span_start, span_end, span_len)` — each span the union of
    * overlapping-or-adjacent repeated windows (next window start within
    * `n` positions of the previous), 1-based inclusive token bounds.
    */
  def spans(docs: DataFrame, idCol: String, textCol: String,
            n: Int): DataFrame = {
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    repeatedWindows(docs, idCol, textCol, n)
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
  * non-distinct — [[MinHashKernels.shingleHashes]] minus the dedup and the
  * sub-`n` whole-doc fallback (a doc shorter than one window has no
  * window, rather than an artificial one).
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

/** Static kernel for [[GramHashSeqExpr]] (codegen calls it directly). */
object SpanKernels {
  def gramHashSeq(toks: ArrayData, n: Int): ArrayData = {
    val cnt = toks.numElements()
    if (cnt < n) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](cnt - n + 1)
    var i = 0
    while (i + n <= cnt) {
      out(i) = MinHashKernels.hash(MinHashKernels.joined(toks, i, i + n))
      i += 1
    }
    new GenericArrayData(out)
  }
}
