package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed BPE merge-rule training (Sennrich, Haddow, Birch: "Neural
  * Machine Translation of Rare Words with Subword Units", ACL 2016) —
  * the tokenizer-training half of an LLM data pipeline. Each round
  * counts adjacent symbol pairs over the corpus (frequency-weighted),
  * picks the most frequent pair (ties broken lexicographically), and
  * merges it greedily left-to-right in every word; the output is the
  * ordered merge table a tokenizer ships.
  *
  * Scale shape — the standard trick that makes BPE training distributable:
  * all rounds operate on the (distinct word, corpus frequency) table, not
  * the corpus. ONE corpus pass builds it; afterwards every cluster round
  * is a vocab-sized explode + partial-aggregated pair count, a BOUNDED
  * top-`batchLimit` collect from which the driver accepts a provably
  * sequential-identical prefix of disjoint merges (see [[learnMerges]] —
  * many merges per round-trip instead of one), and one narrow chained
  * per-word replace — lineage truncated and released per round
  * ([[graft.IterState]] discipline, no persisted state after return).
  *
  * Cross-engine exactness: words are encoded as delimiter-wrapped symbol
  * strings (`cat` → `<c><a><t>`) so a merge is a LITERAL string
  * replacement `"<a><b>" -> "<ab>"`. Because the delimiters are part of
  * the symbols (not separators between them), adjacent matches share no
  * characters and left-to-right non-overlapping `replace` — identical
  * semantics in Spark and DuckDB — implements exactly the greedy BPE
  * merge (`aaa` + merge(a,a) → `aa a`, never `a aa`). Pair counting,
  * argmax tie-break (count desc, then binary string order) and the
  * replacement are replayed op-for-op by the SQL oracle; no RNG, no
  * floats anywhere.
  */
object BpeTrainer {

  /** Tokens containing the delimiter characters are dropped (documented
    * contract, mirrored by the oracle) — they would make the wrapped
    * encoding ambiguous.
    */
  private def rawWordTable(documents: DataFrame, textCol: String): DataFrame =
    documents
      .select(explode(split(trim(col(textCol)), " +")).as("token"))
      .filter(length(col("token")) > 0
        && !col("token").contains("<") && !col("token").contains(">"))
      .groupBy(col("token")).agg(count(lit(1)).as("freq"))

  private def wordTable(documents: DataFrame, textCol: String): DataFrame =
    rawWordTable(documents, textCol)
      .select(regexp_replace(col("token"), "(.)", "<$1>").as("enc"), col("freq"))

  /** UTF-8 binary order — Spark's string ordering and DuckDB's binary
    * collation; differs from String.compareTo in the surrogate range.
    */
  val utf8BinaryOrdering: Ordering[String] = new Ordering[String] {
    def compare(a: String, b: String): Int = {
      val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var i = 0
      while (i < x.length && i < y.length) {
        val c = (x(i) & 0xff) - (y(i) & 0xff)
        if (c != 0) return c
        i += 1
      }
      x.length - y.length
    }
  }

  /** The training corpus's BASE alphabet: distinct single code points of
    * the word table's tokens, UTF-8-binary sorted — the id-0 block of
    * [[BpeStore]]'s vocab. One map-side-combined distinct over symbol
    * explode; the collect is alphabet-sized (the sanctioned sketch
    * collect — hundreds to a few thousand rows for natural text).
    */
  def baseSymbols(documents: DataFrame, textCol: String = "text"): Seq[String] =
    wordTable(documents, textCol)
      .select(explode(split(trim(col("enc"), "<>"), "><")).as("sym"))
      .distinct()
      .orderBy(col("sym")) // Spark string order = UTF-8 binary
      .collect().map(_.getString(0)).toSeq

  /** The ordered merge table: (round, left, right, pair_count), one row
    * per learned merge; stops early if no pair remains.
    *
    * BATCHED selection (round 12 — the step from toy to trainable): each
    * cluster round collects the top `batchLimit` ranked pairs (count desc,
    * then lexicographic — the sequential tie-break) and accepts, on the
    * driver, a prefix of them that is PROVABLY what sequential greedy
    * would have picked one at a time, so the result is bit-identical to
    * the one-merge-per-round algorithm (and to the unrolled SQL oracle)
    * while driver round-trips drop from one per merge to one per batch:
    *
    *  - walk the ranked list accepting pairs whose symbols are disjoint
    *    from every previously accepted pair; STOP at the first
    *    interacting pair (count = cBound). Everything ranked above the
    *    stop is accepted, so every non-accepted pair has count <= cBound;
    *  - applying an accepted merge (a,b) cannot change another accepted
    *    pair's count (disjoint symbols neither create nor consume its
    *    adjacencies) and every NEW pair it creates, (x,ab) or (ab,y),
    *    inherits count <= the existing interacting pair (x,a)/(b,y) —
    *    which, sharing a symbol with (a,b), was not accepted, so <=
    *    cBound. Existing non-accepted pairs only ever lose adjacencies;
    *  - therefore accepted pairs whose count is STRICTLY above cBound
    *    dominate every pair sequential could ever see between them:
    *    sequential picks exactly this prefix, in ranked order. The rank-1
    *    pair is sequential's pick by definition and is always kept; later
    *    accepted pairs are truncated at the first count == cBound (a tie
    *    with an unseen/interacting pair could be stolen by binary order).
    *    If the fetch returned fewer than `batchLimit` rows with no
    *    interaction, the pair table is complete and all-disjoint — then
    *    no new pair can arise at all (any adjacency to a merged symbol
    *    would be an existing pair sharing a symbol — a contradiction) and
    *    the whole list is safe.
    */
  /** `onBatch(tripIndex, acceptedCount)` fires once per driver
    * round-trip (after acceptance, before the merge is applied) — the
    * round-13 acceptance-curve instrumentation (FunnelAudit --op=bpe);
    * the default is a no-op and the result is callback-independent.
    */
  def learnMerges(documents: DataFrame, textCol: String = "text",
                  nMerges: Int = 8, batchLimit: Int = 64,
                  onBatch: (Int, Int) => Unit = (_, _) => ()): DataFrame = {
    require(nMerges >= 1, "nMerges must be >= 1")
    require(batchLimit >= 1, "batchLimit must be >= 1")
    val spark = documents.sparkSession
    var (words, release) = graft.IterState.checkpoint(
      wordTable(documents, textCol))
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var done = false
    var r = 1
    var trip = 0
    while (r <= nMerges && !done) {
      trip += 1
      val top = words
        .select(col("freq"),
          expr("split(trim(BOTH '<>' FROM enc), '><')").as("s"))
        .select(col("freq"), explode(expr(
          // sequence(0, -1) DESCENDS in Spark: a single-symbol word must
          // yield an empty pair array, not (s[0], s[-1]) null-pairs
          "IF(size(s) < 2, array(), transform(sequence(0, size(s) - 2), " +
            "i -> named_struct('lft', s[i], 'rgt', s[i + 1])))")).as("p"))
        .groupBy(col("p.lft").as("lft"), col("p.rgt").as("rgt"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("lft"), col("rgt"))
        .limit(batchLimit)
        .collect()
        .map(row => (row.getString(0), row.getString(1), row.getLong(2)))
      if (top.isEmpty) done = true
      else {
        val complete = top.length < batchLimit
        val used = scala.collection.mutable.Set.empty[String]
        val accepted = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
        var cBound = -1L
        var stopped = false
        top.foreach { case p @ (l, rt, c) =>
          if (!stopped) {
            if (used.contains(l) || used.contains(rt)) {
              stopped = true; cBound = c
            } else { accepted += p; used += l; used += rt }
          }
        }
        if (!stopped && !complete) cBound = top.last._3 // unseen pairs <= this
        val safe = (accepted.head +: accepted.tail.takeWhile(_._3 > cBound))
          .take(nMerges - r + 1)
        onBatch(trip, safe.length)
        safe.foreach { case (l, rt, c) => merges += ((r, l, rt, c)); r += 1 }
        val newEnc = safe.foldLeft(col("enc")) { case (e, (l, rt, _)) =>
          replace(e, lit(s"<$l><$rt>"), lit(s"<$l$rt>"))
        }
        val (next, releaseNext) = graft.IterState.checkpoint(
          words.select(newEnc.as("enc"), col("freq")))
        release()
        words = next
        release = releaseNext
      }
    }
    release()
    import spark.implicits._
    merges.result().toDF("round", "left", "right", "pair_count")
      .orderBy(col("round"))
  }

  /** DISTILLED training — the production shape for the 32k-merge regime.
    *
    * [[learnMerges]]' batched selector costs one driver trip per
    * accepted WAVE, and its acceptance is provably maximal for
    * single-list batching (everything ranked below the first
    * interacting pair is bounded by that pair's count, which is exactly
    * what new pairs created by the accepted prefix can reach — no
    * further prefix can be accepted without triple/chain context). The
    * measured organic acceptance is ~3 merges/trip, so a 32k-merge run
    * extrapolates to ~10k cluster jobs — driver-LATENCY-bound, not
    * data-bound. But the loop's input was never the corpus: it is the
    * (distinct word, frequency) table, which for any natural-language
    * corpus is vocabulary-sized (tens of millions of rows at 100 TB —
    * GBs, and MBs under the standard min-frequency floor), i.e. the
    * same sketch-sized state the engine already collects for KMeans
    * centroids and PQ codebooks. So the production split is: ONE
    * distributed corpus pass distills the word table (the only part
    * that scales with data), then the merge loop runs driver-side with
    * the classic incremental algorithm — per-merge work proportional to
    * the words CONTAINING the merged pair, zero cluster trips per
    * merge. This is the architecture shipped tokenizer trainers use
    * (word-count distillation + in-memory merge loop), re-expressed
    * with Spark doing the distillation.
    *
    * Bit-exactness: same greedy left-to-right non-overlapping merge,
    * same (count desc, then UTF-8-binary (left, right)) selection — the
    * affected words are RE-SCANNED per merge (delta = full before/after
    * pair multiset of the word), which sidesteps every chain/run
    * corner case (`abab`, `aaaa`) that analytic count deltas get wrong.
    * BpeTrainerSpec holds bit-equality against [[learnMerges]] to
    * exhaustion; q197 replays the q192 closed-form 1023-merge schedule
    * through this path.
    *
    * `maxDistinctWords` is the fail-fast driver-memory guard (the
    * RollingWindow 2^20 precedent): above it, callers must use
    * [[learnMerges]] or raise the min-frequency floor upstream.
    */
  def learnMergesDistilled(documents: DataFrame, textCol: String = "text",
                           nMerges: Int = 8,
                           maxDistinctWords: Int = 1 << 22): DataFrame = {
    require(nMerges >= 1, "nMerges must be >= 1")
    val spark = documents.sparkSession
    val wt = rawWordTable(documents, textCol)
    // guard BEFORE the collect — a post-collect require would fire only
    // after the driver OOM it exists to prevent (round-14 advice). The
    // limit(n+1).count() probe is executor-side and stops at n+1 rows.
    val probed = wt.limit(maxDistinctWords + 1).count()
    require(probed <= maxDistinctWords,
      s"more than maxDistinctWords=$maxDistinctWords distinct words; " +
        "use learnMerges (batched cluster loop) or apply a frequency floor")
    val rows = wt.collect()
    // words as symbol arrays; initial symbols = single code points (the
    // regexp "(.)" contract of the distributed path)
    val words = rows.map { r =>
      val t = r.getString(0)
      val syms = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < t.length) {
        val cp = t.codePointAt(i)
        syms += new String(Character.toChars(cp))
        i += Character.charCount(cp)
      }
      (syms, r.getLong(1))
    }
    def binLt(a: String, b: String): Boolean = utf8BinaryOrdering.lt(a, b)
    def pairsOf(w: scala.collection.mutable.ArrayBuffer[String]): Seq[(String, String)] =
      (0 until w.length - 1).map(i => (w(i), w(i + 1)))
    val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
    val where = scala.collection.mutable.HashMap
      .empty[(String, String), scala.collection.mutable.Set[Int]]
    words.zipWithIndex.foreach { case ((w, f), id) =>
      pairsOf(w).foreach { p =>
        counts(p) = counts.getOrElse(p, 0L) + f
        where.getOrElseUpdate(p,
          scala.collection.mutable.Set.empty[Int]) += id
      }
    }
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var r = 1
    var done = false
    while (r <= nMerges && !done) {
      // selection: count desc, then (left, right) binary-lexicographic —
      // a linear scan; a heap would amortize better but the scan is
      // vocab-pair-bounded and exact, and selection is not the bottleneck
      var best: (String, String) = null
      var bestC = 0L
      counts.foreach { case (p, c) =>
        if (c > 0 && (best == null || c > bestC ||
            (c == bestC && (binLt(p._1, best._1) ||
              (p._1 == best._1 && binLt(p._2, best._2)))))) {
          best = p; bestC = c
        }
      }
      if (best == null) done = true
      else {
        val (a, b) = best
        merges += ((r, a, b, bestC))
        val ab = a + b
        val affected = where.getOrElse(best, scala.collection.mutable.Set.empty[Int])
        affected.toSeq.foreach { id =>
          val (w, f) = words(id)
          // retract the word's old pair multiset (zero-count entries are
          // left in place — the selector skips c <= 0; removing mid-loop
          // would break the repeated-pair decrement)
          pairsOf(w).foreach { p =>
            counts(p) = counts.getOrElse(p, 0L) - f
          }
          pairsOf(w).distinct.foreach(p => where.get(p).foreach(_ -= id))
          // greedy left-to-right non-overlapping merge
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < w.length) {
            if (i + 1 < w.length && w(i) == a && w(i + 1) == b) {
              out += ab; i += 2
            } else { out += w(i); i += 1 }
          }
          words(id) = (out, f)
          // add the new multiset back
          pairsOf(out).foreach { p =>
            counts(p) = counts.getOrElse(p, 0L) + f
          }
          pairsOf(out).distinct.foreach { p =>
            where.getOrElseUpdate(p,
              scala.collection.mutable.Set.empty[Int]) += id
          }
        }
        r += 1
      }
    }
    import spark.implicits._
    merges.result().toDF("round", "left", "right", "pair_count")
      .orderBy(col("round"))
  }

  /** ENCODING under a LARGE merge table — the serving half of the
    * 32k-merge regime. [[subwordCounts]] folds the merge chain into
    * chained literal `replace` column expressions: exactly right for the
    * 8–64-merge gates, but a 1k–32k-row table would nest thousands of
    * expressions into one projection (codegen blow-up — the plan itself
    * becomes O(table)). This form keeps the SAME vocab-join shape and
    * moves the merge application into one mapPartitions pass over the
    * DISTINCT token table with the table broadcast as a rank map: per
    * token, repeatedly merge the lowest-RANK adjacent pair present
    * (greedy left-to-right within a rank) until none applies.
    *
    * Rank-priority is EQUIVALENT to applying the merges one by one in
    * table order (what [[subwordCounts]] and the trainers do) for any
    * training-produced table: a merge's output symbol can only appear in
    * pairs learned AFTER it, so applying a later merge never creates an
    * occurrence of an earlier one — once a rank is inapplicable it stays
    * inapplicable, and lowest-rank-first is just table order skipping
    * absent ranks. BpeTrainerSpec pins the equivalence bit-for-bit
    * against [[subwordCounts]]; q199 gates it against the generated
    * 1023-merge schedule closed-form.
    *
    * Output contract matches [[subwordCounts]]: (idCol, n_words,
    * n_subwords). Scale shape: ONE token explode folded to per-(doc,
    * token) multiplicities (map-side-combinable) → distinct →
    * mapPartitions over vocab rows with a broadcast table (a 32k-row
    * map, KBs) → join back onto the multiplicity frame → per-doc agg.
    * Corpus tokens are never re-encoded per occurrence, and the corpus
    * is never exploded twice.
    */
  def encodeWithTable(documents: DataFrame, merges: Seq[(String, String)],
                      idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val toks = documents
      .select(col(idCol), explode(split(trim(col(textCol)), " +")).as("token"))
      .filter(length(col("token")) > 0
        && !col("token").contains("<") && !col("token").contains(">"))
    // one corpus explode, not two (the subwordCounts round-17 fold): the
    // distinct-token table and the join-back both read the per-(doc,
    // token) multiplicity frame
    val docTok = toks.groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("c"))
    val rankOf = spark.sparkContext.broadcast(
      merges.zipWithIndex.map { case (p, i) => p -> i }.toMap)
    val sized = docTok.select(col("token")).distinct().as[String]
      .mapPartitions { it =>
        val ranks = rankOf.value
        it.map { t =>
          // initial symbols = single code points (the "(.)" contract)
          val syms = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < t.length) {
            val cp = t.codePointAt(i)
            syms += new String(Character.toChars(cp))
            i += Character.charCount(cp)
          }
          var done = syms.length < 2
          while (!done) {
            var bestRank = Int.MaxValue
            var j = 0
            while (j < syms.length - 1) {
              ranks.get((syms(j), syms(j + 1))).foreach { r =>
                if (r < bestRank) bestRank = r
              }
              j += 1
            }
            if (bestRank == Int.MaxValue) done = true
            else {
              val (a, b) = merges(bestRank)
              val out = scala.collection.mutable.ArrayBuffer.empty[String]
              var k = 0
              while (k < syms.length) {
                if (k + 1 < syms.length && syms(k) == a && syms(k + 1) == b) {
                  out += (a + b); k += 2
                } else { out += syms(k); k += 1 }
              }
              syms.clear(); syms ++= out
              done = syms.length < 2
            }
          }
          (t, syms.length)
        }
      }.toDF("token", "n_sub")
    docTok.join(sized, "token")
      .groupBy(col(idCol))
      .agg(coalesce(sum(col("c")), lit(0L)).as("n_words"),
        sum(col("c") * col("n_sub")).cast("bigint").as("n_subwords"))
  }

  /** ENCODING TO TOKEN IDS — the output a training pipeline actually
    * consumes: per document, the id SEQUENCE of its subword symbols
    * under an ordered merge table and a [[BpeStore]] vocab. Same
    * rank-priority merge loop as [[encodeWithTable]] (equivalence to
    * table-order application argued there), then each final symbol maps
    * through the vocab; a symbol absent from the vocab (a serving-time
    * code point the training corpus never saw) maps to −1 — the pinned
    * UNK convention, so ids are total and the caller filters or remaps.
    *
    * Output: (idCol, ids array<int>, n_words, n_ids) with `ids` the
    * concatenation over the document's kept tokens in text order
    * (delimiter-bearing tokens drop, the [[rawWordTable]] contract).
    * Scale shape: tokens posexplode → DISTINCT-token mapPartitions with
    * the broadcast table (each token encoded once, q134's vocab-join
    * discipline) → join back → per-doc ordered flatten; the per-doc
    * collect_list is bounded by document length, the same bound every
    * per-doc agg in the engine carries.
    */
  def encodeToIds(documents: DataFrame, merges: Seq[(String, String)],
                  vocab: Map[String, Int], idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val toks = documents
      .select(col(idCol),
        posexplode(split(trim(col(textCol)), " +")).as(Seq("__pos", "token")))
      .filter(length(col("token")) > 0
        && !col("token").contains("<") && !col("token").contains(">"))
    val rankOf = spark.sparkContext.broadcast(
      merges.zipWithIndex.map { case (p, i) => p -> i }.toMap)
    val vocabB = spark.sparkContext.broadcast(vocab)
    val encoded = toks.select(col("token")).distinct().as[String]
      .mapPartitions { it =>
        val ranks = rankOf.value
        val ids = vocabB.value
        it.map { t =>
          val syms = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < t.length) {
            val cp = t.codePointAt(i)
            syms += new String(Character.toChars(cp))
            i += Character.charCount(cp)
          }
          var done = syms.length < 2
          while (!done) {
            var bestRank = Int.MaxValue
            var j = 0
            while (j < syms.length - 1) {
              ranks.get((syms(j), syms(j + 1))).foreach { r =>
                if (r < bestRank) bestRank = r
              }
              j += 1
            }
            if (bestRank == Int.MaxValue) done = true
            else {
              val (a, b) = merges(bestRank)
              val out = scala.collection.mutable.ArrayBuffer.empty[String]
              var k = 0
              while (k < syms.length) {
                if (k + 1 < syms.length && syms(k) == a && syms(k + 1) == b) {
                  out += (a + b); k += 2
                } else { out += syms(k); k += 1 }
              }
              syms.clear(); syms ++= out
              done = syms.length < 2
            }
          }
          (t, syms.map(s => ids.getOrElse(s, -1)).toArray)
        }
      }.toDF("token", "__tids")
    toks.join(encoded, "token")
      .groupBy(col(idCol))
      .agg(
        flatten(transform(
          array_sort(collect_list(struct(col("__pos"), col("__tids")))),
          x => x.getField("__tids"))).as("ids"),
        count(lit(1)).as("n_words"))
      .withColumn("n_ids", size(col("ids")).cast("bigint"))
  }

  /** ENCODING side: per-document subword counts under an ordered merge
    * table — (idCol, n_words, n_subwords). The merge chain is applied to
    * the DISTINCT token table only (each token's subword count is a pure
    * function of the token), then joined back onto the token stream —
    * q134's unhinted vocab-join shape: AQE broadcasts while the vocab
    * fits, shuffles at 100 TB; corpus tokens are never re-encoded
    * per-occurrence.
    */
  def subwordCounts(documents: DataFrame, merges: Seq[(String, String)],
                    idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    val toks = documents
      .select(col(idCol), explode(split(trim(col(textCol)), " +")).as("token"))
      .filter(length(col("token")) > 0
        && !col("token").contains("<") && !col("token").contains(">"))
    val mergedEnc = merges.foldLeft(
      regexp_replace(col("token"), "(.)", "<$1>")) {
      case (c, (l, r)) => replace(c, lit(s"<$l><$r>"), lit(s"<$l$r>"))
    }
    // ONE corpus explode (round-17; the round-16 shape exploded twice —
    // once under distinct(), once for the join-back): fold the token
    // stream to per-(doc, token) multiplicities first with a map-side-
    // combinable count, then both the distinct-token table and the
    // join-back read that vocab-per-doc-sized frame. n_words = Σc and
    // n_subwords = Σ c·n_sub reproduce the per-occurrence sums exactly.
    val docTok = toks.groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("c"))
    val sized = docTok.select(col("token")).distinct()
      .select(col("token"),
        size(split(trim(mergedEnc, "<>"), "><")).as("n_sub"))
    docTok.join(sized, "token")
      .groupBy(col(idCol))
      .agg(coalesce(sum(col("c")), lit(0L)).as("n_words"),
        sum(col("c") * col("n_sub")).cast("bigint").as("n_subwords"))
  }
}
