package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic PLANTED fixtures for the scale-gate queries (q140–q146).
  *
  * The seven quadratic-oracle queries (q22/q65/q68/q76/q116/q133/q136)
  * cannot be independently verified at sf1: their only oracle is the
  * brute-force all-pairs scan the operator exists to replace (measured:
  * the 5000-doc restriction alone exceeds 10 minutes in DuckDB). The
  * planted-subset gates close that hole (r7 verdict task 4): each gate
  * unions a SMALL deterministic planted corpus into the real one at query
  * time (the q23/q71 injection precedent), runs the REAL operator over the
  * combined corpus at whatever scale the gate runs, and restricts the
  * OUTPUT to planted ids — where the expected rows are CLOSED-FORM
  * arithmetic, not a quadratic scan, so the oracle is exact and affordable
  * at every scale.
  *
  * Why the restriction is sound:
  *   - planted vocabulary (`pg<g>x<j>` / `pm<g>x<m>` tokens) is disjoint
  *     from the organic corpus and across groups, so TRUE similarity
  *     between a planted doc and anything outside its own group is 0 —
  *     planted components can never merge with organic ones through a
  *     correct engine (candidate verification is exact Jaccard);
  *   - pair LISTINGS restricted to "both ids planted" are exact for ANY
  *     subset (a pair with one end outside is excluded on both sides);
  *   - planted ids start at [[base]], far above every organic key at any
  *     tested scale, so `id1 >= base` selects exactly planted-planted
  *     pairs (listings order id1 < id2).
  *
  * What the combined-corpus run proves at sf1 that sf0.01 cannot: the
  * banding/blocking/verify joins execute against the full 50k-doc corpus
  * (bucket populations, skew handling, candidate-cap behavior, join
  * shapes) and must still recover every planted pair exactly.
  *
  * The construction (reproduced literally in the q140–q146 oracle SQL —
  * change BOTH or neither):
  *   - 40 near-dup groups g (sizes 2 + g%3): member 0 = the group's
  *     30-token base vocabulary; member m >= 1 appends ONE member-specific
  *     token. Word-3-gram Jaccard: 28/29 vs member 0, 28/30 between
  *     non-base members; word-5-gram: 26/27 and 26/28 — high enough that
  *     banded-LSH recall is certain, above both the 0.3 (q22) and 4/5
  *     (q133) thresholds.
  *   - 8 exact-dup pairs e in 40..47: two identical 12-token docs.
  *   - 10 singletons s in 48..57 with 10+(s-48) tokens: pair with nothing;
  *     they gate the singleton paths (histogram bucket 1, chain keep-all).
  *   - 20 customer groups p (sizes 3 for even p, 2 for odd): names
  *     "Planted Entity <tag> A|B|AB" with tag = the 2-digit group id
  *     tripled, so names within a group are pairwise Levenshtein 1 and
  *     names across groups are >= 2 (a single edit cannot change a
  *     tripled 2-digit tag into another).
  */
object Planted {

  /** Above every organic key at every tested scale (doc_id < 5e4,
    * c_custkey < 1.5e5 at sf1; two orders of magnitude of headroom).
    */
  val base = 900000000L

  val nearGroups = 40
  def groupSize(g: Int): Int = 2 + g % 3
  val exactPairs = 8
  val singletons = 10

  private def baseTokens(g: Int, n: Int): Seq[String] =
    (0 until n).map(j => s"pg${g}x$j")

  /** (doc_id, text, lang, source, n_chars) rows, schema-aligned with the
    * TESTDATA documents table; lang/source = "planted" so chain gates can
    * slice the planted stats with one filter.
    */
  def docRows: Seq[(Long, String, String, String, Long)] = {
    val near = for {
      g <- 0 until nearGroups
      m <- 0 until groupSize(g)
    } yield {
      val toks = baseTokens(g, 30) ++ (if (m == 0) Nil else Seq(s"pm${g}x$m"))
      val text = toks.mkString(" ")
      (base + g * 10L + m, text, "planted", "planted", text.length.toLong)
    }
    val exact = for {
      e <- nearGroups until (nearGroups + exactPairs)
      m <- 0 until 2
    } yield {
      val text = baseTokens(e, 12).mkString(" ")
      (base + e * 10L + m, text, "planted", "planted", text.length.toLong)
    }
    val single = (0 until singletons).map { j =>
      val e = nearGroups + exactPairs + j
      val text = baseTokens(e, 10 + j).mkString(" ")
      (base + e * 10L, text, "planted", "planted", text.length.toLong)
    }
    near ++ exact ++ single
  }

  def docCount: Long = docRows.size.toLong

  def docs(s: SparkSession): DataFrame = {
    import s.implicits._
    docRows.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  /** Planted LONG-CHAIN components for the star-rewrite gate (q147):
    * pure edge arithmetic (no documents — a 0.3-jaccard text chain would
    * sit below the minhash banding S-curve), ids in their own range above
    * [[base]]. Each chain c is a path of `chainLengths(c)` vertices, so
    * its component canonical is the chain head — closed form — while its
    * DIAMETER is the whole length: min-label propagation needs ~length
    * rounds, star rewriting ~log(length), which is exactly what the gate
    * exercises at full corpus scale.
    */
  val chainBase = 910000000L
  val chainLengths: Seq[Int] = Seq(40, 50, 60)

  def chainEdgeRows: Seq[(Long, Long)] = for {
    (len, c) <- chainLengths.zipWithIndex
    m <- 0 until (len - 1)
  } yield (chainBase + c * 1000L + m, chainBase + c * 1000L + m + 1)

  def chainEdges(s: SparkSession): DataFrame = {
    import s.implicits._
    chainEdgeRows.toDF("id1", "id2")
  }

  val custGroups = 20
  def custSize(p: Int): Int = if (p % 2 == 0) 3 else 2
  def custName(p: Int, m: Int): String = {
    val tag = f"$p%02d" * 3
    val suffix = m match { case 0 => "A"; case 1 => "B"; case _ => "AB" }
    s"Planted Entity $tag $suffix"
  }

  /** (c_custkey, c_name) rows for the edit-distance gate. */
  def customerRows: Seq[(Long, String)] = for {
    p <- 0 until custGroups
    m <- 0 until custSize(p)
  } yield (base + p * 10L + m, custName(p, m))

  def customers(s: SparkSession): DataFrame = {
    import s.implicits._
    customerRows.toDF("c_custkey", "c_name")
  }

  /** Planted REPETITION docs for the Gopher-battery gate (q185): the
    * organic corpus trips the top-n rules but contains no duplicated
    * 5..10-grams at the sf0.01 gate scale, so the dup-n half of
    * [[graft.operators.GopherRepetition]] would gate vacuously (0 == 0).
    * One doc per n = its n-token block repeated twice plus n unique
    * filler tokens — the repeat covers exactly the first 2n token
    * positions for rule n (and trips the smaller top-m rules on the way,
    * all exactly recomputed by the oracle), the filler dilutes below 100%
    * — plus one all-unique control doc that must score 0 on every dup
    * rule. Vocabulary (`gp/gq/gc` prefixes) is corpus- and
    * Planted-docRows-disjoint. Reproduced literally in the q185 oracle
    * SQL — change BOTH or neither.
    */
  val gopherBase = 920000000L

  def gopherDocRows: Seq[(Long, String, String, String, Long)] = {
    val ruleDocs = (5 to 10).map { n =>
      val block = (0 until n).map(j => s"gp${n}x$j")
      val filler = (0 until n).map(j => s"gq${n}y$j")
      val text = (block ++ block ++ filler).mkString(" ")
      (gopherBase + n.toLong, text, "planted", "planted", text.length.toLong)
    }
    val control = {
      val text = (0 until 30).map(j => s"gc0z$j").mkString(" ")
      (gopherBase + 100L, text, "planted", "planted", text.length.toLong)
    }
    ruleDocs :+ control
  }

  def gopherDocs(s: SparkSession): DataFrame = {
    import s.implicits._
    gopherDocRows.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  /** Planted MULTILINE docs for the Gopher duplicate-line/paragraph
    * rules (q190 — Table A1's other half; the organic corpus is
    * single-line so these rules are only testable here). Ids
    * [[gopherBase]]+200..204, vocabulary `gl<doc>…` disjoint from
    * everything else:
    *
    *   - +200 line-fraction doc: one line repeated 4x among 6 distinct
    *     lines (dup_lines 4/10 = 40% > 30%);
    *   - +201 paragraph doc: 'A \n\n B \n\n A' — paragraphs [A, B, A],
    *     dup_paras 2/3; its lines duplicate too;
    *   - +202 char-fraction doc: one LONG line (20 tokens) twice among
    *     8 distinct short lines — dup_line frac 2/10 = 20% (NOT above
    *     30%) while dup_line_chars is far above 20%: the char rule
    *     fires where the count rule does not;
    *   - +203 multiline paragraphs: 'l1\nl2 \n\n l3 \n\n l1\nl2' —
    *     paragraph identity includes the EMBEDDED newline (paras
    *     [l1\nl2, l3, l1\nl2] duplicated, lines 4/5 duplicated);
    *   - +204 control: 5 distinct lines — every dup numerator 0.
    */
  def gopherMultilineRows: Seq[(Long, String, String, String, Long)] = {
    def doc(off: Long, text: String) =
      (gopherBase + 200L + off, text, "planted", "planted", text.length.toLong)
    val lineDoc = doc(0, ((0 until 6).map(j => s"gl0x$j line $j")
      ++ Seq.fill(4)("gl0dup repeated line")).mkString("\n"))
    val paraDoc = doc(1,
      "gl1a first para\n\ngl1b second para\n\ngl1a first para")
    val longLine = (0 until 20).map(j => s"gl2long$j").mkString(" ")
    val charDoc = doc(2, ((0 until 8).map(j => s"gl2x$j")
      ++ Seq(longLine, longLine)).mkString("\n"))
    val mlParaDoc = doc(3,
      "gl3l1\ngl3l2\n\ngl3only\n\ngl3l1\ngl3l2")
    val control = doc(4, (0 until 5).map(j => s"gl4x$j distinct $j").mkString("\n"))
    Seq(lineDoc, paraDoc, charDoc, mlParaDoc, control)
  }

  def gopherMultilineDocs(s: SparkSession): DataFrame = {
    import s.implicits._
    gopherMultilineRows.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  /** Planted rows for the persisted-dedup-store gates (q186/q187).
    *
    * STORED docs (ids [[dsBase]]+0..9, 12 `ds<i>x<j>` tokens) are distilled
    * into the staged store alongside the organic ingested half. The BATCH
    * side plants one group per verdict the ingest must produce:
    *   - ids +100..104: EXACT copies of stored 0..4 → 'dup_vs_store'
    *     (md5 equality through the loaded hash table);
    *   - ids +200..204: stored 0..4 with ONE doubled inter-token space →
    *     'near_dup_vs_store' BY CONSTRUCTION: md5 differs (byte-level) but
    *     simhash64 tokenizes on whitespace runs, so the signature is
    *     BIT-IDENTICAL (Hamming 0) to the stored doc's;
    *   - ids +300..304: 12 fresh `dn<i>y<j>` tokens → 'new' (disjoint
    *     vocabulary; DedupStoreSpec pins the recomputed Hamming > 3).
    * Vocabulary is disjoint from the corpus and every other planted set.
    */
  val dsBase = 930000000L

  private def dsText(i: Int): String =
    (0 until 12).map(j => s"ds${i}x$j").mkString(" ")

  def dedupStoredRows: Seq[(Long, String, String, String, Long)] =
    (0 until 10).map { i =>
      val t = dsText(i)
      (dsBase + i, t, "planted", "planted", t.length.toLong)
    }

  def dedupBatchRows: Seq[(Long, String, String, String, Long)] = {
    val exact = (0 until 5).map { i =>
      val t = dsText(i)
      (dsBase + 100L + i, t, "planted", "planted", t.length.toLong)
    }
    val spaced = (0 until 5).map { i =>
      val t = dsText(i).replaceFirst(" ", "  ")
      (dsBase + 200L + i, t, "planted", "planted", t.length.toLong)
    }
    val fresh = (0 until 5).map { i =>
      val t = (0 until 12).map(j => s"dn${i}y$j").mkString(" ")
      (dsBase + 300L + i, t, "planted", "planted", t.length.toLong)
    }
    exact ++ spaced ++ fresh
  }

  def dedupStoredDocs(s: SparkSession): DataFrame = {
    import s.implicits._
    dedupStoredRows.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  def dedupBatchDocs(s: SparkSession): DataFrame = {
    import s.implicits._
    dedupBatchRows.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  /** Planted LINEARLY SEPARABLE labeled set whose batch-perceptron
    * training run ([[graft.operators.QualityTrainer]]) is CLOSED-FORM
    * (the q192 closed-form-schedule trick applied to classifier
    * training):
    *
    *  - 20 positive docs (lang `qpos`): 8 exclusive unigrams
    *    `qp{g}x0..7`, the shared token `qsh`, then `qp{g}r` repeated
    *    (1 + g%3) times (count-2/3 features);
    *  - 20 negative docs (lang `qneg`): the mirrored `qn…` construction.
    *
    * Schedule: round 1 (w=0, every margin 0) misclassifies exactly the
    * positives → w1 = positive gram counts; round 2 gives every negative
    * margin = w1[qsh] = 20 > 0 (its exclusive grams have weight 0, its
    * bigrams containing qsh differ from the positives' by their flanking
    * token) → misclassifies exactly the negatives → w2 = posCount −
    * negCount per feature; round 3 finds every doc correct (`qsh` nets
    * 20−20 = 0, each doc's exclusive grams give margin ±Σcnt² ≠ 0) and
    * the loop stops. Final weights per feature hash:
    * `posCount(f) − negCount(f)` — one SQL aggregation. The 754 distinct
    * grams of the construction are verified pairwise collision-free
    * under the rolling-31 mod-1000003 hash (PlantedSpec), which makes
    * the schedule argument exact rather than probabilistic.
    *
    * [[qualityEvalRows]] is the HELD-OUT set: doc e mixes the first
    * a(e) positive-class and b(e) negative-class unigrams of group e
    * ((a,b) alternate pos-heavy/neg-heavy), so trained-weight inference
    * exercises both keep decisions plus absent-feature (cross-class
    * boundary bigram) handling.
    */
  val qtBase = 950000000L

  def qualityTrainRows: Seq[(Long, String, String, String, Long)] = {
    def doc(off: Long, p: String, lang: String, g: Int) = {
      val toks = (0 until 8).map(j => s"$p${g}x$j") ++ Seq("qsh") ++
        Seq.fill(1 + g % 3)(s"$p${g}r")
      val text = toks.mkString(" ")
      (qtBase + off + g, text, lang, "planted", text.length.toLong)
    }
    (0 until 20).map(g => doc(0L, "qp", "qpos", g)) ++
      (0 until 20).map(g => doc(100L, "qn", "qneg", g))
  }

  def qualityEvalRows: Seq[(Long, String, String, String, Long)] =
    (0 until 10).map { e =>
      val a = if (e % 2 == 0) 4 + e % 3 else 1 + e % 3
      val b = if (e % 2 == 0) 1 + e % 3 else 4 + e % 3
      val toks = (0 until a).map(j => s"qp${e}x$j") ++
        (0 until b).map(j => s"qn${e}x$j")
      val text = toks.mkString(" ")
      (qtBase + 200L + e, text, "qeval", "planted", text.length.toLong)
    }

  def qualityTrainDocs(s: SparkSession): DataFrame = {
    import s.implicits._
    qualityTrainRows.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  /** The q194 corpus made minimally NON-separable for the averaged
    * perceptron gate (q201): every feature in qualityTrainRows is
    * doc-exclusive except the shared `qsh` token, so ANY duplicate-free
    * relabeling stays linearly separable — the only way to plant
    * inseparability is a DUPLICATED text with the opposite label. One
    * copy of the g=0 positive doc joins under lang `qflip` (label −1 at
    * the gate): the pair can never both classify correctly, the loop
    * 2-cycles from round 3 (exactly one of the pair misclassified per
    * round, alternating — derivation in QualityTrainer.trainAveraged's
    * scaladoc), and the averaged weights follow closed-form.
    */
  def qualityNoisyTrainRows: Seq[(Long, String, String, String, Long)] = {
    val t0 = qualityTrainRows.head
    qualityTrainRows :+ ((qtBase + 500L, t0._2, "qflip", "planted", t0._5))
  }

  def qualityNoisyTrainDocs(s: SparkSession): DataFrame = {
    import s.implicits._
    qualityNoisyTrainRows.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  /** Planted image-dedup corpus (q206) — gray two-tone PNGs from
    * [[graft.multimodal.Multimodal.PngCodec.encodeSplitGray]], chosen so
    * every aHash relation is BY CONSTRUCTION (each half's cells sit
    * strictly on one side of the mean, so orientation + brightness
    * order fully determine the hash):
    *
    * STORED (idBase+0..2): two vertical dark-left images (one aHash
    * family, different bytes/dims) and one vertical dark-RIGHT.
    * BATCH (idBase+100..104):
    *   +100 exact byte copy of stored +0        -> dup_vs_store
    *   +101/+102 identical horizontal dark-top  -> new / dup_in_batch
    *     (horizontal vs vertical families share no 16-bit chunk — not
    *      even blocking candidates)
    *   +103 vertical dark-left, new values/dims -> near_dup_vs_store
    *     (aHash identical to +0's family, payload new)
    *   +104 horizontal dark-BOTTOM              -> new
    *     (complement of +101's family: Hamming 64; 32 vs verticals)
    */
  val imgBase = 960000000L

  def imageStoreRows: Seq[(Long, Array[Byte])] = {
    import graft.multimodal.Multimodal.PngCodec.encodeSplitGray
    Seq(
      (imgBase + 0L, encodeSplitGray(32, 24, 10, 200, vertical = true)),
      (imgBase + 1L, encodeSplitGray(48, 16, 30, 220, vertical = true)),
      (imgBase + 2L, encodeSplitGray(32, 24, 200, 10, vertical = true)))
  }

  def imageBatchRows: Seq[(Long, Array[Byte])] = {
    import graft.multimodal.Multimodal.PngCodec.encodeSplitGray
    val horiz = encodeSplitGray(40, 32, 20, 210, vertical = false)
    Seq(
      (imgBase + 100L, encodeSplitGray(32, 24, 10, 200, vertical = true)),
      (imgBase + 101L, horiz),
      (imgBase + 102L, horiz),
      (imgBase + 103L, encodeSplitGray(36, 40, 12, 198, vertical = true)),
      (imgBase + 104L, encodeSplitGray(40, 32, 210, 20, vertical = false)))
  }

  def imageStoreMedia(s: SparkSession): DataFrame = {
    import s.implicits._
    imageStoreRows.toDF("media_id", "payload")
  }

  def imageBatchMedia(s: SparkSession): DataFrame = {
    import s.implicits._
    imageBatchRows.toDF("media_id", "payload")
  }

  /** Planted structure for the STREAMING store-ingest gate (q209): rows
    * tagged with the micro-batch (chunk) they arrive in, constructed so
    * every verdict is pinned across batch boundaries:
    *
    *   chunk 0: +0 the seed doc                       -> new
    *   chunk 1: +1 exact copy of the seed             -> dup_vs_store
    *            +2 doubled-space variant of the seed  -> near_dup_vs_store
    *               (same token stream => identical simhash, different md5
    *                — the q187 construction)
    *            +3/+4 an identical fresh pair         -> new / dup_in_batch
    *   chunk 2: +5 another copy of the seed           -> dup_vs_store
    *            +6 copy of chunk 1's accepted +3      -> dup_vs_store
    *               (proves batch-1 appends reached the store)
    *            +7 fresh                              -> new
    */
  val siBase = 970000000L

  def streamIngestRows: Seq[(Long, String, String, Int)] = {
    val seed = "sic seed alpha bravo charlie delta echo foxtrot"
    val fresh1 = "sic fresh golf hotel india juliett kilo lima"
    Seq(
      (siBase + 0L, seed, "en", 0),
      (siBase + 1L, seed, "en", 1),
      (siBase + 2L, seed.replace(" ", "  "), "en", 1),
      (siBase + 3L, fresh1, "en", 1),
      (siBase + 4L, fresh1, "en", 1),
      (siBase + 5L, seed, "en", 2),
      (siBase + 6L, fresh1, "en", 2),
      (siBase + 7L, "sic final mike november oscar papa quebec romeo", "en", 2))
  }

  def streamIngestDocs(s: SparkSession): DataFrame = {
    import s.implicits._
    streamIngestRows.toDF("doc_id", "text", "lang", "chunk")
  }

  def qualityEvalDocs(s: SparkSession): DataFrame = {
    import s.implicits._
    qualityEvalRows.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  /** Planted corpus whose FULL 1023-merge BPE sequence is closed-form
    * (q192 — the >= 1k-merge tokenizer-training gate; a 1k-round SQL
    * unroll is infeasible, so the expected merge table must be
    * GENERATABLE, not replayed).
    *
    * Construction: a round-robin 1-factorization of the 62-symbol
    * alphanumeric alphabet (circle method — the standard all-play-all
    * tournament schedule). Wave w (w = 0..32) holds 31 two-char tokens,
    * one per matching pair: {61, w} and {(w+i) mod 61, (w-i) mod 61}
    * for i = 1..30, each char pair ordered low-index-first and each
    * token repeated freq_w = 100 - 2w times. Why the merge sequence is
    * forced:
    *
    *   - every unordered char pair occurs in at most one wave (the
    *     1-factorization property), so each pair's count is exactly its
    *     wave's freq and merging never alters another pair's count;
    *   - a merged 2-char token is a single symbol — NO new pairs ever
    *     arise;
    *   - within a wave all 31 pairs are symbol-disjoint (a perfect
    *     matching) and share one count, so the batched selector accepts
    *     the whole wave in ranked (lft, rgt) order in ONE driver trip,
    *     stopping at the first next-wave pair (waves reuse the same 62
    *     chars, so it always interacts) whose strictly smaller count
    *     bounds the truncation;
    *   - hence the merge table is: waves in descending freq, each wave
    *     lexicographic by (lft, rgt) — 33 driver trips, 1023 merges,
    *     every row generatable by the same modular arithmetic in SQL.
    *
    * This exercises the complete-fetch, disjoint-acceptance, tie-held
    * truncation and wave-boundary paths of [[graft.operators.BpeTrainer
    * .learnMerges]]; the ORGANIC-interaction equivalence (new-pair
    * inheritance, prefix shrink near ties) is gated by BpeTrainerSpec's
    * batched-vs-sequential bit-equality run. q192 trains on this table
    * alone — a corpus union would entangle the organic pair counts with
    * the schedule and the sequence would no longer be closed-form.
    */
  val bpe1kBase = 940000000L

  private val bpeAlphabet =
    "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"

  def bpe1kRows: Seq[(Long, String, String, String, Long)] =
    for {
      w <- 0 until 33
      i <- 0 until 31
    } yield {
      val (a, b) =
        if (i == 0) (61, w) else ((w + i) % 61, (w - i + 61) % 61)
      val tok = s"${bpeAlphabet(math.min(a, b))}${bpeAlphabet(math.max(a, b))}"
      val text = Seq.fill(100 - 2 * w)(tok).mkString(" ")
      (bpe1kBase + w * 31 + i, text, "planted", "planted", text.length.toLong)
    }

  def bpe1kDocs(s: SparkSession): DataFrame = {
    import s.implicits._
    bpe1kRows.toDF("doc_id", "text", "lang", "source", "n_chars")
  }
}
