package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.HashExprs

/** Persisted dedup state — the production incremental-ingest shape.
  *
  * q85/q90 prove the incremental JOIN shapes (anti-join on content hash,
  * Bloom pre-filter), but both re-derive the ingested side's state inside
  * the query: real pipelines ingest a new crawl snapshot every few weeks
  * against a corpus whose 100 TB of text they must NOT rescan. This store
  * is the dedup analog of [[graft.similarity.AnnIndex]] (build once as
  * parquet, load and query forever): the corpus is distilled ONCE into
  *
  *   - `hashes`    — (h = md5(text), canonical_id): 48 B/doc, the exact
  *     dedup state; an arriving batch anti-joins it by hash only.
  *   - `simhashes` — (doc_id, sim BIGINT, lang): 8 B of signature per
  *     CANONICAL doc, the near-dup state; an arriving batch joins it
  *     through [[SimHashDedup]]'s 16-bit-chunk blocking (pigeonhole: at
  *     Hamming <= 3, one of the 4 chunks must match exactly) and is
  *     suppressed on bit_count(xor) <= k.
  *
  * Both tables are hash/signature-only — document payloads never enter
  * the store, so a 100 TB corpus persists to ~0.05% of its size and each
  * increment reads state O(corpus rows), not O(corpus bytes). Appending
  * an accepted batch is writing its new (h, canonical_id) and (doc_id,
  * sim) rows as additional parquet files under the same directories —
  * no rewrite, no compaction requirement. Deletion is [[purge]]:
  * an O(ids) tombstone append that [[load]] subtracts at read time
  * (merge-on-read), with [[compact]] as the optional O(store) fold —
  * so a GDPR erasure request neither rescans nor rewrites the corpus
  * state, and a purged doc's content re-ingests as genuinely NEW.
  *
  * Semantics are EXACTLY the in-query operators': the exact stage equals
  * q85's (min-id canonical within the batch, then anti-join the store),
  * the near stage equals [[SimHashDedup.nearDuplicates]] restricted to
  * batch x store pairs. The q186 gate replays the exact stage in SQL;
  * the near stage is gated by q187's planted construction (the q23/q77
  * property-oracle precedent — simhash bit math is engine-internal).
  */
object DedupStore {

  /** File-backed state handles; both are plain parquet scans. */
  final case class Store(hashes: DataFrame, simhashes: DataFrame)

  /** Distill `corpus` into the two state tables under `dir` (overwrite).
    * Simhashes are stored for CANONICAL docs only — duplicates carry the
    * same signature by construction, and the near stage compares against
    * representatives.
    */
  def write(corpus: DataFrame, dir: String, textCol: String = "text",
            idCol: String = "doc_id", langCol: String = "lang"): Unit = {
    val canon = ExactDedup.deduplicate(corpus, textCol, idCol)
    canon.select(md5(col(textCol)).as("h"), col(idCol).as("canonical_id"))
      .write.mode("overwrite").parquet(s"$dir/hashes")
    canon.select(col(idCol).as("doc_id"),
        HashExprs.simhash64(col(textCol)).as("sim"), col(langCol).as("lang"))
      .write.mode("overwrite").parquet(s"$dir/simhashes")
  }

  /** Load the store. If a `tombstones` set exists (see [[purge]]), both
    * state tables are anti-joined against it at read time — the
    * merge-on-read discipline: a purge request never rewrites corpus
    * state, readers subtract the (request-sized, AQE-broadcast)
    * tombstone set, and [[compact]] folds it in when the operator
    * chooses to pay O(store) once.
    */
  def load(spark: SparkSession, dir: String): Store = {
    healSwap(dir, "hashes"); healSwap(dir, "simhashes")
    val hashes = spark.read.parquet(s"$dir/hashes")
    val sims = spark.read.parquet(s"$dir/simhashes")
    val tomb = java.nio.file.Paths.get(dir, "tombstones")
    if (!java.nio.file.Files.exists(tomb.resolve("_SUCCESS")))
      Store(hashes, sims)
    else {
      val t = spark.read.parquet(s"$dir/tombstones")
      Store(
        hashes.join(t, hashes("canonical_id") === t("purged_id"), "left_anti"),
        sims.join(t, sims("doc_id") === t("purged_id"), "left_anti"))
    }
  }

  /** GDPR-delete through the persisted state: tombstone `ids` so their
    * content hashes and signatures stop suppressing future ingests —
    * after a purge, a new document with a purged doc's exact text (or a
    * near-duplicate of it) comes back `verdict = 'new'`. O(ids) — the
    * purge set is appended as new parquet files under `tombstones/`;
    * the corpus-sized hash/signature files are NEVER rewritten (the
    * [[append]] discipline). Idempotent: re-purging an id adds a
    * redundant tombstone row that the read-time anti-join absorbs.
    *
    * CONTRACT: `ids` must be CANONICAL ids — the store keys all state by
    * the canonical representative ([[write]]/[[append]] persist only
    * canonical rows), so purging a non-canonical duplicate's doc_id is a
    * silent no-op (its hash row lives under another canonical_id), and
    * purging a canonical id erases suppression for that CONTENT — which
    * is the point of erasure, but callers mapping a GDPR request must
    * first resolve the requested doc to its canonical id (an O(1) hash
    * lookup against `hashes` given the doc's text).
    */
  def purge(ids: DataFrame, dir: String, idCol: String = "doc_id"): Unit =
    ids.select(col(idCol).cast("long").as("purged_id")).distinct()
      .write.mode("append").parquet(s"$dir/tombstones")

  /** Fold the tombstone set into the base tables — the maintenance op
    * that amortizes many O(k) purges into one O(store) rewrite. Crash
    * safety is ORDER plus a recoverable swap: staging copies of both
    * filtered tables are fully written first, then each live table is
    * renamed aside (`<name>_old`), its staging renamed in, the leftover
    * deleted, and the tombstone set is dropped LAST — at every
    * intermediate crash point a reader sees either the tombstoned rows
    * still present + the tombstone set (anti-join removes them) or
    * already absent + the tombstone set (anti-join is a no-op), and
    * [[load]]/[[compact]] self-heal the one window where a live dir is
    * mid-rename (staging complete, live absent) by finishing the move.
    * Never a state where purged rows are visible without their
    * tombstones, and never a state load() cannot read.
    */
  def compact(spark: SparkSession, dir: String): Unit = {
    val tomb = java.nio.file.Paths.get(dir, "tombstones")
    if (!java.nio.file.Files.exists(tomb.resolve("_SUCCESS"))) return
    val st = load(spark, dir) // already tombstone-filtered (and swap-healed)
    st.hashes.write.mode("overwrite").parquet(s"$dir/hashes_staging")
    st.simhashes.write.mode("overwrite").parquet(s"$dir/simhashes_staging")
    swapIn(dir, "hashes")
    swapIn(dir, "simhashes")
    deleteRecursively(tomb)
  }

  // atomic-swap trio shared with AnnIndex/BpeStore — single-writer
  // contract and reader-race tolerance documented on graft.io.SwapDir
  private def swapIn(dir: String, name: String): Unit =
    graft.io.SwapDir.swapIn(dir, name)
  private def healSwap(dir: String, name: String): Unit =
    graft.io.SwapDir.healSwap(dir, name)
  private def deleteRecursively(p: java.nio.file.Path): Unit =
    graft.io.SwapDir.deleteRecursively(p)

  /** Fold an ACCEPTED batch (the `verdict == 'new'` rows of [[ingest]],
    * i.e. already canonical within itself and unseen by the store) into
    * the persisted state: appends its (h, canonical_id) and (doc_id, sim)
    * rows as new parquet files under the same directories — no rewrite of
    * existing state, the property that keeps increments O(batch) at a
    * 100 TB corpus. Reload via [[load]] to observe the grown store.
    */
  def append(accepted: DataFrame, dir: String, textCol: String = "text",
             idCol: String = "doc_id", langCol: String = "lang"): Unit = {
    accepted.select(md5(col(textCol)).as("h"), col(idCol).as("canonical_id"))
      .write.mode("append").parquet(s"$dir/hashes")
    accepted.select(col(idCol).as("doc_id"),
        HashExprs.simhash64(col(textCol)).as("sim"), col(langCol).as("lang"))
      .write.mode("append").parquet(s"$dir/simhashes")
  }

  /** The batch after BOTH stages, with one verdict per input row:
    * `verdict` in ('dup_in_batch', 'dup_vs_store', 'near_dup_vs_store',
    * 'new'). Schema: the batch's columns + verdict. Stages:
    *
    *  1. within-batch exact: min-id canonical per md5 (q16's rule);
    *  2. vs-store exact: hash anti-join (ships 16 B/doc of the store);
    *  3. vs-store near: simhash chunk-blocked join against the store's
    *     signatures, suppressed at bit_count(xor) <= maxHamming. Bucket
    *     populations are capped on the STORE side exactly as
    *     [[SimHashDedup.candidatePairs]] caps them (skew ceiling).
    *
    * Only stages 1+2 decide 'new' vs exact-dup; stage 3 re-labels exact
    * survivors, so the exact counts are independently SQL-replayable
    * (q186) while the near stage is property-gated (q187).
    */
  def ingest(store: Store, batch: DataFrame, maxHamming: Int = 3,
             maxBucketSize: Int = 256, textCol: String = "text",
             idCol: String = "doc_id"): DataFrame =
    ingestSigned(store,
      batch.withColumn("__h", md5(col(textCol)))
        .withColumn("__sim", HashExprs.simhash64(col(textCol))),
      maxHamming, maxBucketSize, idCol)

  /** The modality-agnostic ingest core (round-15 extraction — the
    * [[ImageDedupStore]] shares every stage): `signed` is the batch
    * with its signatures already materialized as `__h` (exact, any
    * string hash) and `__sim` (64-bit locality signature). For text the
    * columns are lazy expressions Catalyst prunes where unused; for
    * images they come from one decode pass. Stages and verdict labels
    * exactly as [[ingest]] documents.
    */
  private[dedup] def ingestSigned(store: Store, signed: DataFrame,
                                  maxHamming: Int, maxBucketSize: Int,
                                  idCol: String): DataFrame = {
    val canonIds = signed.groupBy(col("__h"))
      .agg(min(col(idCol)).as("__keep"))
    val labeledExact = signed
      .join(canonIds, Seq("__h"))
      .join(store.hashes.select(col("h").as("__h"), lit(1).as("__stored")),
        Seq("__h"), "left")
      .withColumn("__verdict",
        when(col(idCol) =!= col("__keep"), lit("dup_in_batch"))
          .when(col("__stored").isNotNull, lit("dup_vs_store"))
          .otherwise(lit("new")))
    // near stage over exact survivors only: chunk-blocked candidate join
    // against the store's signatures, then the exact Hamming verify
    val survivors = labeledExact.filter(col("__verdict") === "new")
      .select(col(idCol).as("__id"), col("__sim"))
    def chunks(sim: org.apache.spark.sql.Column) = array((0 until 4).map { c =>
      shiftright(sim, c * 16).bitwiseAND(lit(0xffffL))
    }: _*)
    // the chunk INDEX rides along (posexplode): without it, chunk-i of one
    // signature would join chunk-j of another on a mere value collision —
    // still correct (the Hamming verify is exact) but candidate-inflating
    val storeSide = store.simhashes.select(col("sim").as("__ssim"),
        posexplode(chunks(col("sim"))).as(Seq("__chunk", "__ch")))
    val smallBuckets = storeSide.groupBy(col("__chunk"), col("__ch"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") <= maxBucketSize)
      .select(col("__chunk"), col("__ch"))
    val storeCapped = storeSide.join(smallBuckets, Seq("__chunk", "__ch"), "left_semi")
    val batchSide = survivors.select(col("__id"), col("__sim"),
      posexplode(chunks(col("__sim"))).as(Seq("__chunk", "__ch")))
    val nearIds = batchSide.join(storeCapped, Seq("__chunk", "__ch"))
      .filter(bit_count(col("__sim").bitwiseXOR(col("__ssim"))) <= maxHamming)
      .select(col("__id")).distinct()
    labeledExact
      .join(nearIds.select(col("__id").as("__near")), col(idCol) === col("__near"), "left")
      .withColumn("verdict",
        when(col("__verdict") === "new" && col("__near").isNotNull,
          lit("near_dup_vs_store")).otherwise(col("__verdict")))
      .drop("__h", "__sim", "__keep", "__stored", "__verdict", "__near")
  }

  /** Per-lang exact-stage report — the SQL-replayable q186 surface:
    * (lang, n_batch, n_dup_in_batch, n_dup_vs_store, n_new_exact). The
    * near stage is intentionally absent here (see [[ingest]]).
    */
  def exactReport(store: Store, batch: DataFrame, textCol: String = "text",
                  idCol: String = "doc_id", langCol: String = "lang"): DataFrame = {
    val withH = batch.withColumn("__h", md5(col(textCol)))
    val canonIds = withH.groupBy(col("__h")).agg(min(col(idCol)).as("__keep"))
    withH.join(canonIds, Seq("__h"))
      .join(store.hashes.select(col("h").as("__h"), lit(1).as("__stored")),
        Seq("__h"), "left")
      .groupBy(col(langCol))
      .agg(count(lit(1)).as("n_batch"),
        sum(when(col(idCol) =!= col("__keep"), 1L).otherwise(0L))
          .as("n_dup_in_batch"),
        sum(when(col(idCol) === col("__keep") && col("__stored").isNotNull, 1L)
          .otherwise(0L)).as("n_dup_vs_store"),
        sum(when(col(idCol) === col("__keep") && col("__stored").isNull, 1L)
          .otherwise(0L)).as("n_new_exact"))
      .orderBy(col(langCol))
  }
}
