package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted tokenizer artifacts — train once at [[BpeTrainer]] cost,
  * serve forever (the [[graft.dedup.DedupStore]] / AnnIndex
  * build-once/load-forever discipline applied to the merge table):
  *
  *   <dir>/merges — (round, left, right, pair_count): the ordered merge
  *                  table exactly as the trainers emit it.
  *   <dir>/vocab  — (symbol, id): id 0..nBase−1 for the BASE symbols
  *                  (the training corpus's distinct code points, UTF-8
  *                  binary order — the engine's canonical string order),
  *                  then nBase + (round − 1) for each merge's output
  *                  symbol in round order. The byte-level-BPE convention
  *                  reserves 256 base ids; this engine's BPE is
  *                  code-point-level (the "(.)" contract of
  *                  [[BpeTrainer]]), so the base block is the observed
  *                  alphabet instead — documented deviation, same shape.
  *
  * Writes go through the `_staging` + rename discipline
  * ([[graft.io.SwapDir]] — single-writer contract there), so a reader
  * never observes a half-written table and a crashed rewrite self-heals
  * at [[load]]. Both artifacts are KB–MB at a 32k-merge vocabulary;
  * [[load]]'s collects are the sanctioned sketch-sized driver state
  * (same class as PQ codebooks and KMeans centroids).
  */
object BpeStore {

  /** Driver-side tokenizer state: ordered merge pairs + the symbol→id
    * map (vocabulary-sized, broadcast by the encoders).
    */
  final case class Loaded(merges: Seq[(String, String)], vocab: Map[String, Int])

  /** Persist a trained merge table + the derived vocab under `dir`.
    * `merges` must carry (round, left, right, pair_count) in round
    * order (both trainers' output); `baseSymbols` is the training
    * corpus alphabet ([[BpeTrainer.baseSymbols]]).
    */
  def write(merges: DataFrame, baseSymbols: Seq[String], dir: String): Unit = {
    val spark = merges.sparkSession
    import spark.implicits._
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    merges.orderBy(col("round"))
      .write.mode("overwrite").parquet(s"$dir/merges_staging")
    graft.io.SwapDir.swapIn(dir, "merges")
    val ordered = spark.read.parquet(s"$dir/merges")
      .orderBy(col("round"))
      .select(col("left"), col("right")).collect()
      .map(r => r.getString(0) + r.getString(1))
    val sortedBase = baseSymbols.sorted(BpeTrainer.utf8BinaryOrdering)
    val vocabRows = sortedBase.zipWithIndex ++
      ordered.zipWithIndex.map { case (sym, i) => sym -> (sortedBase.size + i) }
    // Vocab ids are only well-defined when merge-output symbols are unique:
    // two merges producing the same string (e.g. (a,bc) and (ab,c) -> "abc")
    // would write duplicate symbol rows and load()'s .toMap would silently
    // keep an arbitrary id (round-15 ADVICE). Fail fast at write time.
    val dup = vocabRows.groupBy(_._1).collectFirst { case (s, g) if g.size > 1 => s }
    require(dup.isEmpty,
      s"duplicate vocab symbol '${dup.get}': two merges produce the same " +
        "output string — this merge table cannot be id-encoded unambiguously")
    vocabRows.toSeq.toDF("symbol", "id")
      .write.mode("overwrite").parquet(s"$dir/vocab_staging")
    graft.io.SwapDir.swapIn(dir, "vocab")
  }

  /** Reload the tokenizer state (healing any interrupted swap). */
  def load(spark: SparkSession, dir: String): Loaded = {
    graft.io.SwapDir.healSwap(dir, "merges")
    graft.io.SwapDir.healSwap(dir, "vocab")
    val merges = spark.read.parquet(s"$dir/merges")
      .orderBy(col("round"))
      .select(col("left"), col("right")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    val vocabRows = spark.read.parquet(s"$dir/vocab")
      .select(col("symbol"), col("id")).collect()
      .map(r => r.getString(0) -> r.getInt(1))
    val vocab = vocabRows.toMap
    // symbol uniqueness is write()'s invariant; a store that violates it
    // (hand-edited, pre-guard) must not silently encode with arbitrary ids
    require(vocab.size == vocabRows.length,
      s"vocab at $dir holds duplicate symbols (${vocabRows.length} rows, " +
        s"${vocab.size} distinct) — refusing ambiguous id encoding")
    Loaded(merges, vocab)
  }
}
