package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus mixing / reweighting — the data-mixture stage of a
  * training pipeline: keep each stratum (language, source, ...) at a target
  * sampling rate, reproducibly (same row → same verdict on every run and
  * every engine).
  *
  * The keep-gate is a Knuth multiplicative hash in exact BIGINT arithmetic:
  * `(id * 2654435761) mod 2^32 < rate * 2^32`. No RNG and no engine-specific
  * hash function — any engine that multiplies integers keeps the SAME rows,
  * which is what makes the mixture auditable and the oracle exact. Rates
  * should be dyadic (k/2^n, e.g. 0.5, 0.25, 0.125) so `rate * 2^32` is an
  * exact integer: engines disagree on double→int cast rounding otherwise.
  *
  * Scale: a narrow per-row filter — zero shuffle, pushes past column
  * pruning; the per-stratum rate is a CASE literal, no join. Valid for ALL
  * 64-bit ids (see [[knuthHash]]).
  */
object Mixing {
  val M: Long = 4294967296L // 2^32
  val A: Long = 2654435761L // Knuth's multiplicative hash constant

  /** `(id * A) mod 2^32` in overflow-free long arithmetic. The naive
    * `id * A` leaves a signed 64-bit long once id exceeds ~2^31.8 —
    * reachable at 100 TB doc counts — and ANSI-off Spark would wrap
    * SILENTLY, diverging from any exact-arithmetic oracle. Split the id's
    * low 32 bits (the only ones that matter mod 2^32) as l1·2^16 + l0:
    *
    *   (id·A) mod 2^32 = ((l1·A mod 2^16)·2^16 + l0·A) mod 2^32
    *
    * so every intermediate stays < 2^49. Matches the BigInt model
    * `(BigInt(id) * A).mod(2^32)` for every long, negatives included
    * (two's-complement low bits ARE id mod 2^32) — MixingSpec checks the
    * 2^31 and 2^62 neighborhoods against that model.
    */
  def knuthHash(id: Column): Column = {
    val idL = id.cast("long")
    val l0 = idL.bitwiseAND(lit(0xffffL))
    val l1 = shiftright(idL, 16).bitwiseAND(lit(0xffffL))
    pmod(pmod(l1 * lit(A), lit(65536L)) * lit(65536L) + l0 * lit(A), lit(M))
  }

  /** keep iff (id * A) mod 2^32 < rate * 2^32 — deterministic in exact
    * integer arithmetic.
    */
  def keepGate(id: Column, rate: Column): Column =
    knuthHash(id) < (rate * lit(M.toDouble)).cast("long")

  /** Filter `df` to the per-stratum rates; strata missing from `rates` keep
    * `defaultRate` of their rows.
    */
  def sampleStrata(df: DataFrame, strataCol: String, rates: Map[String, Double],
                   idCol: String = "doc_id", defaultRate: Double = 1.0): DataFrame = {
    val rateCol = rates.foldLeft(lit(defaultRate): Column) { case (acc, (k, v)) =>
      when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    df.filter(keepGate(col(idCol), rateCol))
  }

  /** Budget-greedy QUALITY selection — the other way practitioners fill a
    * token budget: instead of sampling every stratum at a rate (the
    * [[sampleStrata]] family), rank each stratum's documents by a quality
    * score and take the prefix that fits the stratum's token budget (the
    * "best docs first, stop at the budget" curriculum cut).
    *
    * Greedy-prefix semantics: within a stratum, documents are ordered by
    * (score DESC, id ASC — deterministic ties) and a document is kept iff
    * its INCLUSIVE running token total stays within `budgetTokens`; the
    * running total is monotone, so the kept set is a prefix and the first
    * overflowing document is the hard cut. All integer arithmetic.
    *
    * Scale shape: ONE running-sum window per stratum partition (the q70
    * packing cumsum shape — range-partitioned sort, no driver state) over
    * the narrow (stratum, score, id, tokens) projection, then the rollup.
    * Skewed strata sort big partitions — inherent to "rank within
    * stratum"; sub-salt by score band if a single stratum outgrows an
    * executor at 100 TB.
    */
  def budgetGreedySelect(df: DataFrame, strataCol: String, scoreCol: Column,
                         tokensCol: Column, budgetTokens: Long,
                         idCol: String = "doc_id"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(col("_score").desc, col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    df.select(col(strataCol), col(idCol), scoreCol.as("_score"),
        tokensCol.cast("long").as("_nt"))
      .withColumn("_cum", sum(col("_nt")).over(w))
      .filter(col("_cum") <= budgetTokens)
  }

  /** Fractional-epoch MATERIALIZATION — the execution half of the mixing
    * plan: [[sampleStrata]]/q114 only *derive* keep-rates and epoch
    * factors; a training run needs the oversampled rows to actually exist
    * (each doc repeated "2.5 times"). A factor f = k + r (integer part k,
    * fraction r) materializes every row k times plus one more iff the
    * row's Knuth keep-gate fires at rate r — so a stratum at f=2.5 emits
    * each doc 2 or 3 times and EXACTLY the planned token mass in
    * expectation, deterministically (same rows get the extra epoch on
    * every engine and every run). f < 1 degenerates to plain subsampling
    * (k=0), one formula for both directions. Factors should be dyadic so
    * r·2^32 is exact (the [[keepGate]] contract).
    *
    * Scale shape: a narrow per-row copy count + `explode(sequence(...))`
    * — map-only, zero shuffle, zero driver state; output rows carry an
    * `epoch` index (1..n) so downstream packing can interleave epochs.
    */
  def epochExpand(df: DataFrame, strataCol: String, factors: Map[String, Double],
                  idCol: String = "doc_id", defaultFactor: Double = 1.0)
      : DataFrame = {
    val f = factors.foldLeft(lit(defaultFactor): Column) { case (acc, (k, v)) =>
      when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    val whole = floor(f).cast("long")
    val frac = f - floor(f)
    val copies = whole +
      when(knuthHash(col(idCol)) < (frac * lit(M.toDouble)).cast("long"), 1L)
        .otherwise(0L)
    df.withColumn("_n_copies", copies)
      .filter(col("_n_copies") > 0)
      .withColumn("epoch", explode(sequence(lit(1L), col("_n_copies"))))
      .drop("_n_copies")
  }
}
