package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Random-hyperplane (sign) LSH for embedding-cosine near-duplicate
  * detection — the vector-space sibling of the MinHash text pipeline:
  * signature → band → bucket-join candidates → exact-cosine verify.
  *
  * Each signature bit is the sign of a dot product with a fixed seeded
  * Gaussian hyperplane (P[bit collision] = 1 − θ/π for angle θ), so
  * near-identical vectors agree on whole bands with overwhelming
  * probability while random pairs land in a given b-bit band bucket with
  * p ≈ 2⁻ᵇ (b auto-scaled with corpus size, see [[autoBits]]) — candidate
  * generation is a uniform hash-keyed shuffle, never an all-pairs join.
  *
  * Scale notes (100 TB path, same shape as [[graft.dedup.MinHashLSH]]):
  * signatures are narrow per-row codegen'd expressions (bands·bits dot
  * products per row, zero shuffle); the only pre-verify shuffle is keyed by
  * (band, bucket-hash); degenerate buckets are size-capped; the exact
  * verify touches candidate pairs only. Above the input-size gate the
  * vector and band-signature tables are file-staged once so no plan
  * branch recomputes them (see [[nearDuplicatePairs]]); below it they
  * route through one shared repartition exchange.
  */
object CosineLSH {

  /** Deterministic Gaussian hyperplanes: nPlanes × dim, seeded. */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** One band's signature: `bits` sign bits packed into a long. */
  def bandSignature(vec: Column, planes: Seq[Array[Double]]): Column =
    planes.zipWithIndex.map { case (w, j) =>
      when(Knn.dot(vec, typedLit(w)) > 0d, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Bits per band so mean bucket occupancy stays ~4 at any corpus size:
    * ceil(log2(n/4)), clamped to [8, 20]. A FIXED band width is a scale
    * bug this library measured, not a hypothetical: at 8 bits the bucket
    * space is 256/band, so mean occupancy grows linearly with the corpus
    * (n=8020 → 31/bucket at sf1) and the degenerate-bucket cap starts
    * trimming the upper tail of RANDOM buckets — the sf1 differential run
    * lost five true ~0.999-cosine pairs, one to a bucket of exactly
    * cap+1. Scaling the width with log2(n) keeps the cap what it is meant
    * to be: protection against adversarially identical vectors, ~16x the
    * random mean, not a recall tax.
    */
  def autoBits(n: Long): Int =
    math.min(20, math.max(8,
      math.ceil(math.log(math.max(1L, n).toDouble / 4) / math.log(2)).toInt))

  /** Bands to pair with a given band width: wider bands collide less per
    * band (p^b), so recall must be bought back with more of them —
    * L = 4·⌈b/8⌉ squares the per-pair miss probability each time the
    * width grows by 8 (miss = (1−p^b)^L). Measured on the sf1 corpus:
    * 4×11-bit bands missed 13 of 12,080 true pairs (99.89% recall);
    * 8×11-bit bands recover every one. At the driver-gate scales
    * (b = 8) this is the original 4 bands, bit-identical signatures.
    */
  def autoBands(bits: Int): Int = 4 * math.max(1, math.ceil(bits / 8.0).toInt)

  /** Near-duplicate pairs (id1 < id2) with exact cosine ≥ `threshold`
    * (compared on the 6-decimal-rounded value so an SQL oracle can mirror
    * the gate bit-for-bit). `bitsPerBand = 0` (the default) derives the
    * band width from the corpus size via [[autoBits]]; `bands = 0` (the
    * default) derives the band count from the width via [[autoBands]].
    */
  def nearDuplicates(embeddings: DataFrame, threshold: Double = 0.99,
                     idCol: String = "vec_id", vecCol: String = "embedding",
                     bands: Int = 0, bitsPerBand: Int = 0, seed: Long = 42L,
                     maxBucketSize: Int = 64): DataFrame =
    nearDuplicatePairs(embeddings, threshold, idCol, vecCol, bands,
      bitsPerBand, seed, maxBucketSize)
      .orderBy(col("id1"), col("id2"))

  /** [[nearDuplicates]] without the final global sort — for pipeline
    * consumers (connected components, dedup drops) whose downstream
    * aggregations are order-blind; the range exchange + sort bought
    * nothing there (guide §2.4). Pair SET is identical.
    */
  def nearDuplicatePairs(embeddings: DataFrame, threshold: Double = 0.99,
                         idCol: String = "vec_id", vecCol: String = "embedding",
                         bands: Int = 0, bitsPerBand: Int = 0, seed: Long = 42L,
                         maxBucketSize: Int = 64): DataFrame = {
    val dimRow = embeddings.select(size(col(vecCol))).limit(1).collect()
    if (dimRow.isEmpty) { // empty corpus -> empty result, not a crash
      val idT = embeddings.schema(idCol).dataType
      return embeddings.sparkSession.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id1", idT),
          org.apache.spark.sql.types.StructField("id2", idT),
          org.apache.spark.sql.types.StructField("cosine",
            org.apache.spark.sql.types.DoubleType))))
    }
    val dim = dimRow(0).getInt(0)
    val bits = if (bitsPerBand > 0) bitsPerBand else autoBits(embeddings.count())
    val nBands = if (bands > 0) bands else autoBands(bits)
    val planes = hyperplanes(nBands * bits, dim, seed)
    // Above the input-size gate both multi-consumer frames are FILE-STAGED
    // once (the MinHashLSH round-17 finding: pushed-down per-consumer
    // predicates defeat exchange/stage reuse, so the lazy form re-ran the
    // signature compute per branch): `prepped` feeds both verify joins,
    // `banded` — nBands·bits dot products per row, the expensive kernel —
    // feeds the bucket cap and both sides of the pair join. `banded` is
    // tiny on disk (3 longs per (doc, band)). Below the gate the lazy
    // shared-exchange form is kept. Eager-staging contract as documented
    // on MinHashLSH.nearDuplicatePairs.
    val stageLarge = graft.IterState.shouldStage(embeddings)
    val preppedRaw = embeddings
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
    val prepped =
      if (stageLarge) graft.IterState.copyOut(preppedRaw)
      else preppedRaw.repartition(col("id")) // one shared exchange when lazy
    val bandedRaw = prepped.select(col("id"), explode(array(
      (0 until nBands).map { b =>
        struct(lit(b).as("band"),
          bandSignature(col("v"),
            (0 until bits).map(j => planes(b * bits + j))).as("sig"))
      }: _*)).as("bs"))
      .select(col("id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
    val banded =
      if (stageLarge) graft.IterState.copyOut(bandedRaw) else bandedRaw
    // bucket cap via groupBy().count() + semi-join (no per-bucket SORT; the
    // (band, sig) exchange is shared with the pair join via ReusedExchange)
    val smallBuckets = banded.groupBy(col("band"), col("sig"))
      .agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n") <= maxBucketSize)
      .select(col("band"), col("sig"))
    val sized = banded.join(smallBuckets, Seq("band", "sig"), "left_semi")
    val pairs = sized.select(col("band"), col("sig"), col("id").as("id1"))
      .join(sized.select(col("band"), col("sig"), col("id").as("id2")), Seq("band", "sig"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"))
      .distinct()
    val v1 = prepped.select(col("id").as("id1"), col("v").as("v1"))
    val v2 = prepped.select(col("id").as("id2"), col("v").as("v2"))
    pairs.join(v1, "id1").join(v2, "id2")
      .withColumn("cosine",
        round(Knn.dot(col("v1"), col("v2")) / (Knn.norm(col("v1")) * Knn.norm(col("v2"))), 6))
      .filter(col("cosine") >= threshold)
      .select(col("id1"), col("id2"), col("cosine"))
  }
}
