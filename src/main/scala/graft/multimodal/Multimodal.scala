package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata,
  * with decode / feature-extraction / frame-sampling as partition-batched
  * transforms (the Scala analogue of `mapInPandas`: one iterator per
  * partition, batch-shaped, zero driver involvement).
  *
  * The actual media codecs are STUBBED (this container has no image/audio
  * libraries): [[StubDecoder]] produces deterministic fake decodes from the
  * payload bytes. Everything Spark-side — schema, encoders, partitioning,
  * batch iteration, null handling — is real and tested, so swapping in a
  * true codec is a one-object change.
  *
  * Scale notes: payloads never pass through a shuffle here (all transforms
  * are narrow); at 100 TB the payload column stays columnar-compressed in
  * parquet and is only materialized inside the partition iterator. Feature
  * rows (small, fixed-width) are what downstream joins/aggs shuffle.
  */
object Multimodal {

  /** Typed media row: opaque payload + metadata. */
  final case class MediaRow(
      media_id: Long,
      media_type: String,       // image | audio | video
      payload: Array[Byte],
      width: Int,               // pixels (image/video) or 0
      height: Int,
      duration_ms: Long)        // audio/video length or 0

  /** Extracted features: fixed-width vector + provenance. */
  final case class MediaFeatures(
      media_id: Long,
      media_type: String,
      n_bytes: Int,
      checksum: Long,
      features: Array[Float])

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("duration_ms", LongType, nullable = false)))

  /** Derive a deterministic media table from `documents` (TESTDATA has no
    * binary column): the UTF-8 bytes of the text stand in for an encoded
    * payload; metadata is derived from doc properties. This is fixture
    * plumbing — the downstream operators neither know nor care.
    */
  def fromDocuments(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
      encode(col("text"), "UTF-8").as("payload"),
      (pmod(col("n_chars"), lit(640)) + 1).cast("int").as("width"),
      (pmod(col("n_chars"), lit(480)) + 1).cast("int").as("height"),
      (col("n_chars") * 10).as("duration_ms"))

  /** The stubbed "codec": deterministic pseudo-decode of a payload.
    * A real implementation would wrap an image/audio library here; the
    * signature (bytes in, fixed-width float features out) is the contract.
    */
  object StubDecoder {
    val featureDim = 8

    /** ??? in spirit: a real decoder goes here. The stub folds payload bytes
      * into `featureDim` deterministic accumulators.
      */
    def decodeAndExtract(payload: Array[Byte]): Array[Float] = {
      val acc = new Array[Float](featureDim)
      var i = 0
      while (i < payload.length) {
        acc(i % featureDim) += (payload(i) & 0xff) / 255.0f
        i += 1
      }
      acc
    }

    def checksum(payload: Array[Byte]): Long = {
      var h = 1125899906842597L
      var i = 0
      while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
      h
    }
  }

  /** Partition-batched feature extraction (mapPartitions ≈ mapInPandas):
    * the decoder is instantiated once per partition, rows stream through it,
    * and nothing is collected. Null payloads yield zero-feature rows rather
    * than poisoning the partition.
    */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "media_type", "payload").as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init (a real codec would allocate its context here)
        val dim = StubDecoder.featureDim
        it.map { case (id, mtype, payload) =>
          if (payload == null)
            MediaFeatures(id, mtype, 0, 0L, new Array[Float](dim))
          else
            MediaFeatures(id, mtype, payload.length,
              StubDecoder.checksum(payload),
              StubDecoder.decodeAndExtract(payload))
        }
      }
  }

  /** Frame sampling for `video` rows: deterministically slice the payload
    * into `nFrames` equal byte ranges ("frames") and emit one row each —
    * the explode-shaped operator a real video pipeline needs, with the
    * decode stubbed.
    */
  def sampleFrames(media: DataFrame, nFrames: Int = 4): DataFrame = {
    media
      .filter(col("media_type") === "video" && col("payload").isNotNull)
      .withColumn("frame_idx", explode(sequence(lit(0), lit(nFrames - 1))))
      .select(
        col("media_id"), col("frame_idx"),
        expr("substring(payload, " +
          s"cast(frame_idx * length(payload) / $nFrames as int) + 1, " +
          s"cast((frame_idx + 1) * length(payload) / $nFrames as int) - " +
          s"cast(frame_idx * length(payload) / $nFrames as int))").as("frame_bytes"))
      .withColumn("frame_checksum", xxhash64(col("frame_bytes")))
  }

  /** "Resize" stub for images: emits target dims + a payload truncated
    * proportionally — exercises binary slicing + metadata rewrite.
    */
  def resizeImages(media: DataFrame, targetW: Int, targetH: Int): DataFrame =
    media
      .filter(col("media_type") === "image" && col("payload").isNotNull)
      .select(
        col("media_id"),
        lit(targetW).as("width"),
        lit(targetH).as("height"),
        expr(s"substring(payload, 1, greatest(cast(length(payload) * $targetW / greatest(width, $targetW) as int), 1))")
          .as("payload"))
}
