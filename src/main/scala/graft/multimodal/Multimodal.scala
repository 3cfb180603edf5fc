package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata,
  * with decode / feature-extraction / frame-sampling as partition-batched
  * transforms (the Scala analogue of `mapInPandas`: one iterator per
  * partition, batch-shaped, zero driver involvement).
  *
  * IMAGE decode is REAL: [[PngCodec]] encodes and decodes actual PNG bytes
  * through the JDK's `javax.imageio` (zlib inflate, PNG filters, raster
  * iteration — no external dependency). "Video" rows are PNG filmstrips
  * (frames stacked vertically in one image), the JDK-decodable stand-in
  * for a frame-extracted clip. Only AUDIO (and true video containers)
  * remain stubbed via [[StubDecoder]] — this container has no media
  * libraries beyond the JDK — and everything Spark-side (schema, encoders,
  * partitioning, batch iteration, null handling) is identical between the
  * real and stubbed paths, so swapping a true codec in is a one-object
  * change.
  *
  * Scale notes: payloads never pass through a shuffle here (all transforms
  * are narrow); at 100 TB the payload column stays columnar-compressed in
  * parquet and is only materialized inside the partition iterator. Feature
  * rows (small, fixed-width) are what downstream joins/aggs shuffle.
  */
object Multimodal {

  /** Real PNG encode/decode via JDK `javax.imageio`.
    *
    * The synthetic images are DETERMINISTIC CLOSED-FORM functions of
    * `(doc_id, n_chars)` — a two-tone vertical split for still images, one
    * constant-color band per frame for filmstrips — so a SQL oracle can
    * re-derive every decoded statistic (dims, per-channel pixel sums) from
    * the documents table alone, while the engine side must actually parse
    * the PNG container: IHDR dims, zlib-inflated scanlines, per-pixel
    * raster sums. A decode bug (wrong stride, channel order, filter
    * reconstruction) breaks the hash gate; a byte-fold stub cannot pass it.
    */
  object PngCodec {
    javax.imageio.ImageIO.setUseCache(false) // in-memory streams, no /tmp cache files

    val filmFrames = 4

    /** Closed-form image parameters. Every value is reproduced literally in
      * `SparkEntry.oracleSql(q28/q29)` — change BOTH or neither.
      */
    final case class ImageParams(w: Int, h: Int,
                                 rA: Int, gA: Int, bA: Int,
                                 rB: Int, gB: Int, bB: Int)
    def imageParams(docId: Long, nChars: Long): ImageParams = ImageParams(
      w = (nChars % 64 + 16).toInt,
      h = (docId % 48 + 16).toInt,
      rA = (docId % 256).toInt, gA = (nChars % 256).toInt,
      bA = ((docId * 31 + 7) % 256).toInt,
      rB = ((docId * 7 + 13) % 256).toInt, gB = ((nChars * 5 + 3) % 256).toInt,
      bB = ((docId + nChars) % 256).toInt)

    /** Filmstrip frame band height + per-frame constant color. */
    def frameHeight(docId: Long): Int = (docId % 24 + 8).toInt
    def frameColor(docId: Long, nChars: Long, f: Int): (Int, Int, Int) = (
      ((docId * 5 + 11L * f + 1) % 256).toInt,
      ((nChars + 17L * f) % 256).toInt,
      ((docId * 3 + 29L * f + 5) % 256).toInt)

    private def toPng(img: java.awt.image.BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** Two-tone still image: left half color A (x < w/2), right half B. */
    def encodeImage(docId: Long, nChars: Long): Array[Byte] = {
      val p = imageParams(docId, nChars)
      val img = new java.awt.image.BufferedImage(
        p.w, p.h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val half = p.w / 2
      val a = (p.rA << 16) | (p.gA << 8) | p.bA
      val b = (p.rB << 16) | (p.gB << 8) | p.bB
      var y = 0
      while (y < p.h) {
        var x = 0
        while (x < p.w) { img.setRGB(x, y, if (x < half) a else b); x += 1 }
        y += 1
      }
      toPng(img)
    }

    /** Filmstrip: `filmFrames` constant-color bands stacked vertically. */
    def encodeFilmstrip(docId: Long, nChars: Long): Array[Byte] = {
      val w = imageParams(docId, nChars).w
      val hF = frameHeight(docId)
      val img = new java.awt.image.BufferedImage(
        w, hF * filmFrames, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var f = 0
      while (f < filmFrames) {
        val (r, g, b) = frameColor(docId, nChars, f)
        val rgb = (r << 16) | (g << 8) | b
        var y = f * hF
        while (y < (f + 1) * hF) {
          var x = 0
          while (x < w) { img.setRGB(x, y, rgb); x += 1 }
          y += 1
        }
        f += 1
      }
      toPng(img)
    }

    final case class ImageStats(width: Int, height: Int,
                                sum_r: Long, sum_g: Long, sum_b: Long)

    /** Full decode: container parse + per-pixel channel sums. */
    def decodeStats(payload: Array[Byte]): ImageStats = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      require(img != null, "payload is not a decodable image")
      decodeRegion(img, 0, img.getHeight)
    }

    /** 64-bit perceptual average-hash (aHash) of a decoded image: the
      * raster is partitioned into an 8x8 grid (pixel (x,y) belongs to cell
      * (floor(8y/h), floor(8x/w)) — i.e. cell column j covers
      * x ∈ [ceil(jw/8), ceil((j+1)w/8))), each cell's luma is its summed
      * r+g+b, and bit i*8+j is set iff the cell's MEAN luma STRICTLY
      * exceeds the whole image's — compared in exact integer cross-products
      * (cellSum * totalPixels > totalSum * cellPixels), so no float ever
      * decides a bit. Perceptually similar images (same coarse light/dark
      * layout) collide on the hash regardless of exact pixel values or
      * dimensions — the image-modality analogue of SimHash, and the
      * blocking key for image near-dup grouping (q138).
      */
    def aHash64(payload: Array[Byte]): Long = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      require(img != null, "payload is not a decodable image")
      val (w, h) = (img.getWidth, img.getHeight)
      require(w >= 8 && h >= 8, s"aHash needs >=8x8 pixels, got ${w}x$h")
      val sums = new Array[Long](64)
      val counts = new Array[Long](64)
      var y = 0
      while (y < h) {
        val i = y * 8 / h
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val luma = ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
          val c = i * 8 + x * 8 / w
          sums(c) += luma
          counts(c) += 1
          x += 1
        }
        y += 1
      }
      val total = sums.sum
      val n = w.toLong * h
      var hash = 0L
      var c = 0
      while (c < 64) {
        if (sums(c) * n > total * counts(c)) hash |= 1L << c
        c += 1
      }
      hash
    }

    /** Band decode for one filmstrip frame: rows [y0, y0+h). */
    def decodeRegion(img: java.awt.image.BufferedImage, y0: Int, h: Int): ImageStats = {
      var (sr, sg, sb) = (0L, 0L, 0L)
      var y = y0
      while (y < y0 + h) {
        var x = 0
        while (x < img.getWidth) {
          val rgb = img.getRGB(x, y)
          sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
          x += 1
        }
        y += 1
      }
      ImageStats(img.getWidth, h, sr, sg, sb)
    }
  }

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
