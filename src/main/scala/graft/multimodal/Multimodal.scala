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
  * for a frame-extracted clip. AUDIO decode is REAL too: [[WavCodec]]
  * encodes and decodes actual RIFF/WAV PCM through the JDK's
  * `javax.sound.sampled` (container header parse, frame/channel layout,
  * little-endian 16-bit sample reassembly — the r7 "no JDK codec" claim
  * was wrong and is hereby retired). Only true video CONTAINERS (mp4 et
  * al.) have no JDK codec; the filmstrip stand-in covers the
  * frame-sampling shape.
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

    /** Gray two-tone split with EXPLICIT geometry — the planted image-
      * dedup corpus's constructor (q206): `vertical = true` puts vA on
      * the left half, vB right; false puts vA on top, vB bottom. Two
      * images with the same orientation and brightness order share an
      * aHash exactly (each half's cells sit strictly on one side of the
      * mean); vertical vs horizontal families differ in 32 bits and
      * share NO 16-bit chunk — distinct blocking families.
      */
    def encodeSplitGray(w: Int, h: Int, vA: Int, vB: Int,
                        vertical: Boolean): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val a = (vA << 16) | (vA << 8) | vA
      val b = (vB << 16) | (vB << 8) | vB
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val first = if (vertical) x < w / 2 else y < h / 2
          img.setRGB(x, y, if (first) a else b)
          x += 1
        }
        y += 1
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

  /** Real baseline-JPEG encode/decode via JDK `javax.imageio` — the
    * crawl-first image format the PNG path didn't cover (the WAV lesson:
    * check the JDK before declaring a codec gap; ImageIO ships a
    * baseline JPEG codec).
    *
    * JPEG is lossy, so the oracle trick differs from [[PngCodec]]: the
    * synthetic images are GRAY two-tone vertical splits whose split
    * falls on an 8-pixel boundary, encoded at compression quality 1.0 —
    * then every 8x8 DCT block is a CONSTANT plane (DC-only spectrum),
    * gray pixels carry flat 128 chroma (exact under 4:2:0 subsampling),
    * and the all-ones quantization tables at quality 1.0 round-trip the
    * DC coefficient exactly — so the DECODED pixel grid is pinned by
    * construction and a SQL oracle re-derives dims and channel sums
    * closed-form, while the engine still parses a real JFIF container
    * (SOI/DQT/SOF0/Huffman scans). JpegCodecSpec additionally asserts
    * bit-invariance of the decoded raster against the SAME grid pushed
    * through the lossless PNG path — two engine decode paths, one
    * pixel truth.
    */
  object JpegCodec {
    javax.imageio.ImageIO.setUseCache(false)

    /** Closed-form image parameters; reproduced literally in
      * `SparkEntry.oracleSql(q205)` — change BOTH or neither. Width is a
      * multiple of 16 (split at w/2 stays 8-aligned), height a multiple
      * of 8 — every block single-tone.
      */
    final case class JpegParams(w: Int, h: Int, vA: Int, vB: Int)
    def imageParams(docId: Long, nChars: Long): JpegParams = JpegParams(
      w = (nChars % 4 + 2).toInt * 16,
      h = (docId % 6 + 2).toInt * 8,
      vA = (docId % 256).toInt,
      vB = ((docId * 7 + 13) % 256).toInt)

    /** Gray two-tone still: left half (x < w/2) value vA, right half vB,
      * r = g = b everywhere, written as baseline JPEG at quality 1.0.
      */
    def encodeJpeg(docId: Long, nChars: Long): Array[Byte] = {
      val p = imageParams(docId, nChars)
      val img = new java.awt.image.BufferedImage(
        p.w, p.h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val a = (p.vA << 16) | (p.vA << 8) | p.vA
      val b = (p.vB << 16) | (p.vB << 8) | p.vB
      val half = p.w / 2
      var y = 0
      while (y < p.h) {
        var x = 0
        while (x < p.w) { img.setRGB(x, y, if (x < half) a else b); x += 1 }
        y += 1
      }
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
      val param = writer.getDefaultWriteParam
      param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      param.setCompressionQuality(1.0f) // all-ones quant tables: flat blocks round-trip exactly
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
      writer.dispose()
      ios.close()
      bos.toByteArray
    }

    /** Full decode: JFIF container parse + per-pixel channel sums — the
      * raster walk is [[PngCodec.decodeRegion]], shared format-agnostic.
      */
    def decodeStats(payload: Array[Byte]): PngCodec.ImageStats = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      require(img != null, "payload is not a decodable image")
      PngCodec.decodeRegion(img, 0, img.getHeight)
    }
  }

  /** Real RIFF/WAV PCM encode/decode via JDK `javax.sound.sampled`.
    *
    * Same oracle discipline as [[PngCodec]]: the synthetic clips are
    * DETERMINISTIC CLOSED-FORM functions of `(doc_id, n_chars)` — stereo
    * 16-bit PCM whose sample `i` on each channel is the modular ramp
    * `((a + i*b) mod 65536) - 32768` — so a SQL oracle re-derives frame
    * counts and per-channel sample sums from the documents table alone,
    * while the engine must actually parse the WAV container: RIFF header,
    * fmt chunk (channels / rate / bits / endianness), data chunk, and
    * little-endian signed 16-bit interleaved frame reassembly. A wrong
    * frame size, channel order, or sign extension breaks the hash gate.
    */
  object WavCodec {
    val sampleRateHz = 8000
    val channels = 2

    /** Closed-form clip parameters; reproduced literally in
      * `SparkEntry.oracleSql(q139)` — change BOTH or neither.
      */
    final case class AudioParams(nFrames: Int, a0: Long, b0: Long,
                                 a1: Long, b1: Long)
    def audioParams(docId: Long, nChars: Long): AudioParams = AudioParams(
      nFrames = (nChars % 700 + 160).toInt,
      a0 = (docId * 131 + 7) % 65536, b0 = (nChars * 17 + 3) % 65536,
      a1 = (docId * 89 + 11) % 65536, b1 = (nChars * 29 + 5) % 65536)

    private def sampleOf(a: Long, b: Long, i: Int): Int =
      (((a + i.toLong * b) % 65536) - 32768).toInt

    /** Stereo 16-bit little-endian PCM, wrapped in a real WAV container by
      * `AudioSystem.write` (the JDK emits the RIFF/fmt/data chunks).
      */
    def encodeWav(docId: Long, nChars: Long): Array[Byte] = {
      val p = audioParams(docId, nChars)
      val raw = new Array[Byte](p.nFrames * channels * 2)
      var i = 0
      while (i < p.nFrames) {
        val l = sampleOf(p.a0, p.b0, i)
        val r = sampleOf(p.a1, p.b1, i)
        raw(4 * i) = (l & 0xff).toByte
        raw(4 * i + 1) = ((l >> 8) & 0xff).toByte
        raw(4 * i + 2) = (r & 0xff).toByte
        raw(4 * i + 3) = ((r >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(
        sampleRateHz.toFloat, 16, channels, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(raw), fmt, p.nFrames.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

    final case class AudioStats(channels: Int, sampleRate: Int,
                                frames: Long, sumLeft: Long, sumRight: Long)

    /** Parsed container geometry shared by the decode entry points. */
    private final case class PcmLayout(channels: Int, sampleRate: Int,
                                       dataOff: Int, nFrames: Int)

    /** Full decode: WAV container parse + per-channel signed sample sums.
      * Mono clips report their single channel as left, 0 right.
      *
      * The container is parsed DIRECTLY (RIFF/WAVE header check, chunk
      * walk with word alignment, fmt validation, data-chunk bounds) rather
      * than through `AudioSystem.getAudioInputStream`: the JDK entry point
      * re-runs its SPI provider scan on EVERY call behind a process-global
      * lock, which serializes concurrent decode tasks — measured 17x worse
      * than single-threaded at 8 threads (WavProbe), the root cause of
      * q139's superlinear bench flag. The validation contract is unchanged:
      * anything but 16-bit PCM (WAV fmt tag 1 — little-endian signed by
      * the RIFF spec) is rejected loudly.
      */
    def decodeStats(payload: Array[Byte]): AudioStats = {
      val lay = parseContainer(payload)
      val ch = lay.channels
      val frameBytes = 2 * ch
      var (sl, sr) = (0L, 0L)
      var f = 0
      while (f < lay.nFrames) {
        val base = lay.dataOff + f * frameBytes
        sl += (((payload(base + 1) & 0xff) << 8) | (payload(base) & 0xff)).toShort
        if (ch > 1)
          sr += (((payload(base + 3) & 0xff) << 8) | (payload(base + 2) & 0xff)).toShort
        f += 1
      }
      AudioStats(ch, lay.sampleRate, lay.nFrames.toLong, sl, sr)
    }

    private def parseContainer(payload: Array[Byte]): PcmLayout = {
      def le16(o: Int): Int =
        ((payload(o + 1) & 0xff) << 8) | (payload(o) & 0xff)
      def le32(o: Int): Int =
        (payload(o) & 0xff) | ((payload(o + 1) & 0xff) << 8) |
          ((payload(o + 2) & 0xff) << 16) | ((payload(o + 3) & 0xff) << 24)
      def tag(o: Int): String =
        new String(payload, o, 4, java.nio.charset.StandardCharsets.ISO_8859_1)
      require(payload.length >= 44 && tag(0) == "RIFF" && tag(8) == "WAVE",
        s"not a RIFF/WAVE container (${payload.length} bytes)")
      var off = 12
      var fmtTag, ch, rate, bits = -1
      var dataOff, dataLen = -1
      while (off + 8 <= payload.length && (dataOff < 0 || ch < 0)) {
        val id = tag(off)
        val sz = le32(off + 4)
        require(sz >= 0, s"negative chunk size at offset $off")
        if (id == "fmt ") {
          require(sz >= 16, s"fmt chunk too short ($sz bytes)")
          fmtTag = le16(off + 8); ch = le16(off + 10)
          rate = le32(off + 12); bits = le16(off + 22)
        } else if (id == "data") {
          dataOff = off + 8; dataLen = sz
        }
        off += 8 + sz + (sz & 1) // RIFF chunks are word-aligned
      }
      require(fmtTag == 1 && bits == 16 && ch >= 1 && dataOff >= 0,
        s"expected 16-bit little-endian signed PCM (fmt tag 1), got " +
          s"tag=$fmtTag bits=$bits channels=$ch dataChunk=${dataOff >= 0}")
      val frameBytes = 2 * ch
      val nFrames = math.min(dataLen, payload.length - dataOff) / frameBytes
      PcmLayout(ch, rate, dataOff, nFrames)
    }

    /** Clipping / silence / peak-level thresholds of the audit decode —
      * reproduced literally in `SparkEntry.oracleSql(q156)`; change BOTH
      * or neither. "Clipped" means |s| at or beyond 2 units below 16-bit
      * full scale (real pipelines flag near-rail samples, not only exact
      * ±32768 rails, because codecs dither the rail); "silence" means
      * |s| <= 512 (~ -36 dBFS).
      */
    val clipAbs = 32766
    val silenceAbs = 512

    final case class AudioAudit(channels: Int, frames: Long,
                                clipLeft: Long, clipRight: Long,
                                silenceLeft: Long, silenceRight: Long,
                                peakLeft: Int, peakRight: Int,
                                energyLeft: Long, energyRight: Long)

    /** Audio QUALITY audit over the decoded PCM — the audio analogue of the
      * text quality gates (clipped/near-rail sample counts, silence-floor
      * counts, per-channel peak and integer energy): the stats a corpus
      * builder filters speech clips on before transcription. Shares
      * [[parseContainer]] with [[decodeStats]]; one pass over the frames,
      * exact integer outputs (energy = sum of s^2 fits a long:
      * 2^30 * frames).
      */
    def decodeAudit(payload: Array[Byte]): AudioAudit = {
      val lay = parseContainer(payload)
      val ch = lay.channels
      val frameBytes = 2 * ch
      var clipL, clipR, silL, silR, enL, enR = 0L
      var peakL, peakR = 0
      var f = 0
      while (f < lay.nFrames) {
        val base = lay.dataOff + f * frameBytes
        val l: Int =
          (((payload(base + 1) & 0xff) << 8) | (payload(base) & 0xff)).toShort.toInt
        val la = math.abs(l)
        if (la >= clipAbs) clipL += 1
        if (la <= silenceAbs) silL += 1
        if (la > peakL) peakL = la
        enL += l.toLong * l
        if (ch > 1) {
          val r: Int =
            (((payload(base + 3) & 0xff) << 8) | (payload(base + 2) & 0xff)).toShort.toInt
          val ra = math.abs(r)
          if (ra >= clipAbs) clipR += 1
          if (ra <= silenceAbs) silR += 1
          if (ra > peakR) peakR = ra
          enR += r.toLong * r
        }
        f += 1
      }
      AudioAudit(ch, lay.nFrames.toLong, clipL, clipR, silL, silR,
        peakL, peakR, enL, enR)
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

  /** Derive a REAL media table from `documents` (TESTDATA has no binary
    * column): every payload is an actually-encoded container — PNG stills
    * for doc_id % 3 == 0, WAV PCM clips for % 3 == 1, PNG filmstrips
    * ("video") for % 3 == 2 — with metadata derived from the same closed
    * forms the codecs use. Encoding runs executor-side per partition;
    * nothing is collected.
    */
  def fromDocuments(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id"), col("n_chars")).as[(Long, Long)]
      .mapPartitions(_.map { case (id, nc) =>
        (id % 3) match {
          case 0 =>
            val p = PngCodec.imageParams(id, nc)
            MediaRow(id, "image", PngCodec.encodeImage(id, nc), p.w, p.h, 0L)
          case 1 =>
            val p = WavCodec.audioParams(id, nc)
            MediaRow(id, "audio", WavCodec.encodeWav(id, nc), 0, 0,
              p.nFrames.toLong * 1000 / WavCodec.sampleRateHz)
          case _ =>
            val w = PngCodec.imageParams(id, nc).w
            val h = PngCodec.frameHeight(id) * PngCodec.filmFrames
            MediaRow(id, "video", PngCodec.encodeFilmstrip(id, nc), w, h, 0L)
        }
      }).toDF()
  }

  private def checksumOf(payload: Array[Byte]): Long = {
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
    h
  }

  val featureDim = 8

  /** Partition-batched feature extraction (mapPartitions ≈ mapInPandas)
    * with REAL decoders per modality: images/filmstrips go through the
    * PNG raster ([[PngCodec.decodeStats]]), audio through the WAV frame
    * reader ([[WavCodec.decodeStats]]); the features are fixed-width
    * per-modality summaries (dims + mean channel intensities / frame
    * count + mean sample amplitudes). Rows stream through one decoder
    * instantiation per partition and nothing is collected. Null payloads
    * yield zero-feature rows rather than poisoning the partition.
    */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "media_type", "payload").as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        val dim = featureDim
        it.map { case (id, mtype, payload) =>
          if (payload == null)
            MediaFeatures(id, mtype, 0, 0L, new Array[Float](dim))
          else {
            val f = new Array[Float](dim)
            mtype match {
              case "image" | "video" =>
                val st = PngCodec.decodeStats(payload)
                val n = st.width.toFloat * st.height
                f(0) = st.width.toFloat; f(1) = st.height.toFloat
                f(2) = st.sum_r / n; f(3) = st.sum_g / n; f(4) = st.sum_b / n
              case "audio" =>
                val st = WavCodec.decodeStats(payload)
                f(0) = st.channels.toFloat; f(1) = st.sampleRate.toFloat
                f(2) = st.frames.toFloat
                f(3) = st.sumLeft.toFloat / st.frames
                f(4) = st.sumRight.toFloat / st.frames
              case _ => ()
            }
            MediaFeatures(id, mtype, payload.length, checksumOf(payload), f)
          }
        }
      }
  }

  /** Frame sampling for `video` rows: decode the filmstrip container ONCE
    * per row, then emit one row per constant-color band — real raster
    * region decode, the explode-shaped operator a clip pipeline needs
    * (q29 runs exactly this).
    */
  def sampleFrames(media: DataFrame, nFrames: Int = PngCodec.filmFrames): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .filter(col("media_type") === "video" && col("payload").isNotNull)
      .select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, p) =>
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p))
          require(img != null, s"media $id: payload is not a decodable image")
          val hF = img.getHeight / nFrames
          (0 until nFrames).iterator.map { f =>
            val st = PngCodec.decodeRegion(img, f * hF, hF)
            (id, f, st.width, st.height, st.sum_r, st.sum_g, st.sum_b)
          }
        }
      }
      .toDF("media_id", "frame_idx", "width", "frame_height",
        "sum_r", "sum_g", "sum_b")
  }

  /** Real image resize (nearest neighbour, integer arithmetic — no AWT
    * interpolation, so output pixels are deterministic across JVMs):
    * decode, sample source pixel (x*sw/tw, y*sh/th) per target pixel,
    * re-encode PNG. Emits rewritten metadata + the new payload.
    */
  def resizeImages(media: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    require(targetW > 0 && targetH > 0, "target dims must be positive")
    val spark = media.sparkSession
    import spark.implicits._
    media
      .filter(col("media_type") === "image" && col("payload").isNotNull)
      .select(col("media_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) =>
        val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p))
        require(src != null, s"media $id: payload is not a decodable image")
        val out = new java.awt.image.BufferedImage(
          targetW, targetH, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < targetH) {
          val sy = y * src.getHeight / targetH
          var x = 0
          while (x < targetW) {
            out.setRGB(x, y, src.getRGB(x * src.getWidth / targetW, sy))
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        (id, targetW, targetH, bos.toByteArray)
      })
      .toDF("media_id", "width", "height", "payload")
  }
}
