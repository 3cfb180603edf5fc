package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Multimodal.fromDocuments(
    graft.Tables.documents(spark, sf("sf0.001"))).persist()

  test("fromDocuments produces the declared media schema, deterministically") {
    assert(media.schema.map(f => (f.name, f.dataType)) ===
      Multimodal.mediaSchema.map(f => (f.name, f.dataType)))
    val a = media.orderBy("media_id").limit(5).collect()
    val b = Multimodal.fromDocuments(graft.Tables.documents(spark, sf("sf0.001")))
      .orderBy("media_id").limit(5).collect()
    assert(a.map(_.getLong(0)).toSeq === b.map(_.getLong(0)).toSeq)
    assert(a.map(_.getAs[Array[Byte]]("payload").toSeq).toSeq ===
      b.map(_.getAs[Array[Byte]]("payload").toSeq).toSeq)
    assert(media.select("media_type").distinct().count() === 3)
  }

  test("every payload is a real decodable container of its modality") {
    val rows = media.orderBy("media_id").limit(9)
      .select("media_id", "media_type", "payload").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getAs[Array[Byte]](2)))
    assert(rows.map(_._2).toSet === Set("image", "audio", "video"))
    rows.foreach {
      case (_, "audio", p) =>
        val st = Multimodal.WavCodec.decodeStats(p)
        assert(st.channels === 2 && st.sampleRate === 8000)
        assert(st.frames > 0)
      case (id, _, p) =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p))
        assert(img != null, s"media $id payload is not a decodable PNG")
    }
  }

  test("WavCodec round-trip: decoded stats equal the closed-form ramp") {
    for ((id, nc) <- Seq((1L, 37L), (4L, 999L), (7L, 0L))) {
      val p = Multimodal.WavCodec.audioParams(id, nc)
      val st = Multimodal.WavCodec.decodeStats(
        Multimodal.WavCodec.encodeWav(id, nc))
      assert(st.channels === 2 && st.sampleRate === 8000)
      assert(st.frames === p.nFrames.toLong)
      def ramp(a: Long, b: Long): Long =
        (0 until p.nFrames).map(i => ((a + i.toLong * b) % 65536) - 32768).sum
      assert(st.sumLeft === ramp(p.a0, p.b0))
      assert(st.sumRight === ramp(p.a1, p.b1))
    }
  }

  test("WavCodec.decodeAudit: clip/silence/peak/energy equal the closed form") {
    for ((id, nc) <- Seq((1L, 37L), (4L, 999L), (7L, 0L), (10L, 123L))) {
      val p = Multimodal.WavCodec.audioParams(id, nc)
      val a = Multimodal.WavCodec.decodeAudit(
        Multimodal.WavCodec.encodeWav(id, nc))
      def samples(x: Long, b: Long): Seq[Int] =
        (0 until p.nFrames).map(i => (((x + i.toLong * b) % 65536) - 32768).toInt)
      val (ls, rs) = (samples(p.a0, p.b0), samples(p.a1, p.b1))
      assert(a.channels === 2 && a.frames === p.nFrames.toLong)
      assert(a.clipLeft === ls.count(s => math.abs(s) >= 32766))
      assert(a.clipRight === rs.count(s => math.abs(s) >= 32766))
      assert(a.silenceLeft === ls.count(s => math.abs(s) <= 512))
      assert(a.silenceRight === rs.count(s => math.abs(s) <= 512))
      assert(a.peakLeft === ls.map(math.abs).max)
      assert(a.peakRight === rs.map(math.abs).max)
      assert(a.energyLeft === ls.map(s => s.toLong * s).sum)
      assert(a.energyRight === rs.map(s => s.toLong * s).sum)
    }
  }

  test("decodeAudit flags a clipped and a silent clip correctly") {
    // hand-build WAVs through the same JDK encoder: one rail-pinned clip,
    // one all-silence clip — the audit must separate them cleanly
    def wavOf(samples: Seq[Int]): Array[Byte] = {
      val raw = new Array[Byte](samples.length * 2)
      samples.zipWithIndex.foreach { case (s, i) =>
        raw(2 * i) = (s & 0xff).toByte
        raw(2 * i + 1) = ((s >> 8) & 0xff).toByte
      }
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(raw), fmt, samples.length.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val clipped = Multimodal.WavCodec.decodeAudit(
      wavOf(Seq(32767, -32768, 32766, -32766, 100, -32765)))
    assert(clipped.channels === 1 && clipped.clipLeft === 4L)
    assert(clipped.peakLeft === 32768 && clipped.silenceLeft === 1L)
    val silent = Multimodal.WavCodec.decodeAudit(wavOf(Seq.fill(50)(3)))
    assert(silent.silenceLeft === 50L && silent.clipLeft === 0L)
    assert(silent.peakLeft === 3 && silent.energyLeft === 450L)
  }

  test("extractFeatures: real per-modality decode, checksums match payloads") {
    val feats = Multimodal.extractFeatures(media)
    assert(feats.count() === media.count())
    val byId = feats.filter($"media_id" < 6).collect()
      .map(f => f.media_id -> f).toMap
    val src = media.filter($"media_id" < 6)
      .select("media_id", "media_type", "payload").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getAs[Array[Byte]](2)))
    src.foreach { case (id, mtype, payload) =>
      val f = byId(id)
      assert(f.n_bytes === payload.length)
      mtype match {
        case "image" | "video" =>
          val st = Multimodal.PngCodec.decodeStats(payload)
          assert(f.features(0) === st.width.toFloat)
          assert(f.features(1) === st.height.toFloat)
        case "audio" =>
          val st = Multimodal.WavCodec.decodeStats(payload)
          assert(f.features(2) === st.frames.toFloat)
      }
    }
  }

  test("extractFeatures is null-payload safe") {
    val withNull = media.limit(2)
      .withColumn("payload", when($"media_id" === 0, lit(null)).otherwise($"payload"))
    val feats = Multimodal.extractFeatures(withNull).collect()
    val z = feats.find(_.media_id == 0).get
    assert(z.n_bytes === 0 && z.checksum === 0L)
    assert(z.features.forall(_ == 0.0f))
  }

  test("sampleFrames: real raster bands reassemble the whole-image sums") {
    val vids = media.filter($"media_type" === "video")
    val frames = Multimodal.sampleFrames(media)
    val nF = Multimodal.PngCodec.filmFrames
    assert(frames.count() === vids.count() * nF)
    // per-frame channel sums must add up to the full filmstrip's decode
    val ids = vids.orderBy("media_id").limit(2).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("payload")).toMap
    ids.foreach { case (id, payload) =>
      val whole = Multimodal.PngCodec.decodeStats(payload)
      val parts = frames.filter($"media_id" === id)
        .select("sum_r", "sum_g", "sum_b").collect()
      assert(parts.map(_.getLong(0)).sum === whole.sum_r)
      assert(parts.map(_.getLong(1)).sum === whole.sum_g)
      assert(parts.map(_.getLong(2)).sum === whole.sum_b)
    }
  }

  test("resizeImages re-encodes real pixels at the target dims") {
    val imgs = Multimodal.resizeImages(media, 32, 24)
    assert(imgs.count() === media.filter($"media_type" === "image").count())
    val origs = media.filter($"media_type" === "image").orderBy("media_id")
      .limit(3).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("payload")).toMap
    val r = imgs.orderBy("media_id").limit(3).collect()
    r.foreach { row =>
      assert(row.getInt(1) === 32 && row.getInt(2) === 24)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(row.getAs[Array[Byte]]("payload")))
      assert(img.getWidth === 32 && img.getHeight === 24)
      // nearest-neighbour identity: target corners sample source corners
      // (x=0 -> src 0; x=31 -> src floor(31*sw/32), in the right half for
      // every source width), so the two-tone split survives the resize
      val orig = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(origs(row.getLong(0))))
      assert(img.getRGB(0, 0) === orig.getRGB(0, 0))
      assert(img.getRGB(31, 0) === orig.getRGB(orig.getWidth - 1, 0))
    }
  }
}
