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

  test("extractFeatures: one feature row per media row, checksums match a local recompute") {
    val feats = Multimodal.extractFeatures(media)
    assert(feats.count() === media.count())
    val sample = media.orderBy("media_id").limit(3)
      .select("media_id", "payload").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    val got = feats.filter($"media_id" < 3).collect()
      .map(f => f.media_id -> f).toMap
    sample.foreach { case (id, payload) =>
      assert(got(id).checksum === Multimodal.StubDecoder.checksum(payload))
      assert(got(id).n_bytes === payload.length)
      assert(got(id).features.toSeq ===
        Multimodal.StubDecoder.decodeAndExtract(payload).toSeq)
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

  test("sampleFrames: nFrames rows per video, byte ranges tile the payload") {
    val vids = media.filter($"media_type" === "video")
    val frames = Multimodal.sampleFrames(media, nFrames = 4)
    assert(frames.count() === vids.count() * 4)
    // frame bytes concatenated == original payload, per video
    val orig = vids.orderBy("media_id").limit(2).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("payload")).toMap
    orig.keys.foreach { id =>
      val glued = frames.filter($"media_id" === id).orderBy("frame_idx")
        .collect().flatMap(_.getAs[Array[Byte]]("frame_bytes"))
      assert(glued.toSeq === orig(id).toSeq, s"frames of media $id don't tile payload")
    }
  }

  test("resizeImages rewrites metadata and shrinks payloads") {
    val imgs = Multimodal.resizeImages(media, 32, 32)
    assert(imgs.count() === media.filter($"media_type" === "image").count())
    val r = imgs.limit(5).collect()
    assert(r.forall(_.getInt(1) === 32))
    assert(r.forall(row => row.getAs[Array[Byte]]("payload").length >= 1))
  }
}
