package graft.dedup

import graft.{Planted, SparkSpec}
import graft.multimodal.Multimodal.PngCodec
import org.apache.spark.sql.functions._

/** The image store: planted verdicts by aHash construction, the aHash
  * family geometry the blocking relies on, and the purge/append
  * lifecycle running through the SHARED text-store machinery.
  */
class ImageDedupStoreSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft_img_store_spec_").toString

  test("two-tone aHash families behave as constructed") {
    val vDarkLeft = PngCodec.aHash64(PngCodec.encodeSplitGray(32, 24, 10, 200, vertical = true))
    val vDarkLeft2 = PngCodec.aHash64(PngCodec.encodeSplitGray(36, 40, 12, 198, vertical = true))
    val vDarkRight = PngCodec.aHash64(PngCodec.encodeSplitGray(32, 24, 200, 10, vertical = true))
    val hDarkTop = PngCodec.aHash64(PngCodec.encodeSplitGray(40, 32, 20, 210, vertical = false))
    val hDarkBottom = PngCodec.aHash64(PngCodec.encodeSplitGray(40, 32, 210, 20, vertical = false))
    assert(vDarkLeft === vDarkLeft2, "same orientation+order must share the hash")
    assert(java.lang.Long.bitCount(vDarkLeft ^ vDarkRight) === 64)
    assert(java.lang.Long.bitCount(vDarkLeft ^ hDarkTop) === 32)
    assert(java.lang.Long.bitCount(hDarkTop ^ hDarkBottom) === 64)
    // vertical and horizontal families share no 16-bit blocking chunk
    (0 until 4).foreach { c =>
      assert(((vDarkLeft >>> (c * 16)) & 0xffffL) !== ((hDarkTop >>> (c * 16)) & 0xffffL))
    }
  }

  test("ingest verdicts match the planted construction") {
    val dir = freshDir()
    ImageDedupStore.write(Planted.imageStoreMedia(spark), dir)
    val verdicts = ImageDedupStore
      .ingest(ImageDedupStore.load(spark, dir), Planted.imageBatchMedia(spark))
      .select($"media_id", $"verdict").as[(Long, String)].collect().toMap
    val B = Planted.imgBase
    assert(verdicts(B + 100) === "dup_vs_store")
    assert(verdicts(B + 101) === "new")
    assert(verdicts(B + 102) === "dup_in_batch")
    assert(verdicts(B + 103) === "near_dup_vs_store")
    assert(verdicts(B + 104) === "new")
  }

  test("purge through the shared machinery: erased image re-ingests as new") {
    val dir = freshDir()
    ImageDedupStore.write(Planted.imageStoreMedia(spark), dir)
    val B = Planted.imgBase
    ImageDedupStore.purge(Seq(B + 0L, B + 1L).toDF("media_id"), dir)
    val verdicts = ImageDedupStore
      .ingest(ImageDedupStore.load(spark, dir), Planted.imageBatchMedia(spark))
      .select($"media_id", $"verdict").as[(Long, String)].collect().toMap
    // the exact copy of the purged image and the near-variant of its
    // (fully purged) aHash family both come back genuinely new
    assert(verdicts(B + 100) === "new")
    assert(verdicts(B + 103) === "new")
    // compact folds the tombstones; verdicts unchanged after
    ImageDedupStore.compact(spark, dir)
    val after = ImageDedupStore
      .ingest(ImageDedupStore.load(spark, dir), Planted.imageBatchMedia(spark))
      .select($"media_id", $"verdict").as[(Long, String)].collect().toMap
    assert(after === verdicts)
    // append the accepted canonicals; an identical second batch is
    // then fully suppressed (exact or near) against the grown store
    val accepted = Planted.imageBatchMedia(spark)
      .filter($"media_id".isin(B + 100, B + 101, B + 104))
    ImageDedupStore.append(accepted, dir)
    val regrown = ImageDedupStore
      .ingest(ImageDedupStore.load(spark, dir), Planted.imageBatchMedia(spark))
      .select($"media_id", $"verdict").as[(Long, String)].collect().toMap
    assert(!regrown.values.exists(_ == "new"), s"second pass must suppress all: $regrown")
  }
}
