package graft.multimodal

import graft.multimodal.Multimodal.PngCodec

import org.scalatest.funsuite.AnyFunSuite

/** The REAL JDK image codec behind q28/q29: encode must emit an actual PNG
  * container, and a full decode (IHDR parse + zlib inflate + filter
  * reconstruction + raster iteration) must land on the closed-form stats
  * the q28/q29 oracles re-derive in SQL.
  */
class PngCodecSpec extends AnyFunSuite {

  private def closedFormImage(docId: Long, nChars: Long): PngCodec.ImageStats = {
    val p = PngCodec.imageParams(docId, nChars)
    val half = p.w / 2
    PngCodec.ImageStats(p.w, p.h,
      (p.rA.toLong * half + p.rB.toLong * (p.w - half)) * p.h,
      (p.gA.toLong * half + p.gB.toLong * (p.w - half)) * p.h,
      (p.bA.toLong * half + p.bB.toLong * (p.w - half)) * p.h)
  }

  test("encoded payloads are genuine PNG containers (magic bytes)") {
    val png = PngCodec.encodeImage(42L, 1234L)
    assert(png.take(8).toSeq ===
      Seq(0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n').map(_.toByte))
  }

  test("decodeStats(encodeImage) matches the closed form across parameter space") {
    // ids/sizes chosen to cross every mod boundary the params use
    for (docId <- Seq(0L, 1L, 47L, 48L, 255L, 256L, 499L, 100003L);
         nChars <- Seq(0L, 1L, 63L, 64L, 255L, 256L, 5000L)) {
      val got = PngCodec.decodeStats(PngCodec.encodeImage(docId, nChars))
      assert(got === closedFormImage(docId, nChars), s"doc=$docId nChars=$nChars")
    }
  }

  test("filmstrip bands decode to per-frame closed-form stats") {
    for (docId <- Seq(2L, 23L, 24L, 254L); nChars <- Seq(17L, 300L)) {
      val p = PngCodec.imageParams(docId, nChars)
      val hF = PngCodec.frameHeight(docId)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(PngCodec.encodeFilmstrip(docId, nChars)))
      assert(img.getWidth === p.w)
      assert(img.getHeight === hF * PngCodec.filmFrames)
      for (f <- 0 until PngCodec.filmFrames) {
        val st = PngCodec.decodeRegion(img, f * hF, hF)
        val (r, g, b) = PngCodec.frameColor(docId, nChars, f)
        assert(st.width === p.w && st.height === hF)
        assert(st.sum_r === r.toLong * p.w * hF, s"doc=$docId f=$f r")
        assert(st.sum_g === g.toLong * p.w * hF, s"doc=$docId f=$f g")
        assert(st.sum_b === b.toLong * p.w * hF, s"doc=$docId f=$f b")
      }
    }
  }

  test("decode rejects non-image bytes instead of returning garbage") {
    intercept[IllegalArgumentException] {
      PngCodec.decodeStats("not a png at all".getBytes)
    }
  }
}
