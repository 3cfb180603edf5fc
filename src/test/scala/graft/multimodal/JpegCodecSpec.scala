package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import Multimodal.{JpegCodec, PngCodec}

/** The lossy-format oracle trick must actually hold on this JDK: gray
  * 8-aligned two-tone blocks at quality 1.0 round-trip EXACTLY (DC-only
  * spectra under all-ones quant tables, flat 128 chroma under
  * subsampling). Checked by construction arithmetic AND by
  * bit-invariance against the lossless PNG path on the same grid.
  */
class JpegCodecSpec extends AnyFunSuite {

  test("flat-block gray JPEG decodes to the exact constructed pixel grid") {
    for (docId <- Seq(0L, 7L, 123L, 9999L); nChars <- Seq(0L, 57L, 301L)) {
      val p = JpegCodec.imageParams(docId, nChars)
      val st = JpegCodec.decodeStats(JpegCodec.encodeJpeg(docId, nChars))
      assert(st.width === p.w && st.height === p.h)
      val expected = (p.vA.toLong * (p.w / 2) + p.vB.toLong * (p.w / 2)) * p.h
      assert(st.sum_r === expected, s"sum_r off for ($docId, $nChars): $st vs $expected")
      assert(st.sum_g === expected && st.sum_b === expected,
        s"gray payload must decode gray: $st")
    }
  }

  test("JPEG and PNG decode paths agree bit-for-bit on the same grid") {
    val (docId, nChars) = (41L, 77L)
    val p = JpegCodec.imageParams(docId, nChars)
    // push the SAME gray two-tone grid through the lossless PNG writer
    val img = new java.awt.image.BufferedImage(
      p.w, p.h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val a = (p.vA << 16) | (p.vA << 8) | p.vA
    val b = (p.vB << 16) | (p.vB << 8) | p.vB
    for (y <- 0 until p.h; x <- 0 until p.w)
      img.setRGB(x, y, if (x < p.w / 2) a else b)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val viaPng = PngCodec.decodeStats(bos.toByteArray)
    val viaJpeg = JpegCodec.decodeStats(JpegCodec.encodeJpeg(docId, nChars))
    assert(viaJpeg === viaPng)
    // perceptual hash agrees too (same coarse layout, same exact pixels)
    val pngImg = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bos.toByteArray))
    assert(PngCodec.aHash64(bos.toByteArray) ===
      PngCodec.aHash64(JpegCodec.encodeJpeg(docId, nChars)))
    assert(pngImg.getWidth === p.w)
  }

  test("a NON-aligned or non-gray grid would NOT round-trip (the trick is load-bearing)") {
    // sanity check that the construction constraints matter: a colored
    // two-tone at default quality drifts — proving the gate actually
    // exercises lossy-path decode, not an accidentally-lossless encoder
    val img = new java.awt.image.BufferedImage(
      30, 20, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 20; x <- 0 until 30)
      img.setRGB(x, y, if (x < 15) 0xc81732 else 0x2e9b47) // 15 not 8-aligned
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val st = PngCodec.decodeRegion(
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bos.toByteArray)),
      0, 20)
    val exactR = (0xc8L * 15 + 0x2eL * 15) * 20
    assert(st.sum_r !== exactR,
      "expected default-quality colored JPEG to drift; the flat-block construction is what pins the grid")
  }
}
