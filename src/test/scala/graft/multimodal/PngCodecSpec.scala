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

  /** The q138 oracle's closed form: rows are constant, so the hash is the
    * column byte (bit_j = rowsum_j*W > rowTotal*width_j, cell column j
    * covering x in [ceil(jW/8), ceil((j+1)W/8))) replicated into all 8
    * grid rows.
    */
  private def closedFormAHash(docId: Long, nChars: Long): Long = {
    val p = PngCodec.imageParams(docId, nChars)
    val (w, half) = (p.w.toLong, (p.w / 2).toLong)
    val la = p.rA.toLong + p.gA + p.bA
    val lb = p.rB.toLong + p.gB + p.bB
    val rowTotal = half * la + (w - half) * lb
    var byte = 0L
    for (j <- 0L until 8L) {
      val (xlo, xhi) = ((j * w + 7) / 8, ((j + 1) * w + 7) / 8)
      val l = math.max(0L, math.min(half, xhi) - xlo)
      val rowsum = l * la + (xhi - xlo - l) * lb
      if (rowsum * w > rowTotal * (xhi - xlo)) byte |= 1L << j
    }
    (0 until 8).foldLeft(0L)((acc, i) => acc | (byte << (8 * i)))
  }

  test("aHash64 of decoded pixels matches the closed form across parameter space") {
    for (docId <- Seq(0L, 3L, 47L, 48L, 255L, 256L, 301L, 499L);
         nChars <- Seq(16L, 63L, 64L, 100L, 255L, 256L, 1000L, 4095L)) {
      assert(PngCodec.aHash64(PngCodec.encodeImage(docId, nChars))
        === closedFormAHash(docId, nChars), s"doc=$docId n=$nChars")
    }
  }

  test("aHash64 is perceptual: a uniform image hashes to 0, band order flips the bits") {
    def solid(rgb: Int, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    // no cell strictly exceeds the global mean on a constant raster
    assert(PngCodec.aHash64(solid(0x123456, 33, 17)) === 0L)
    def bands(l: Int, r: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        64, 64, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 64; x <- 0 until 64)
        img.setRGB(x, y, if (x < 32) l else r)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val brightLeft = PngCodec.aHash64(bands(0xFFFFFF, 0x000000))
    val brightRight = PngCodec.aHash64(bands(0x000000, 0xFFFFFF))
    // exact complements: every cell is strictly above or below the mean
    assert((brightLeft ^ brightRight) === -1L)
    // dimension-independent: same structure at another size, same hash
    def bandsAt(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, if (x < w / 2) 0xFFFFFF else 0x000000)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    assert(PngCodec.aHash64(bandsAt(128, 48)) === brightLeft)
  }
}
