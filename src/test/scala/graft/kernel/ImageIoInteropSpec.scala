package graft.kernel

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.awt.image.BufferedImage
import javax.imageio.ImageIO
import org.scalatest.funsuite.AnyFunSuite

/** Cross-validation of kernel/Image and kernel/Jpeg against a fully
  * INDEPENDENT implementation: the JDK's javax.imageio (java.desktop,
  * headless-safe for file codecs). Our hand-rolled parsers/encoders must
  * interoperate with a codec stack we did not write:
  *
  *  - PNG and BMP are lossless: byte-exact equality both directions.
  *  - JPEG decoding is not bit-specified (T.81 Annex A allows IDCT
  *    variation), so same-bytes comparisons between two decoders get a
  *    small per-sample tolerance; encode→foreign-decode round trips get
  *    the quality-75 bounded-error budget JpegSpec already uses.
  */
class ImageIoInteropSpec extends AnyFunSuite {

  // Deterministic content with smooth structure plus edges — exercises DC
  // and AC paths without being pathological for a quality-75 codec.
  private def grayPattern(w: Int, h: Int): Array[Byte] =
    Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      (((x * 13 + y * 31) / 3 + (if ((x / 8 + y / 8) % 2 == 0) 40 else 0)) % 256).toByte
    }

  private def rgbPattern(w: Int, h: Int): Array[Byte] =
    Array.tabulate(w * h * 3) { i =>
      val p = i / 3; val c = i % 3
      val x = p % w; val y = p / w
      ((x * (c + 2) * 5 + y * (3 - c) * 7) % 256).toByte
    }

  private def readImageIO(bytes: Array[Byte]): BufferedImage = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    assert(img != null, "ImageIO returned null (no codec matched)")
    img
  }

  /** Raster samples (band-major per pixel), bypassing color-space games
    * that getRGB plays on TYPE_BYTE_GRAY.
    */
  private def samples(img: BufferedImage, bands: Int): Array[Int] = {
    val r = img.getRaster
    val out = new Array[Int](img.getWidth * img.getHeight * bands)
    var i = 0
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth; b <- 0 until bands) {
      out(i) = r.getSample(x, y, b); i += 1
    }
    out
  }

  private def maxAbsDiff(a: Array[Int], b: Array[Int]): Int =
    a.zip(b).map { case (x, y) => math.abs(x - y) }.max

  // ------------------------------------------------------------- lossless

  test("ImageIO decodes our PNG byte-exactly (gray and RGB)") {
    val (w, h) = (23, 17)
    val g = grayPattern(w, h)
    val ig = readImageIO(Image.encodePng(w, h, 1, g))
    assert((ig.getWidth, ig.getHeight) == (w, h))
    assert(samples(ig, 1).sameElements(g.map(_ & 0xff)), "gray PNG mismatch")

    val c = rgbPattern(w, h)
    val ic = readImageIO(Image.encodePng(w, h, 3, c))
    assert(samples(ic, 3).sameElements(c.map(_ & 0xff)), "RGB PNG mismatch")
  }

  test("ImageIO decodes our BMP byte-exactly") {
    val (w, h) = (21, 9) // odd width: exercises row padding
    val c = rgbPattern(w, h)
    val i = readImageIO(Image.encodeBmp24(w, h, c))
    assert((i.getWidth, i.getHeight) == (w, h))
    assert(samples(i, 3).sameElements(c.map(_ & 0xff)), "BMP mismatch")
  }

  test("our decoder reads ImageIO-encoded PNG byte-exactly") {
    val (w, h) = (19, 13)
    val c = rgbPattern(w, h)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w; b <- 0 until 3)
      img.getRaster.setSample(x, y, b, c((y * w + x) * 3 + b) & 0xff)
    val baos = new ByteArrayOutputStream()
    assert(ImageIO.write(img, "png", baos))
    val px = Image.decode(baos.toByteArray)
    assert((px.format, px.width, px.height, px.channels) == ("png", w, h, 3))
    assert(px.data.sameElements(c), "foreign PNG decode mismatch")
  }

  // ---------------------------------------------------------------- JPEG

  test("ImageIO and our decoder agree on our JPEG within IDCT tolerance") {
    val (w, h) = (40, 24)
    val g = grayPattern(w, h)
    val fileG = Jpeg.encode(w, h, 1, g)
    val ours = Image.decode(fileG)
    val theirs = readImageIO(fileG)
    assert((theirs.getWidth, theirs.getHeight) == (w, h))
    val dG = maxAbsDiff(samples(theirs, 1), ours.data.map(_ & 0xff))
    assert(dG <= 2, s"gray: two decoders diverge by $dG on identical bytes")

    val c = rgbPattern(w, h)
    val fileC = Jpeg.encode(w, h, 3, c)
    val oursC = Image.decode(fileC)
    val theirsC = readImageIO(fileC)
    assert(theirsC.getRaster.getNumBands == 3)
    val dC = maxAbsDiff(samples(theirsC, 3), oursC.data.map(_ & 0xff))
    assert(dC <= 3, s"color: two decoders diverge by $dC on identical bytes")
  }

  test("our decoder reads ImageIO-encoded JPEG (gray and 4:2:0 color)") {
    val (w, h) = (32, 32)
    val g = grayPattern(w, h)
    val imgG = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      imgG.getRaster.setSample(x, y, 0, g(y * w + x) & 0xff)
    val bg = new ByteArrayOutputStream()
    assert(ImageIO.write(imgG, "jpg", bg))
    val pg = Image.decode(bg.toByteArray)
    assert((pg.format, pg.width, pg.height, pg.channels) == ("jpeg", w, h, 1))
    // foreign encoder (its own tables/quality) → our decoder vs its own decoder
    val dG = maxAbsDiff(samples(readImageIO(bg.toByteArray), 1), pg.data.map(_ & 0xff))
    assert(dG <= 2, s"gray: our decode of a foreign file diverges by $dG")

    // TYPE_3BYTE_BGR makes the JDK writer emit subsampled YCbCr — the
    // sampling-factor-2 paths get exercised by bytes we did not author.
    val c = rgbPattern(w, h)
    val imgC = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w; b <- 0 until 3)
      imgC.getRaster.setSample(x, y, b, c((y * w + x) * 3 + b) & 0xff)
    val bc = new ByteArrayOutputStream()
    assert(ImageIO.write(imgC, "jpg", bc))
    val pc = Image.decode(bc.toByteArray)
    assert((pc.format, pc.width, pc.height, pc.channels) == ("jpeg", w, h, 3))
    val dC = maxAbsDiff(samples(readImageIO(bc.toByteArray), 3), pc.data.map(_ & 0xff))
    assert(dC <= 3, s"color: our decode of a foreign file diverges by $dC")
  }
}
