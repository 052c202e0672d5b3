package graft.kernel

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.GenData

/** Baseline-JPEG codec gates: golden hand-authored files (the decoder must
  * read layouts our encoder never produces — custom Huffman tables, 4:2:0
  * subsampling, restart markers), exact flat-field round-trips (DC-only
  * blocks reconstruct losslessly), bounded-error round-trips on smooth and
  * noisy content, byte-stuffing on the wire, determinism, and explicit
  * rejection of progressive/arithmetic modes.
  */
class JpegSpec extends AnyFunSuite {

  // ---- golden-file helpers: build real marker segments by hand ----------

  private def seg(m: Int, body: Array[Byte]): Array[Byte] =
    Array(0xff.toByte, m.toByte, ((body.length + 2) >> 8).toByte, ((body.length + 2) & 0xff).toByte) ++ body

  /** DQT id 0, all quantizers = 1 (identity). */
  private val flatDqt = seg(0xdb, 0.toByte +: Array.fill(64)(1.toByte))

  /** Minimal Huffman table: one code of length 2 ("00") mapping to `value`.
    * Using len 2 (not 1) also exercises the canonical-code walk.
    */
  private def miniDht(clazz: Int, id: Int, value: Int): Array[Byte] = {
    val bits = Array.fill[Byte](16)(0); bits(1) = 1 // one code of length 2
    seg(0xc4, ((clazz << 4) | id).toByte +: (bits :+ value.toByte))
  }

  private def sof0(w: Int, h: Int, comps: Seq[(Int, Int, Int, Int)]): Array[Byte] = {
    // comps: (id, hSamp, vSamp, quantTable)
    val b = Array[Byte](8, (h >> 8).toByte, (h & 0xff).toByte, (w >> 8).toByte, (w & 0xff).toByte,
      comps.length.toByte) ++
      comps.flatMap { case (id, hs, vs, tq) =>
        Array(id.toByte, ((hs << 4) | vs).toByte, tq.toByte)
      }
    seg(0xc0, b)
  }

  private def sos(comps: Seq[(Int, Int, Int)]): Array[Byte] = {
    // comps: (id, dcTable, acTable)
    val b = Array[Byte](comps.length.toByte) ++
      comps.flatMap { case (id, dc, ac) => Array(id.toByte, ((dc << 4) | ac).toByte) } ++
      Array[Byte](0, 63, 0)
    seg(0xda, b)
  }

  private val Soi = Array(0xff.toByte, 0xd8.toByte)
  private val Eoi = Array(0xff.toByte, 0xd9.toByte)

  test("golden gray 8x8: hand-authored file with custom tables decodes to flat 128") {
    // DC diff cat 0 (code 00) + AC EOB (code 00) = 4 bits, padded with 1s -> 0x0F
    val file = Soi ++ flatDqt ++ miniDht(0, 0, 0) ++ miniDht(1, 0, 0) ++
      sof0(8, 8, Seq((1, 1, 1, 0))) ++ sos(Seq((1, 0, 0))) ++ Array(0x0f.toByte) ++ Eoi
    val px = Image.decode(file)
    assert((px.format, px.width, px.height, px.channels) == ("jpeg", 8, 8, 1))
    assert(px.data.forall(b => (b & 0xff) == 128), s"got ${px.data.take(8).map(_ & 0xff).toSeq}")
  }

  test("golden 4:2:0 color 16x16: subsampled planes upsample to flat gray RGB") {
    // Y is 2x2-sampled (4 blocks/MCU), Cb/Cr 1x1. All blocks DC diff 0 + EOB:
    // 6 blocks x 4 bits = 24 bits = 3 zero bytes, no padding needed.
    val file = Soi ++ flatDqt ++ miniDht(0, 0, 0) ++ miniDht(1, 0, 0) ++
      sof0(16, 16, Seq((1, 2, 2, 0), (2, 1, 1, 0), (3, 1, 1, 0))) ++
      sos(Seq((1, 0, 0), (2, 0, 0), (3, 0, 0))) ++ Array[Byte](0, 0, 0) ++ Eoi
    val px = Image.decode(file)
    assert((px.format, px.width, px.height, px.channels) == ("jpeg", 16, 16, 3))
    // Y=128, Cb=Cr=128 -> R=G=B=128 exactly under BT.601
    assert(px.data.forall(b => (b & 0xff) == 128))
  }

  test("golden restart markers: DRI=1 resets DC prediction and bit alignment") {
    // 8x24 gray = 3 MCUs. DC cat 0 + EOB per MCU = 4 bits padded -> 0x0F,
    // with RSTn between MCUs. A decoder that fails to align/reset would
    // misparse MCU 2 and 3.
    val dri = seg(0xdd, Array[Byte](0, 1))
    val entropy = Array[Byte](0x0f, 0xff.toByte, 0xd0.toByte, 0x0f, 0xff.toByte, 0xd1.toByte, 0x0f)
    val file = Soi ++ flatDqt ++ dri ++ miniDht(0, 0, 0) ++ miniDht(1, 0, 0) ++
      sof0(24, 8, Seq((1, 1, 1, 0))) ++ sos(Seq((1, 0, 0))) ++ entropy ++ Eoi
    val px = Image.decode(file)
    assert((px.width, px.height) == (24, 8))
    assert(px.data.forall(b => (b & 0xff) == 128))
  }

  test("flat fields round-trip EXACTLY (DC-only blocks are lossless)") {
    for (v <- Seq(0, 31, 128, 200, 255); (w, h) <- Seq((8, 8), (20, 12), (64, 64))) {
      val gray = Array.fill(w * h)(v.toByte)
      val g = Jpeg.decode(Jpeg.encode(w, h, 1, gray))
      assert((g.width, g.height, g.channels) == (w, h, 1), s"gray $v $w x $h")
      assert(g.data.forall(b => (b & 0xff) == v), s"gray $v $w x $h: not exact")
      // r=g=b constants survive the YCbCr transform exactly too
      val rgb = Array.fill(w * h * 3)(v.toByte)
      val c = Jpeg.decode(Jpeg.encode(w, h, 3, rgb))
      assert(c.channels == 3 && c.data.forall(b => (b & 0xff) == v), s"rgb $v $w x $h: not exact")
    }
  }

  test("smooth gradient round-trips within quality-75 error bounds") {
    val w = 48; val h = 40
    val gray = Array.tabulate(w * h) { i => ((i % w) * 2 + (i / w)).toByte }
    val got = Jpeg.decode(Jpeg.encode(w, h, 1, gray)).data
    val errs = gray.indices.map(i => math.abs((gray(i) & 0xff) - (got(i) & 0xff)))
    assert(errs.max <= 25, s"max err ${errs.max}")
    assert(errs.sum.toDouble / errs.length <= 3.0, s"mean err ${errs.sum.toDouble / errs.length}")
  }

  test("noise survives structurally; 0xFF byte stuffing appears on the wire and parses") {
    val rng = new scala.util.Random(11L)
    val w = 40; val h = 24
    val rgb = Array.fill(w * h * 3)(rng.nextInt(256).toByte)
    val bytes = Jpeg.encode(w, h, 3, rgb)
    // dense noise reliably emits stuffed 0xFF 0x00 pairs inside the scan
    val scanStart = {
      var i = 2
      while (!((bytes(i) & 0xff) == 0xff && (bytes(i + 1) & 0xff) == 0xda)) i += 1
      i
    }
    val stuffed = (scanStart until bytes.length - 1).exists(i =>
      (bytes(i) & 0xff) == 0xff && (bytes(i + 1) & 0xff) == 0x00)
    assert(stuffed, "expected at least one stuffed 0xFF00 in the entropy stream")
    val px = Jpeg.decode(bytes)
    assert((px.width, px.height, px.channels) == (w, h, 3))
  }

  test("encode and decode are deterministic byte-for-byte") {
    val rng = new scala.util.Random(5L)
    val gray = Array.fill(33 * 17)(rng.nextInt(256).toByte)
    val b1 = Jpeg.encode(33, 17, 1, gray)
    val b2 = Jpeg.encode(33, 17, 1, gray)
    assert(b1.sameElements(b2))
    assert(Jpeg.decode(b1).data.sameElements(Jpeg.decode(b2).data))
  }

  test("progressive and arithmetic files are rejected, truncated files throw") {
    val prog = Soi ++ flatDqt ++ seg(0xc2, sof0(8, 8, Seq((1, 1, 1, 0))).drop(4))
    val e1 = intercept[IllegalArgumentException](Jpeg.decode(prog))
    assert(e1.getMessage.contains("progressive"))
    val arith = Soi ++ seg(0xc9, sof0(8, 8, Seq((1, 1, 1, 0))).drop(4))
    assert(intercept[IllegalArgumentException](Jpeg.decode(arith)).getMessage.contains("arithmetic"))
    intercept[IllegalArgumentException](Jpeg.decode(Soi ++ flatDqt)) // no SOS
    intercept[IllegalArgumentException](Jpeg.decode(Array[Byte](1, 2, 3, 4)))
  }

  test("GenData imagePayload mix now covers jpeg; every payload decodes via magic dispatch") {
    val formats = (0 until 64).map { i =>
      val px = Image.decode(GenData.imagePayload(42L, s"med_jpegmix_$i"))
      assert(px.data.length == px.width * px.height * px.channels)
      px.format
    }.toSet
    assert(formats == Set("bmp", "pgm", "ppm", "png", "jpeg"), s"got $formats")
  }
}
