package graft.kernel

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.GenData

/** Pure-JVM raster codec gates: golden hand-authored bytes (the parser must
  * read REAL file layouts, not just its own encoder's output), exact
  * round-trips including BMP row padding, the GRAY→RGB→luma identity, and
  * decode→detect parity with the tensor-payload path.
  */
class ImageSpec extends AnyFunSuite {

  test("golden BMP: hand-authored 2x2 24-bit file decodes to top-down RGB") {
    // 2x2, rowStride = 8 (2 pad bytes/row), bottom-up: file row 0 is IMAGE
    // row 1. Image rows (top-down RGB): [(255,0,0) (0,255,0)] / [(0,0,255) (255,255,255)]
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    val header =
      Array[Byte]('B', 'M') ++ le32(54 + 16) ++ le32(0) ++ le32(54) ++
        le32(40) ++ le32(2) ++ le32(2) ++ le16(1) ++ le16(24) ++
        le32(0) ++ le32(16) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    // pixel array in file order: BGR + padding; bottom row first
    val data = Array[Byte](
      // image row 1: blue=(0,0,255)->BGR(255,0,0), white->(255,255,255), pad
      -1, 0, 0, -1, -1, -1, 0, 0,
      // image row 0: red=(255,0,0)->BGR(0,0,255), green->(0,255,0), pad
      0, 0, -1, 0, -1, 0, 0, 0)
    val px = Image.decode(header ++ data)
    assert((px.format, px.width, px.height, px.channels) == ("bmp", 2, 2, 3))
    val got = px.data.map(_ & 0xff).toSeq
    assert(got == Seq(255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255), s"got $got")
  }

  test("golden PGM: comments and flexible whitespace in the header parse") {
    val bytes = "P5 # a comment\n# another\n 3\t2 \n255\n".getBytes("US-ASCII") ++
      Array[Byte](10, 20, 30, 40, 50, 60)
    val px = Image.decode(bytes)
    assert((px.format, px.width, px.height, px.channels) == ("pgm", 3, 2, 1))
    assert(px.data.map(_ & 0xff).toSeq == Seq(10, 20, 30, 40, 50, 60))
  }

  test("round-trips are exact for all four formats, including BMP pad widths") {
    val rng = new scala.util.Random(7L)
    for (w <- Seq(1, 2, 3, 4, 5, 31); h <- Seq(1, 2, 7)) {
      val gray = Array.fill(w * h)(rng.nextInt(256).toByte)
      val g2 = Image.decode(Image.encodePgm(w, h, gray))
      assert(g2.data.sameElements(gray) && g2.width == w && g2.height == h, s"pgm $w x $h")
      val rgb = Array.fill(w * h * 3)(rng.nextInt(256).toByte)
      val p2 = Image.decode(Image.encodePpm(w, h, rgb))
      assert(p2.data.sameElements(rgb), s"ppm $w x $h")
      val b2 = Image.decode(Image.encodeBmp24(w, h, rgb))
      assert(b2.data.sameElements(rgb), s"bmp $w x $h (stride padding)")
      val ng = Image.decode(Image.encodePng(w, h, 1, gray))
      assert(ng.data.sameElements(gray) && ng.channels == 1, s"png gray $w x $h")
      val nc = Image.decode(Image.encodePng(w, h, 3, rgb))
      assert(nc.data.sameElements(rgb) && nc.channels == 3, s"png rgb $w x $h")
    }
  }

  // Golden PNGs authored OUTSIDE this codebase (python zlib/struct): the
  // decoder must read real third-party files — multi-chunk IDAT, ancillary
  // tEXt, CRCs — not just its own encoder's single-filter output. Together
  // the four cover filter types Sub/Up/Average/Paeth, palette expansion,
  // and the alpha-dropping branches.
  val rgbMixedFiltersB64 = "iVBORw0KGgoAAAANSUhEUgAAAAMAAAADCAIAAADZSiLoAAAADUlEQVR42mPkEpGDACZWGGDZE3Y2ngAAAA5JREFU6X2XkfGe2ex6AC7vBTYJehoDAAAADnRFWHRDb21tZW50AGdvbGRlbgv3q+sAAAAASUVORK5CYII="
  val rgbMixedFiltersPx = Seq(10,20,30,40,50,60,70,80,90,15,25,35,45,55,65,75,85,95,200,100,0,201,101,1,255,0,128)
  val paletteB64 = "iVBORw0KGgoAAAANSUhEUgAAAAIAAAACCAMAAABFaP0WAAAADFBMVEX/AAAA/wAAAP/////7AGD2AAAAB0lEQVR42mNgYGRmLVchUQAAAAdJREFUYgIAABkACXKcB7gAAAAOdEVYdENvbW1lbnQAZ29sZGVuC/er6wAAAABJRU5ErkJggg=="
  val palettePx = Seq(255,0,0,0,255,0,0,0,255,255,255,255)
  val rgbaB64 = "iVBORw0KGgoAAAANSUhEUgAAAAIAAAABCAYAAAD0In+KAAAACElEQVR42mNgZGI+wdutF1EAAAAJSURBVMLKxg4ABEsA5Wpt6SIAAAAOdEVYdENvbW1lbnQAZ29sZGVuC/er6wAAAABJRU5ErkJggg=="
  val rgbaPx = Seq(1,2,3,4,5,6)
  val grayAlphaB64 = "iVBORw0KGgoAAAANSUhEUgAAAAMAAAABCAQAAACx6dw/AAAAB0lEQVR42mPg/M/BMUaFlwAAAAhJREFUwN4AAAXmAZgSbBS/AAAADnRFWHRDb21tZW50AGdvbGRlbgv3q+sAAAAASUVORK5CYII="
  val grayAlphaPx = Seq(9,8,7)

  test("golden PNGs: third-party files with mixed filters, palette, and alpha decode exactly") {
    val b64 = java.util.Base64.getDecoder
    val m = Image.decode(b64.decode(rgbMixedFiltersB64))
    assert((m.format, m.width, m.height, m.channels) == ("png", 3, 3, 3))
    assert(m.data.map(_ & 0xff).toSeq == rgbMixedFiltersPx, "Sub/Up/Paeth unfilter")
    val p = Image.decode(b64.decode(paletteB64))
    assert((p.width, p.height, p.channels) == (2, 2, 3))
    assert(p.data.map(_ & 0xff).toSeq == palettePx, "palette + Average unfilter")
    val r = Image.decode(b64.decode(rgbaB64))
    assert((r.width, r.height, r.channels) == (2, 1, 3))
    assert(r.data.map(_ & 0xff).toSeq == rgbaPx, "RGBA alpha drop")
    val g = Image.decode(b64.decode(grayAlphaB64))
    assert((g.width, g.height, g.channels) == (3, 1, 1))
    assert(g.data.map(_ & 0xff).toSeq == grayAlphaPx, "gray+alpha alpha drop")
  }

  test("corrupted PNG is rejected: flipped pixel byte breaks the CRC, truncated IDAT stalls") {
    val bytes = java.util.Base64.getDecoder.decode(rgbMixedFiltersB64)
    val flipped = bytes.clone()
    flipped(45) = (flipped(45) ^ 0x40).toByte // inside first IDAT body
    assertThrows[IllegalArgumentException](Image.decode(flipped))
  }

  test("GRAY -> RGB expansion then luma is the identity on the gray plane") {
    val gray = (0 until 256).map(_.toByte).toArray
    val rgb = Image.grayToRgb(Image.Pixmap("pgm", 16, 16, 1, gray))
    assert(rgb.channels == 3)
    assert(Image.gray(rgb).sameElements(gray),
      "replicated channels must survive the integer BT.601 luma exactly")
  }

  test("hostile headers throw a bounded error before any pixel allocation") {
    // One corrupt payload among 10^12 must fail as a cheap
    // IllegalArgumentException, never an executor OOM or a negative array
    // size from Int overflow (65535^2 > Int.MaxValue). Each case patches a
    // VALID file's dimension fields to an absurd claim the tiny data stream
    // cannot back, so only the header guard stands between the parser and a
    // multi-GB allocation.
    def putLe32(a: Array[Byte], p: Int, v: Int): Unit = {
      a(p) = v.toByte; a(p + 1) = (v >> 8).toByte
      a(p + 2) = (v >> 16).toByte; a(p + 3) = (v >> 24).toByte
    }
    def putBe32(a: Array[Byte], p: Int, v: Int): Unit = {
      a(p) = (v >> 24).toByte; a(p + 1) = (v >> 16).toByte
      a(p + 2) = (v >> 8).toByte; a(p + 3) = v.toByte
    }
    def putBe16(a: Array[Byte], p: Int, v: Int): Unit = {
      a(p) = (v >> 8).toByte; a(p + 1) = v.toByte
    }

    val bmp = Image.encodeBmp24(2, 2, new Array[Byte](12))
    putLe32(bmp, 18, 65535); putLe32(bmp, 22, 65535) // BITMAPINFOHEADER w/h
    val e1 = intercept[IllegalArgumentException](Image.decode(bmp))
    assert(e1.getMessage.contains("decode cap"), e1.getMessage)

    val pgm = "P5 65535 65535 255\n".getBytes("US-ASCII") :+ 0.toByte
    val e2 = intercept[IllegalArgumentException](Image.decode(pgm))
    assert(e2.getMessage.contains("decode cap"), e2.getMessage)

    // PNG IHDR dims live at offsets 16/20; the chunk CRC covers type+data
    // (bytes 12..28) and must be recomputed or the CRC gate fires first
    val png = Image.encodePng(2, 2, 3, new Array[Byte](12))
    putBe32(png, 16, 65535); putBe32(png, 20, 65535)
    val crc = new java.util.zip.CRC32()
    crc.update(png, 12, 4 + 13)
    putBe32(png, 29, crc.getValue.toInt)
    val e3 = intercept[IllegalArgumentException](Image.decode(png))
    assert(e3.getMessage.contains("decode cap"), e3.getMessage)

    // JPEG SOF0 carries height/width big-endian at marker+5/+7
    val jpg = Jpeg.encode(8, 8, 1, new Array[Byte](64))
    val sof = (0 until jpg.length - 1).find(i =>
      (jpg(i) & 0xff) == 0xff && (jpg(i + 1) & 0xff) == 0xc0).get
    putBe16(jpg, sof + 5, 65535); putBe16(jpg, sof + 7, 65535)
    val e4 = intercept[IllegalArgumentException](Image.decode(jpg))
    assert(e4.getMessage.contains("decode cap"), e4.getMessage)

    // zero/negative dimensions are rejected by the same shared guard
    intercept[IllegalArgumentException](
      Image.decode("P5 0 5 255\n".getBytes("US-ASCII")))
  }

  test("fuzz: decodeSafe is total — noise and mutated files reject cheaply, never throw") {
    // At 10^12 documents every corruption pattern WILL occur. decodeSafe is
    // the ingestion contract: any byte stream either decodes or returns a
    // classified DecodeFailure — no exception escapes, no unbounded
    // allocation (the checkDims cap), no hang (every parser loop strictly
    // advances). Seeded, so a failure reproduces.
    val kinds = Set("hostile_header", "bad_magic", "truncated", "crc_mismatch",
      "unsupported_variant", "malformed", "corrupt_stream")
    def total(b: Array[Byte]): Unit = Image.decodeSafe(b) match {
      case Left(f)   => assert(kinds(f.kind), s"unknown kind ${f.kind} (${f.detail})")
      case Right(px) => assert(px.width > 0 && px.height > 0)
    }
    val rnd = new scala.util.Random(20260817L)

    // pure noise, including empty and 1-byte buffers
    for (n <- 0 until 500) {
      val b = new Array[Byte](n % 600)
      rnd.nextBytes(b)
      total(b)
    }

    // mutations of one valid file per format family (truncations at every
    // byte boundary for the small ones, plus random byte rewrites)
    val gray = Array.tabulate(16 * 12)(i => (i * 7 % 251).toByte)
    val rgb = Array.tabulate(16 * 12 * 3)(i => (i * 5 % 249).toByte)
    val valids = Seq(
      Image.encodePgm(16, 12, gray), Image.encodePpm(16, 12, rgb),
      Image.encodeBmp24(16, 12, rgb), Image.encodePng(16, 12, 1, gray),
      Image.encodePng(16, 12, 3, rgb), Jpeg.encode(16, 12, 1, gray),
      Jpeg.encode(16, 12, 3, rgb))
    for (v <- valids) {
      for (cut <- 0 until v.length) total(java.util.Arrays.copyOf(v, cut))
      for (_ <- 0 until 300) {
        val b = v.clone()
        val edits = 1 + rnd.nextInt(4)
        for (_ <- 0 until edits) b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
        total(b)
      }
    }
  }

  test("decoded image pixels drive the STD kernel identically to the tensor payload path") {
    // for generated refs: decode the real image file, take the luma, and
    // check the detection kernel sees EXACTLY what it would see had the same
    // cells arrived as an engine prob-map payload
    var formats = Set.empty[String]
    (0 until 40).foreach { i =>
      val ref = s"img-doc-$i"
      val px = Image.decode(GenData.imagePayload(GenData.DefaultSeed, ref))
      formats += px.format
      val luma = Image.gray(if (px.channels == 1) Image.grayToRgb(px) else px)
      val viaImage = Order.finalize(Detect.std(luma, 0, px.width, px.height))
      val viaPayload = Detect.extract(Payload.encodeProbMap(px.width, px.height, luma))
      assert(viaImage == viaPayload, s"$ref: image path diverged from payload path")
    }
    assert(formats == Set("bmp", "pgm", "ppm", "png", "jpeg"),
      s"all formats must be exercised, got $formats")
  }
}
