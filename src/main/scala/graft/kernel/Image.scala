package graft.kernel

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM decoders/encoders for the raster formats a codec-less
  * container can still genuinely parse: 24-bit BMP (BITMAPINFOHEADER,
  * BI_RGB), binary PGM (P5) and binary PPM (P6), zlib PNG, and baseline
  * JPEG (dispatch to [[Jpeg]]).
  *
  * This is the real-bytes analog of the reference's decode surface
  * (`cv2.imdecode` + GRAY→3-channel expansion + BGR→RGB flip,
  * /root/reference/cnstd/ppocr/img_operators.py:27-59): bytes in, an
  * H×W×C pixel array out, gray expandable to 3 channels, luma extractable
  * for the detection kernel. No native libraries are involved — BMP rows
  * are plain little-endian BGR triples padded to 4 bytes, netpbm is a
  * 3-token ASCII header plus raw samples — so the byte-level parsing is
  * exercised for real (golden-bytes + round-trip tests in KernelSpec).
  */
object Image {

  /** Decoded raster: `data` is row-major top-down; 3-channel data is RGB
    * interleaved, 1-channel is luma. `format` ∈ {"bmp", "pgm", "ppm",
    * "png", "jpeg"}.
    */
  final case class Pixmap(format: String, width: Int, height: Int,
                          channels: Int, data: Array[Byte]) {
    require(data.length == width * height * channels,
      s"pixel buffer ${data.length} != $width x $height x $channels")
  }

  /** Upper bound on any decoder's pixel-buffer footprint. A corrupt or
    * hostile header otherwise commits the task to a multi-GB allocation —
    * or an Int-overflowed NEGATIVE array size (65535² already exceeds
    * Int.MaxValue) — BEFORE the data stream can disprove the claimed
    * dimensions. One bad payload among 10^12 must throw a bounded
    * IllegalArgumentException, never OOM an executor; 1 GiB admits any
    * plausible page/scene raster.
    */
  final val MaxDecodedBytes: Long = 1L << 30

  /** Dimension sanity shared by every decoder: positive dims, and the
    * decoded buffer (computed in Long, immune to Int overflow) within
    * [[MaxDecodedBytes]]. `channels` is the decoder's worst-case per-pixel
    * byte footprint, not necessarily the output channel count.
    */
  private[kernel] def checkDims(format: String, w: Int, h: Int, channels: Int): Unit = {
    require(w > 0 && h > 0, s"$format: non-positive dimensions $w x $h")
    val need = w.toLong * h * channels
    require(need <= MaxDecodedBytes,
      s"$format: claimed $w x $h x$channels = $need bytes exceeds decode cap $MaxDecodedBytes")
  }

  /** Sniff the magic and parse. BMP = 'B''M'; netpbm = 'P''5' | 'P''6';
    * PNG = 0x89 'P' 'N' 'G'; JPEG = 0xFF 0xD8 (SOI).
    */
  def decode(bytes: Array[Byte]): Pixmap = {
    require(bytes.length >= 2, s"image payload too short: ${bytes.length}")
    (bytes(0), bytes(1)) match {
      case ('B', 'M')        => decodeBmp(bytes)
      case ('P', '5')        => decodePnm(bytes, channels = 1, "pgm")
      case ('P', '6')        => decodePnm(bytes, channels = 3, "ppm")
      case (-119, 'P')       => decodePng(bytes) // 0x89 as signed byte
      case (-1, -40)         => Jpeg.decode(bytes) // 0xff 0xd8 as signed bytes
      case (a, b)            => throw new IllegalArgumentException(f"unknown image magic 0x$a%02x 0x$b%02x")
    }
  }

  /** Stable classification of a decode failure. At 10^12 documents a bad
    * byte stream is an EXPECTED input, not an exceptional condition: the
    * pipeline quarantines the record and keeps the stage alive, and ops
    * dashboards need the failure MIX (truncation vs bit-rot vs hostile
    * header), not a stack trace per record. Kinds are derived from this
    * file's own deterministic error messages, so the same bytes classify
    * identically on any executor and in the single-threaded oracle.
    */
  final case class DecodeFailure(kind: String, detail: String)

  private def classify(t: Throwable): DecodeFailure = {
    val msg = Option(t.getMessage).getOrElse("")
    val m = msg.toLowerCase
    val kind = t match {
      case _: IllegalArgumentException =>
        if (m.contains("decode cap") || m.contains("non-positive dimensions")) "hostile_header"
        else if (m.contains("magic") || m.contains("not a bmp")) "bad_magic"
        else if (m.contains("truncat") || m.contains("stalled") || m.contains("short") ||
                 m.contains("overruns") || m.contains("exhausted") || m.contains("out of range")) "truncated"
        else if (m.contains("crc")) "crc_mismatch"
        else if (m.contains("unsupported") || m.contains("progressive") || m.contains("arithmetic") ||
                 m.contains("interlaced")) "unsupported_variant"
        else "malformed"
      // anything a fuzzer shakes loose past the require() fences (index
      // out of bounds, zip DataFormatException, ...) is still a per-record
      // reject, classified coarsely rather than crashing the task
      case _ => "corrupt_stream"
    }
    DecodeFailure(kind, s"${t.getClass.getSimpleName}: $msg")
  }

  /** Total decode: never throws on bad input. The quarantine entry point
    * for ingestion paths — [[decode]] stays the strict kernel used where
    * payloads are trusted (engine-encoded fixtures, tests). Fatal errors
    * (OOM, interrupts) still propagate; everything else becomes a typed,
    * deterministic [[DecodeFailure]].
    */
  def decodeSafe(bytes: Array[Byte]): Either[DecodeFailure, Pixmap] =
    try Right(decode(bytes))
    catch { case scala.util.control.NonFatal(t) => Left(classify(t)) }

  /** 24-bit uncompressed BMP: BITMAPFILEHEADER (14 bytes, little-endian)
    * then BITMAPINFOHEADER (40 bytes). Rows are BGR triples padded to a
    * 4-byte boundary; positive biHeight = bottom-up (the common case),
    * negative = top-down. Output is top-down RGB.
    */
  private def decodeBmp(bytes: Array[Byte]): Pixmap = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bb.getShort(0) == 0x4d42.toShort, "not a BMP")
    val dataOffset = bb.getInt(10)
    val headerSize = bb.getInt(14)
    require(headerSize >= 40, s"unsupported DIB header size $headerSize")
    val w = bb.getInt(18)
    val rawH = bb.getInt(22)
    val planes = bb.getShort(26)
    val bpp = bb.getShort(28)
    val compression = bb.getInt(30)
    require(planes == 1, s"BMP planes $planes != 1")
    require(bpp == 24, s"only 24-bit BMP supported, got $bpp")
    require(compression == 0, s"only BI_RGB (uncompressed) supported, got $compression")
    val h = math.abs(rawH)
    checkDims("bmp", w, h, 3)
    require(dataOffset >= 0 && dataOffset <= bytes.length, s"BMP data offset $dataOffset out of range")
    val bottomUp = rawH > 0
    val rowStride = ((w * 3 + 3) / 4) * 4
    require(bytes.length >= dataOffset.toLong + rowStride.toLong * h,
      s"BMP truncated: need ${dataOffset.toLong + rowStride.toLong * h}, have ${bytes.length}")
    val out = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val srcRow = dataOffset + (if (bottomUp) (h - 1 - y) else y) * rowStride
      var x = 0
      while (x < w) {
        val s = srcRow + x * 3
        val d = (y * w + x) * 3
        out(d) = bytes(s + 2)     // R (file order is B,G,R)
        out(d + 1) = bytes(s + 1) // G
        out(d + 2) = bytes(s)     // B
        x += 1
      }
      y += 1
    }
    Pixmap("bmp", w, h, 3, out)
  }

  /** Binary netpbm (P5 gray / P6 RGB): ASCII header of magic, width,
    * height, maxval — tokens separated by whitespace, `#` comments run to
    * end of line — followed by a single whitespace byte and raw samples.
    * Only maxval <= 255 (1 byte/sample) is supported.
    */
  private def decodePnm(bytes: Array[Byte], channels: Int, format: String): Pixmap = {
    var pos = 2 // past magic
    def nextToken(): Int = {
      // skip whitespace and comments
      var inComment = false
      while (pos < bytes.length &&
             (inComment || bytes(pos).toChar.isWhitespace || bytes(pos) == '#')) {
        if (bytes(pos) == '#') inComment = true
        else if (bytes(pos) == '\n') inComment = false
        pos += 1
      }
      var v = 0
      require(pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9',
        s"$format header: expected digit at $pos")
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
        v = v * 10 + (bytes(pos) - '0')
        pos += 1
      }
      v
    }
    val w = nextToken()
    val h = nextToken()
    val maxval = nextToken()
    require(maxval > 0 && maxval <= 255, s"$format maxval $maxval unsupported")
    checkDims(format, w, h, channels)
    pos += 1 // exactly one whitespace byte after maxval
    val n = w * h * channels
    require(bytes.length >= pos + n, s"$format truncated: need ${pos + n}, have ${bytes.length}")
    val out = new Array[Byte](n)
    System.arraycopy(bytes, pos, out, 0, n)
    Pixmap(format, w, h, channels, out)
  }

  private val PngSignature =
    Array[Byte](-119, 'P', 'N', 'G', '\r', '\n', 26, '\n')

  /** PNG (RFC 2083): the one COMPRESSED format a codec-less JVM can still
    * genuinely decode — the zlib stream (`java.util.zip.Inflater`), per-chunk
    * CRC-32, and all five scanline filters (None/Sub/Up/Average/Paeth) are
    * pure JDK + pure code. Supported: 8-bit depth, color types 0 (gray),
    * 2 (RGB), 3 (palette → RGB), 4 (gray+alpha → gray) and 6 (RGBA → RGB,
    * alpha dropped — the reference decodes to BGR the same way,
    * cv2.imdecode default flag), non-interlaced. Ancillary chunks are
    * skipped; critical-chunk CRCs are verified.
    */
  private def decodePng(bytes: Array[Byte]): Pixmap = {
    require(bytes.length >= 8 && (0 until 8).forall(i => bytes(i) == PngSignature(i)),
      "not a PNG: bad signature")
    def be32(p: Int): Int =
      ((bytes(p) & 0xff) << 24) | ((bytes(p + 1) & 0xff) << 16) |
        ((bytes(p + 2) & 0xff) << 8) | (bytes(p + 3) & 0xff)
    var pos = 8
    var w = 0; var h = 0; var colorType = -1
    var palette: Array[Byte] = null
    val idat = new java.io.ByteArrayOutputStream()
    var done = false
    while (!done) {
      require(pos + 12 <= bytes.length, s"PNG truncated at chunk header (pos $pos)")
      val len = be32(pos)
      val typ = new String(bytes, pos + 4, 4, "US-ASCII")
      require(len >= 0 && pos + 12 + len <= bytes.length, s"PNG chunk $typ overruns buffer")
      // CRC covers type + data (RFC 2083 §3.4); check critical chunks only
      if (typ.head.isUpper) {
        val crc = new java.util.zip.CRC32()
        crc.update(bytes, pos + 4, 4 + len)
        require(crc.getValue.toInt == be32(pos + 8 + len), s"PNG chunk $typ CRC mismatch")
      }
      typ match {
        case "IHDR" =>
          require(len == 13, s"IHDR length $len != 13")
          w = be32(pos + 8); h = be32(pos + 12)
          val bitDepth = bytes(pos + 16)
          colorType = bytes(pos + 17)
          require(bitDepth == 8, s"only 8-bit PNG supported, got depth $bitDepth")
          require(Set(0, 2, 3, 4, 6)(colorType), s"unsupported PNG color type $colorType")
          require(bytes(pos + 18) == 0 && bytes(pos + 19) == 0, "non-deflate/non-adaptive PNG")
          require(bytes(pos + 20) == 0, "interlaced PNG unsupported")
          // worst case 4 source bytes/pixel (RGBA) + the filter column
          checkDims("png", w, h, 4)
        case "PLTE" =>
          require(len % 3 == 0, s"PLTE length $len not a multiple of 3")
          palette = java.util.Arrays.copyOfRange(bytes, pos + 8, pos + 8 + len)
        case "IDAT" => idat.write(bytes, pos + 8, len)
        case "IEND" => done = true
        case _      => () // ancillary (tEXt, pHYs, ...) — skip
      }
      pos += 12 + len
    }
    require(colorType >= 0, "PNG missing IHDR")
    val srcCh = colorType match {
      case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
    }
    // inflate the full filtered image: h scanlines of 1 filter byte + w*srcCh
    val stride = w * srcCh
    val raw = new Array[Byte](h * (1 + stride))
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    var got = 0
    while (got < raw.length && !inf.finished()) {
      val n = inf.inflate(raw, got, raw.length - got)
      require(n > 0 || inf.finished(), "PNG zlib stream stalled (truncated IDAT?)")
      got += n
    }
    inf.end()
    require(got == raw.length, s"PNG pixel data short: $got of ${raw.length}")
    // unfilter in place into `img` (RFC 2083 §6): per-byte predictors over
    // the prior byte (a), prior row (b), and prior row's prior byte (c)
    val img = new Array[Byte](h * stride)
    var y = 0
    while (y < h) {
      val filter = raw(y * (1 + stride)) & 0xff
      val rowIn = y * (1 + stride) + 1
      val out = y * stride
      val prev = (y - 1) * stride
      var i = 0
      while (i < stride) {
        val x = raw(rowIn + i) & 0xff
        val a = if (i >= srcCh) img(out + i - srcCh) & 0xff else 0
        val b = if (y > 0) img(prev + i) & 0xff else 0
        val c = if (y > 0 && i >= srcCh) img(prev + i - srcCh) & 0xff else 0
        val recon = filter match {
          case 0 => x
          case 1 => x + a
          case 2 => x + b
          case 3 => x + (a + b) / 2
          case 4 => // Paeth
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
            x + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
          case f => throw new IllegalArgumentException(s"PNG filter type $f")
        }
        img(out + i) = recon.toByte
        i += 1
      }
      y += 1
    }
    // project to the Pixmap channel model: gray stays 1ch, color becomes RGB
    colorType match {
      case 0 => Pixmap("png", w, h, 1, img)
      case 2 => Pixmap("png", w, h, 3, img)
      case 3 =>
        require(palette != null, "paletted PNG missing PLTE")
        val out = new Array[Byte](w * h * 3)
        var i = 0
        while (i < w * h) {
          val idx = (img(i) & 0xff) * 3
          require(idx + 2 < palette.length, s"palette index ${img(i) & 0xff} out of range")
          out(i * 3) = palette(idx); out(i * 3 + 1) = palette(idx + 1)
          out(i * 3 + 2) = palette(idx + 2)
          i += 1
        }
        Pixmap("png", w, h, 3, out)
      case 4 =>
        val out = new Array[Byte](w * h)
        var i = 0
        while (i < w * h) { out(i) = img(i * 2); i += 1 }
        Pixmap("png", w, h, 1, out)
      case 6 =>
        val out = new Array[Byte](w * h * 3)
        var i = 0
        while (i < w * h) {
          out(i * 3) = img(i * 4); out(i * 3 + 1) = img(i * 4 + 1)
          out(i * 3 + 2) = img(i * 4 + 2)
          i += 1
        }
        Pixmap("png", w, h, 3, out)
    }
  }

  /** Encode gray (1ch) or RGB (3ch) as a non-interlaced 8-bit PNG, filter
    * type 0 on every scanline, one zlib stream. Deterministic for a fixed
    * JDK (`Deflater` level 6); consumers hash decoded PIXELS, not files, so
    * encoder byte-stability across JDKs is not load-bearing.
    */
  def encodePng(w: Int, h: Int, channels: Int, data: Array[Byte]): Array[Byte] = {
    require(channels == 1 || channels == 3, s"encodePng channels $channels")
    require(data.length == w * h * channels, s"data ${data.length} != $w x $h x $channels")
    val stride = w * channels
    val filtered = new Array[Byte](h * (1 + stride))
    var y = 0
    while (y < h) {
      // filtered(y*(1+stride)) = 0 (filter None) — already zero
      System.arraycopy(data, y * stride, filtered, y * (1 + stride) + 1, stride)
      y += 1
    }
    val def_ = new java.util.zip.Deflater()
    def_.setInput(filtered); def_.finish()
    val zbuf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](16384)
    while (!def_.finished()) zbuf.write(tmp, 0, def_.deflate(tmp))
    def_.end()
    val out = new java.io.ByteArrayOutputStream()
    out.write(PngSignature, 0, 8)
    def chunk(typ: String, body: Array[Byte]): Unit = {
      val len = body.length
      out.write(Array[Byte]((len >>> 24).toByte, (len >>> 16).toByte,
        (len >>> 8).toByte, len.toByte), 0, 4)
      val tb = typ.getBytes("US-ASCII")
      out.write(tb, 0, 4)
      out.write(body, 0, len)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(body)
      val c = crc.getValue.toInt
      out.write(Array[Byte]((c >>> 24).toByte, (c >>> 16).toByte,
        (c >>> 8).toByte, c.toByte), 0, 4)
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
    ihdr.putInt(w).putInt(h).put(8.toByte)
      .put((if (channels == 1) 0 else 2).toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    chunk("IHDR", ihdr.array())
    chunk("IDAT", zbuf.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** GRAY → 3-channel expansion (the reference's GRAY2BGR branch): each
    * luma sample replicated into R=G=B.
    */
  def grayToRgb(p: Pixmap): Pixmap = {
    require(p.channels == 1, s"grayToRgb on ${p.channels}-channel image")
    val out = new Array[Byte](p.width * p.height * 3)
    var i = 0
    while (i < p.data.length) {
      val v = p.data(i)
      out(i * 3) = v; out(i * 3 + 1) = v; out(i * 3 + 2) = v
      i += 1
    }
    Pixmap(p.format, p.width, p.height, 3, out)
  }

  /** Luma plane: identity for 1-channel; integer BT.601
    * (299 R + 587 G + 114 B + 500) / 1000 for RGB — exact (no rounding
    * drift) when the channels are replicated gray.
    */
  def gray(p: Pixmap): Array[Byte] = p.channels match {
    case 1 => p.data
    case 3 =>
      val out = new Array[Byte](p.width * p.height)
      var i = 0
      while (i < out.length) {
        val r = p.data(i * 3) & 0xff
        val g = p.data(i * 3 + 1) & 0xff
        val b = p.data(i * 3 + 2) & 0xff
        out(i) = ((299 * r + 587 * g + 114 * b + 500) / 1000).toByte
        i += 1
      }
      out
    case c => throw new IllegalArgumentException(s"gray() on $c-channel image")
  }

  /** Encode top-down RGB as a bottom-up 24-bit BI_RGB BMP. */
  def encodeBmp24(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3, s"rgb ${rgb.length} != $w x $h x 3")
    val rowStride = ((w * 3 + 3) / 4) * 4
    val dataSize = rowStride * h
    val bb = ByteBuffer.allocate(54 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    bb.putShort(0x4d42.toShort).putInt(54 + dataSize).putInt(0).putInt(54)
    bb.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
    bb.putInt(0).putInt(dataSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
    val out = bb.array()
    var y = 0
    while (y < h) {
      val dstRow = 54 + (h - 1 - y) * rowStride
      var x = 0
      while (x < w) {
        val s = (y * w + x) * 3
        val d = dstRow + x * 3
        out(d) = rgb(s + 2); out(d + 1) = rgb(s + 1); out(d + 2) = rgb(s)
        x += 1
      }
      y += 1
    }
    out
  }

  /** Encode a gray plane as binary PGM (P5). */
  def encodePgm(w: Int, h: Int, gray: Array[Byte]): Array[Byte] = {
    require(gray.length == w * h, s"gray ${gray.length} != $w x $h")
    val header = s"P5\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + gray.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(gray, 0, out, header.length, gray.length)
    out
  }

  /** Encode top-down RGB as binary PPM (P6). */
  def encodePpm(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3, s"rgb ${rgb.length} != $w x $h x 3")
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(rgb, 0, out, header.length, rgb.length)
    out
  }
}
