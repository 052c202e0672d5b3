package graft.kernel

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM decoders/encoders for the uncompressed raster formats a
  * codec-less container can still genuinely parse: 24-bit BMP
  * (BITMAPINFOHEADER, BI_RGB), binary PGM (P5) and binary PPM (P6).
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
    * interleaved, 1-channel is luma. `format` ∈ {"bmp", "pgm", "ppm"}.
    */
  final case class Pixmap(format: String, width: Int, height: Int,
                          channels: Int, data: Array[Byte]) {
    require(data.length == width * height * channels,
      s"pixel buffer ${data.length} != $width x $height x $channels")
  }

  /** Sniff the magic and parse. BMP = 'B''M'; netpbm = 'P''5' | 'P''6'. */
  def decode(bytes: Array[Byte]): Pixmap = {
    require(bytes.length >= 2, s"image payload too short: ${bytes.length}")
    (bytes(0), bytes(1)) match {
      case ('B', 'M') => decodeBmp(bytes)
      case ('P', '5') => decodePnm(bytes, channels = 1, "pgm")
      case ('P', '6') => decodePnm(bytes, channels = 3, "ppm")
      case (a, b)     => throw new IllegalArgumentException(f"unknown image magic 0x$a%02x 0x$b%02x")
    }
  }

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
    val bottomUp = rawH > 0
    val rowStride = ((w * 3 + 3) / 4) * 4
    require(bytes.length >= dataOffset + rowStride * h,
      s"BMP truncated: need ${dataOffset + rowStride * h}, have ${bytes.length}")
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
    pos += 1 // exactly one whitespace byte after maxval
    val n = w * h * channels
    require(bytes.length >= pos + n, s"$format truncated: need ${pos + n}, have ${bytes.length}")
    val out = new Array[Byte](n)
    System.arraycopy(bytes, pos, out, 0, n)
    Pixmap(format, w, h, channels, out)
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
