package graft.kernel

import scala.collection.mutable.ArrayBuffer

/** Baseline JPEG (ITU-T T.81 sequential DCT, 8-bit) — encoder and decoder
  * in pure JVM code, completing kernel/Image's format set with the one
  * format CnSTD actually ingests most (`cv2.imdecode` over .jpg test
  * images, /root/reference/cnstd/ppocr/img_operators.py:27-59 and the
  * bundled .jpg files under examples/).
  *
  * Decoder scope: baseline DCT (SOF0), 8-bit, 1 or 3 components, sampling
  * factors 1 or 2 (covers gray, 4:4:4, 4:2:2, 4:2:0), restart markers,
  * byte-stuffing, JFIF YCbCr→RGB (BT.601 integer-rounded). Progressive
  * (SOF2) and arithmetic coding are rejected explicitly.
  *
  * Encoder scope: what the generator needs — gray or 4:4:4 color, quality
  * ~75 Annex-K tables, standard Annex-K Huffman tables, no subsampling, no
  * restarts. Both directions are deterministic (integer/fixed double math
  * only), which is what the mm2 oracle requires; JPEG being lossy, the
  * oracle checks DECODED pixels, never the pre-encode scene.
  */
object Jpeg {

  // ----------------------------------------------------------- shared tables

  /** Zig-zag order: zigzag(i) = natural index of the i-th coefficient. */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Annex K.1 luminance / K.2 chrominance quantization tables (quality 50
    * base), scaled here to quality 75 with the IJG formula.
    */
  private val BaseQLum: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99)
  private val BaseQChrom: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99)

  private def scaleQ(base: Array[Int], quality: Int): Array[Int] = {
    val s = if (quality < 50) 5000 / quality else 200 - quality * 2
    base.map { v => math.max(1, math.min(255, (v * s + 50) / 100)) }
  }

  private val QLum = scaleQ(BaseQLum, 75)
  private val QChrom = scaleQ(BaseQChrom, 75)

  /** Annex K.3 Huffman table specs: (bits-per-length[1..16], values). */
  private val DcLumBits = Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumVals = (0 to 11).map(_.toByte).toArray
  private val DcChromBits = Array(0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcChromVals = (0 to 11).map(_.toByte).toArray
  private val AcLumBits = Array(0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcLumVals: Array[Byte] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa).map(_.toByte)
  private val AcChromBits = Array(0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val AcChromVals: Array[Byte] = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15, 0x62, 0x72, 0xd1,
    0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a,
    0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa).map(_.toByte)

  // ------------------------------------------------------------------- DCT

  /** Cosine basis cos((2x+1)·u·π/16), precomputed once — the DCT loops do
    * table lookups instead of per-element transcendental calls (identical
    * values and summation order, so the output is bit-for-bit the same as
    * the textbook form; ~50× faster on a 256×256 image).
    */
  private val Cos: Array[Double] = {
    val t = new Array[Double](64)
    var x = 0
    while (x < 8) {
      var u = 0
      while (u < 8) { t(x * 8 + u) = math.cos((2 * x + 1) * u * math.Pi / 16); u += 1 }
      x += 1
    }
    t
  }
  private val InvSqrt2 = 1 / math.sqrt(2)

  /** Reference 2-D FDCT (T.81 A.3.3), double precision, deterministic. */
  private def fdct(block: Array[Double]): Array[Double] = {
    val out = new Array[Double](64)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var sum = 0.0
        var x = 0
        while (x < 8) {
          var y = 0
          while (y < 8) {
            sum += block(x * 8 + y) * Cos(x * 8 + u) * Cos(y * 8 + v)
            y += 1
          }
          x += 1
        }
        val cu = if (u == 0) InvSqrt2 else 1.0
        val cv = if (v == 0) InvSqrt2 else 1.0
        out(u * 8 + v) = 0.25 * cu * cv * sum
        v += 1
      }
      u += 1
    }
    out
  }

  /** Reference 2-D IDCT (T.81 A.3.3), double precision, deterministic.
    * Zero coefficients are skipped: after quantization most AC terms are 0,
    * and a 0.0 addend never changes an accumulating double, so iterating
    * the NONZERO coefficients in the same u-major order gives each pixel
    * the same partial-sum sequence (bit-identical) at a fraction of the
    * work — DC-only blocks drop from 4096 to 64 multiply-adds.
    */
  private def idct(coef: Array[Int]): Array[Int] = {
    val acc = new Array[Double](64)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        val c = coef(u * 8 + v)
        if (c != 0) {
          val cu = if (u == 0) InvSqrt2 else 1.0
          val cv = if (v == 0) InvSqrt2 else 1.0
          val s = cu * cv * c
          var x = 0
          while (x < 8) {
            val sx = s * Cos(x * 8 + u)
            var y = 0
            while (y < 8) {
              acc(x * 8 + y) += sx * Cos(y * 8 + v)
              y += 1
            }
            x += 1
          }
        }
        v += 1
      }
      u += 1
    }
    val out = new Array[Int](64)
    var i = 0
    while (i < 64) { out(i) = math.rint(acc(i) / 4).toInt; i += 1 }
    out
  }

  // --------------------------------------------------------------- encoder

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nBits = 0
    def put(bits: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((bits >>> i) & 1)
        nBits += 1
        if (nBits == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00) // byte stuffing
          acc = 0; nBits = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (nBits > 0) { // pad with 1s (T.81 F.1.2.3)
      acc = (acc << (8 - nBits)) | ((1 << (8 - nBits)) - 1)
      out.write(acc)
      if (acc == 0xff) out.write(0x00)
      acc = 0; nBits = 0
    }
  }

  /** code/length pairs for a (bits, vals) Huffman spec, T.81 C.2. */
  private def buildEncTable(bits: Array[Int], vals: Array[Byte]): Array[(Int, Int)] = {
    val table = new Array[(Int, Int)](256)
    var code = 0
    var k = 0
    var len = 1
    while (len <= 16) {
      var i = 0
      while (i < bits(len)) {
        table(vals(k) & 0xff) = (code, len)
        code += 1; k += 1; i += 1
      }
      code <<= 1
      len += 1
    }
    table
  }

  private val EncDcLum = buildEncTable(DcLumBits, DcLumVals)
  private val EncAcLum = buildEncTable(AcLumBits, AcLumVals)
  private val EncDcChrom = buildEncTable(DcChromBits, DcChromVals)
  private val EncAcChrom = buildEncTable(AcChromBits, AcChromVals)

  private def category(v: Int): Int = {
    var a = math.abs(v); var c = 0
    while (a != 0) { a >>= 1; c += 1 }
    c
  }

  /** Encode one 8x8 block of a plane (replicated edges) and return new DC. */
  private def encodeBlock(bw: BitWriter, plane: Array[Byte], pw: Int, ph: Int,
                          bx: Int, by: Int, q: Array[Int], prevDc: Int,
                          dcT: Array[(Int, Int)], acT: Array[(Int, Int)]): Int = {
    val blk = new Array[Double](64)
    var y = 0
    while (y < 8) {
      val sy = math.min(ph - 1, by + y)
      var x = 0
      while (x < 8) {
        val sx = math.min(pw - 1, bx + x)
        blk(y * 8 + x) = (plane(sy * pw + sx) & 0xff) - 128.0
        x += 1
      }
      y += 1
    }
    val f = fdct(blk)
    val zz = new Array[Int](64)
    var i = 0
    while (i < 64) {
      val nat = Zigzag(i)
      zz(i) = math.rint(f(nat) / q(nat)).toInt
      i += 1
    }
    // DC
    val diff = zz(0) - prevDc
    val cat = category(diff)
    val (dcCode, dcLen) = dcT(cat)
    bw.put(dcCode, dcLen)
    if (cat > 0) bw.put(if (diff < 0) diff + (1 << cat) - 1 else diff, cat)
    // AC
    var run = 0
    var k = 1
    while (k < 64) {
      val v = zz(k)
      if (v == 0) run += 1
      else {
        while (run >= 16) { val (c, l) = acT(0xf0); bw.put(c, l); run -= 16 }
        val acat = category(v)
        val (c, l) = acT((run << 4) | acat)
        bw.put(c, l)
        bw.put(if (v < 0) v + (1 << acat) - 1 else v, acat)
        run = 0
      }
      k += 1
    }
    if (run > 0) { val (c, l) = acT(0x00); bw.put(c, l) } // EOB
    zz(0)
  }

  private def marker(out: java.io.ByteArrayOutputStream, m: Int, body: Array[Byte]): Unit = {
    out.write(0xff); out.write(m)
    val len = body.length + 2
    out.write(len >> 8); out.write(len & 0xff)
    out.write(body, 0, body.length)
  }

  private def dqtBody(id: Int, q: Array[Int]): Array[Byte] = {
    val b = new Array[Byte](65)
    b(0) = id.toByte
    var i = 0
    while (i < 64) { b(1 + i) = q(Zigzag(i)).toByte; i += 1 }
    b
  }

  private def dhtBody(clazz: Int, id: Int, bits: Array[Int], vals: Array[Byte]): Array[Byte] = {
    val b = new ArrayBuffer[Byte]()
    b += ((clazz << 4) | id).toByte
    (1 to 16).foreach(l => b += bits(l).toByte)
    vals.foreach(b += _)
    b.toArray
  }

  /** Encode gray (1ch) or top-down RGB (3ch, encoded 4:4:4) as baseline JFIF. */
  def encode(w: Int, h: Int, channels: Int, data: Array[Byte]): Array[Byte] = {
    require(channels == 1 || channels == 3, s"encode channels $channels")
    require(data.length == w * h * channels, s"data ${data.length} != $w x $h x $channels")
    // color transform RGB -> YCbCr (JFIF / BT.601, rounded)
    val planes: Array[Array[Byte]] =
      if (channels == 1) Array(data)
      else {
        val yP = new Array[Byte](w * h); val cb = new Array[Byte](w * h); val cr = new Array[Byte](w * h)
        var i = 0
        while (i < w * h) {
          val r = data(i * 3) & 0xff; val g = data(i * 3 + 1) & 0xff; val b = data(i * 3 + 2) & 0xff
          yP(i) = clamp255(math.rint(0.299 * r + 0.587 * g + 0.114 * b).toInt).toByte
          cb(i) = clamp255(math.rint(128 - 0.168736 * r - 0.331264 * g + 0.5 * b).toInt).toByte
          cr(i) = clamp255(math.rint(128 + 0.5 * r - 0.418688 * g - 0.081312 * b).toInt).toByte
          i += 1
        }
        Array(yP, cb, cr)
      }
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8) // SOI
    marker(out, 0xe0, Array[Byte]('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    marker(out, 0xdb, dqtBody(0, QLum))
    if (channels == 3) marker(out, 0xdb, dqtBody(1, QChrom))
    val sof = new ArrayBuffer[Byte]()
    sof += 8
    sof += (h >> 8).toByte += (h & 0xff).toByte += (w >> 8).toByte += (w & 0xff).toByte
    sof += channels.toByte
    (0 until channels).foreach { c =>
      sof += (c + 1).toByte += 0x11.toByte += (if (c == 0) 0 else 1).toByte
    }
    marker(out, 0xc0, sof.toArray)
    marker(out, 0xc4, dhtBody(0, 0, DcLumBits, DcLumVals))
    marker(out, 0xc4, dhtBody(1, 0, AcLumBits, AcLumVals))
    if (channels == 3) {
      marker(out, 0xc4, dhtBody(0, 1, DcChromBits, DcChromVals))
      marker(out, 0xc4, dhtBody(1, 1, AcChromBits, AcChromVals))
    }
    val sos = new ArrayBuffer[Byte]()
    sos += channels.toByte
    (0 until channels).foreach { c =>
      sos += (c + 1).toByte += (if (c == 0) 0x00 else 0x11).toByte
    }
    sos += 0.toByte += 63.toByte += 0.toByte
    marker(out, 0xda, sos.toArray)
    val bw = new BitWriter(out)
    val prevDc = new Array[Int](channels)
    val mcusX = (w + 7) / 8
    val mcusY = (h + 7) / 8
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        var c = 0
        while (c < channels) {
          val q = if (c == 0) QLum else QChrom
          val dcT = if (c == 0) EncDcLum else EncDcChrom
          val acT = if (c == 0) EncAcLum else EncAcChrom
          prevDc(c) = encodeBlock(bw, planes(c), w, h, mx * 8, my * 8, q, prevDc(c), dcT, acT)
          c += 1
        }
        mx += 1
      }
      my += 1
    }
    bw.flush()
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  private def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  // --------------------------------------------------------------- decoder

  /** Canonical Huffman decode table: (maxcode/valptr per length, vals). */
  private final class HuffTable(bits: Array[Int], val vals: Array[Byte]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        if (bits(l) > 0) {
          valPtr(l) = k
          minCode(l) = code
          code += bits(l); k += bits(l)
          maxCode(l) = code - 1
        } else maxCode(l) = -1
        code <<= 1
        l += 1
      }
    }
  }

  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nBits = 0
    var sawMarker = false
    def bit(): Int = {
      if (nBits == 0) {
        if (pos >= data.length) throw new IllegalArgumentException("JPEG: entropy data exhausted")
        var b = data(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          val next = if (pos < data.length) data(pos) & 0xff else -1
          if (next == 0x00) pos += 1 // stuffed
          else { sawMarker = true; b = 0xff } // leave marker; pad bits follow
        }
        acc = b; nBits = 8
      }
      nBits -= 1
      (acc >> nBits) & 1
    }
    def bits(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def align(): Unit = { nBits = 0 }
  }

  private def decodeHuff(br: BitReader, t: HuffTable): Int = {
    var code = br.bit()
    var l = 1
    while (l <= 16) {
      if (t.maxCode(l) >= 0 && code <= t.maxCode(l)) {
        return t.vals(t.valPtr(l) + code - t.minCode(l)) & 0xff
      }
      code = (code << 1) | br.bit()
      l += 1
    }
    throw new IllegalArgumentException("JPEG: invalid Huffman code")
  }

  private def extend(v: Int, cat: Int): Int =
    if (cat == 0) 0 else if (v < (1 << (cat - 1))) v - (1 << cat) + 1 else v

  private final case class Component(id: Int, hs: Int, vs: Int, tq: Int) {
    var dcTable = 0
    var acTable = 0
  }

  /** Decode baseline JPEG to an Image.Pixmap (gray or RGB). */
  def decode(bytes: Array[Byte]): Image.Pixmap = {
    require(bytes.length > 4 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8,
      "not a JPEG: missing SOI")
    var pos = 2
    val qTables = new Array[Array[Int]](4)
    val dcTables = new Array[HuffTable](4)
    val acTables = new Array[HuffTable](4)
    var w = 0; var h = 0
    var comps: Array[Component] = null
    var restartInterval = 0
    def u16(p: Int) = ((bytes(p) & 0xff) << 8) | (bytes(p + 1) & 0xff)
    var scanAt = -1
    while (scanAt < 0) {
      require(pos + 4 <= bytes.length, "JPEG truncated before SOS")
      require((bytes(pos) & 0xff) == 0xff, f"JPEG: expected marker at $pos")
      val m = bytes(pos + 1) & 0xff
      val len = u16(pos + 2)
      m match {
        case 0xc0 | 0xc1 => // baseline / extended sequential
          h = u16(pos + 5); w = u16(pos + 7)
          val nc = bytes(pos + 9) & 0xff
          require(nc == 1 || nc == 3, s"JPEG: $nc components unsupported")
          comps = (0 until nc).map { i =>
            val o = pos + 10 + i * 3
            val hv = bytes(o + 1) & 0xff
            Component(bytes(o) & 0xff, hv >> 4, hv & 0xf, bytes(o + 2) & 0xff)
          }.toArray
          comps.foreach(c => require(c.hs >= 1 && c.hs <= 2 && c.vs >= 1 && c.vs <= 2,
            s"JPEG: sampling ${c.hs}x${c.vs} unsupported"))
        case 0xc2 => throw new IllegalArgumentException("progressive JPEG unsupported")
        case 0xc9 | 0xca | 0xcb => throw new IllegalArgumentException("arithmetic JPEG unsupported")
        case 0xdb =>
          var p = pos + 4
          while (p < pos + 2 + len) {
            val pq = (bytes(p) & 0xff) >> 4
            val tq = bytes(p) & 0x0f
            require(pq == 0, "16-bit quant tables unsupported")
            val q = new Array[Int](64)
            var i = 0
            while (i < 64) { q(Zigzag(i)) = bytes(p + 1 + i) & 0xff; i += 1 }
            qTables(tq) = q
            p += 65
          }
        case 0xc4 =>
          var p = pos + 4
          while (p < pos + 2 + len) {
            val tc = (bytes(p) & 0xff) >> 4
            val th = bytes(p) & 0x0f
            val bits = new Array[Int](17)
            var total = 0
            (1 to 16).foreach { l => bits(l) = bytes(p + l) & 0xff; total += bits(l) }
            val vals = java.util.Arrays.copyOfRange(bytes, p + 17, p + 17 + total)
            val t = new HuffTable(bits, vals)
            if (tc == 0) dcTables(th) = t else acTables(th) = t
            p += 17 + total
          }
        case 0xdd => restartInterval = u16(pos + 4)
        case 0xda =>
          val ns = bytes(pos + 4) & 0xff
          require(comps != null && ns == comps.length, "JPEG: scan/frame component mismatch")
          (0 until ns).foreach { i =>
            val cid = bytes(pos + 5 + i * 2) & 0xff
            val tt = bytes(pos + 6 + i * 2) & 0xff
            val c = comps.find(_.id == cid).getOrElse(
              throw new IllegalArgumentException(s"JPEG: scan references unknown component $cid"))
            c.dcTable = tt >> 4; c.acTable = tt & 0xf
          }
          scanAt = pos + 2 + len
        case 0xd9 => throw new IllegalArgumentException("JPEG: EOI before SOS")
        case _ => () // APPn, COM, ... skip
      }
      if (scanAt < 0) pos += 2 + len
    }
    require(w > 0 && h > 0, "JPEG missing SOF")
    // footprint budget 8 bytes/pixel: MCU-padded component planes (<=3x),
    // full-res upsampled planes (3x), RGB output (3x) — all Long-checked so
    // a hostile 65535x65535 SOF throws instead of Int-overflowing the
    // allocation (65535^2 > Int.MaxValue) or OOMing the executor task
    Image.checkDims("jpeg", w, h, 8)
    val hMax = comps.map(_.hs).max
    val vMax = comps.map(_.vs).max
    val mcuW = 8 * hMax
    val mcuH = 8 * vMax
    val mcusX = (w + mcuW - 1) / mcuW
    val mcusY = (h + mcuH - 1) / mcuH
    // per-component plane at its own resolution
    val planeW = comps.map(c => mcusX * c.hs * 8)
    val planeH = comps.map(c => mcusY * c.vs * 8)
    val planes = comps.indices.map(i => new Array[Byte](planeW(i) * planeH(i))).toArray
    val br = new BitReader(bytes, scanAt)
    val prevDc = new Array[Int](comps.length)
    var mcu = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          br.align()
          // expect RSTn marker
          require(br.pos + 1 < bytes.length && (bytes(br.pos) & 0xff) == 0xff &&
            (bytes(br.pos + 1) & 0xf8) == 0xd0, "JPEG: missing restart marker")
          br.pos += 2
          br.sawMarker = false
          java.util.Arrays.fill(prevDc, 0)
        }
        var ci = 0
        while (ci < comps.length) {
          val c = comps(ci)
          val q = qTables(c.tq)
          require(q != null, s"JPEG: missing quant table ${c.tq}")
          var by = 0
          while (by < c.vs) {
            var bx = 0
            while (bx < c.hs) {
              val coef = new Array[Int](64)
              val dcCat = decodeHuff(br, dcTables(c.dcTable))
              prevDc(ci) += extend(br.bits(dcCat), dcCat)
              coef(0) = prevDc(ci) * q(0)
              var k = 1
              while (k < 64) {
                val rs = decodeHuff(br, acTables(c.acTable))
                val r = rs >> 4; val s = rs & 0xf
                if (s == 0) {
                  if (r == 15) k += 16 else k = 64 // ZRL / EOB
                } else {
                  k += r
                  require(k < 64, "JPEG: AC coefficient index overflow")
                  coef(Zigzag(k)) = extend(br.bits(s), s) * q(Zigzag(k))
                  k += 1
                }
              }
              val px = idct(coef)
              val ox = (mx * c.hs + bx) * 8
              val oy = (my * c.vs + by) * 8
              var yy = 0
              while (yy < 8) {
                var xx = 0
                while (xx < 8) {
                  planes(ci)((oy + yy) * planeW(ci) + ox + xx) =
                    clamp255(px(yy * 8 + xx) + 128).toByte
                  xx += 1
                }
                yy += 1
              }
              bx += 1
            }
            by += 1
          }
          ci += 1
        }
        mcu += 1
        mx += 1
      }
      my += 1
    }
    if (comps.length == 1) {
      val out = new Array[Byte](w * h)
      var y = 0
      while (y < h) {
        System.arraycopy(planes(0), y * planeW(0), out, y * w, w)
        y += 1
      }
      Image.Pixmap("jpeg", w, h, 1, out)
    } else {
      // Bring every plane to full resolution with libjpeg-compatible
      // upsampling (jdsample.c): the "fancy" 3:1 triangle filter for 2x
      // horizontal and 2x2, plain replication otherwise — matching what
      // cv2.imdecode / ImageIO produce on subsampled chroma, so decoded
      // pixels interoperate with the reference's decode stack
      // (ImageIoInteropSpec pins this against the JDK's independent codec).
      val full = comps.indices.map { ci =>
        val c = comps(ci)
        val dw = (w * c.hs + hMax - 1) / hMax
        val dh = (h * c.vs + vMax - 1) / vMax
        upsample(planes(ci), planeW(ci), dw, dh, hMax / c.hs, vMax / c.vs, w, h)
      }.toArray
      val out = new Array[Byte](w * h * 3)
      var i = 0
      val n = w * h
      while (i < n) {
        val yv = full(0)(i) & 0xff
        val cb = (full(1)(i) & 0xff) - 128
        val cr = (full(2)(i) & 0xff) - 128
        val d = i * 3
        out(d) = clamp255(math.rint(yv + 1.402 * cr).toInt).toByte
        out(d + 1) = clamp255(math.rint(yv - 0.344136 * cb - 0.714136 * cr).toInt).toByte
        out(d + 2) = clamp255(math.rint(yv + 1.772 * cb).toInt).toByte
        i += 1
      }
      Image.Pixmap("jpeg", w, h, 3, out)
    }
  }

  /** Upsample one component plane (valid region `dw`x`dh` inside an
    * MCU-padded array of row stride `stride`) to `outW`x`outH`, with the
    * expansion factors libjpeg supports per axis (1 or 2 here).
    *
    * Filter choice mirrors jdsample.c's selection: 2x-horizontal and 2x2
    * get the "fancy" triangle filter (3/4 nearer + 1/4 further, with
    * libjpeg's exact edge handling and rounding constants), every other
    * ratio gets plain pixel replication (int_upsample).
    */
  private def upsample(plane: Array[Byte], stride: Int, dw: Int, dh: Int,
                       fx: Int, fy: Int, outW: Int, outH: Int): Array[Byte] = {
    val out = new Array[Byte](outW * outH)
    if (fx == 1 && fy == 1) {
      var y = 0
      while (y < outH) {
        System.arraycopy(plane, y * stride, out, y * outW, outW); y += 1
      }
    } else if (fx == 2 && fy == 2) {
      // h2v2_fancy_upsample: vertical 3:1 column sums (nearer row weight 3,
      // further row weight 1, edge rows replicated), then the horizontal
      // triangle over the sums with 1/16 rounding.
      val colsum = new Array[Int](dw)
      var oy = 0
      while (oy < outH) {
        val r0 = oy >> 1
        val r1 = if ((oy & 1) == 0) math.max(r0 - 1, 0) else math.min(r0 + 1, dh - 1)
        var cx = 0
        while (cx < dw) {
          colsum(cx) = (plane(r0 * stride + cx) & 0xff) * 3 + (plane(r1 * stride + cx) & 0xff)
          cx += 1
        }
        val row = oy * outW
        cx = 0
        while (cx < dw) {
          val t = colsum(cx)
          if (2 * cx < outW) {
            val e = if (cx == 0) (t * 4 + 8) >> 4 else (t * 3 + colsum(cx - 1) + 8) >> 4
            out(row + 2 * cx) = e.toByte
          }
          if (2 * cx + 1 < outW) {
            val o = if (cx == dw - 1) (t * 4 + 7) >> 4 else (t * 3 + colsum(cx + 1) + 7) >> 4
            out(row + 2 * cx + 1) = o.toByte
          }
          cx += 1
        }
        oy += 1
      }
    } else if (fx == 2 && fy == 1) {
      // h2v1_fancy_upsample: horizontal triangle, edge columns copied.
      var y = 0
      while (y < outH) {
        val in = y * stride
        val row = y * outW
        var cx = 0
        while (cx < dw) {
          val t = plane(in + cx) & 0xff
          if (2 * cx < outW) {
            val e = if (cx == 0) t else (t * 3 + (plane(in + cx - 1) & 0xff) + 1) >> 2
            out(row + 2 * cx) = e.toByte
          }
          if (2 * cx + 1 < outW) {
            val o = if (cx == dw - 1) t else (t * 3 + (plane(in + cx + 1) & 0xff) + 2) >> 2
            out(row + 2 * cx + 1) = o.toByte
          }
          cx += 1
        }
        y += 1
      }
    } else {
      // int_upsample: plain replication (libjpeg has no fancy v-only path).
      var y = 0
      while (y < outH) {
        val sy = math.min(y / fy, dh - 1)
        var x = 0
        while (x < outW) {
          out(y * outW + x) = plane(sy * stride + math.min(x / fx, dw - 1))
          x += 1
        }
        y += 1
      }
    }
    out
  }
}
