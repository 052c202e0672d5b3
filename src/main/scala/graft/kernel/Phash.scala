package graft.kernel

/** DCT perceptual hash (pHash family) over an 8-bit luma plane — the image
  * near-duplicate fingerprint a web-scale multimodal pipeline keys on (the
  * same picture re-encoded PNG↔BMP↔PPM, or uniformly re-exposed, is the #1
  * image-dup class in a crawl; byte hashes miss every one of them).
  *
  * The computation is specified so the two invariances the pipeline PLANTS
  * are EXACT (bit-equal hashes), not approximate:
  *
  *  1. 32×32 integer block means (index-range partition `floor(i*h/32)`,
  *     integer-division mean) — container changes don't touch decoded pixels,
  *     so this stage is trivially invariant to re-encoding;
  *  2. subtract the integer global mean of the 1024 block means — a uniform
  *     brightness shift of +k moves every block mean by exactly k (integer
  *     sums), so the CENTERED plane is bit-identical and everything
  *     downstream (DCT, median, bits) is too. Without centering, the shift
  *     would survive only up to float summation error in the AC basis rows —
  *     exactly the kind of last-ulp nondeterminism a cross-engine value
  *     check cannot carry.
  *  3. 2D DCT-II (orthonormal, plain O(N³) matrix form — 32³ mults/image),
  *     keep the top-left 8×8 low-frequency block;
  *  4. median = the 32nd-smallest of the 63 non-DC coefficients; bit i set
  *     iff coefficient i > median, row-major (u*8+v) skipping (0,0) —
  *     63 bits in a Long (bit 63 always 0).
  */
object Phash {

  final val Grid = 32
  final val Keep = 8

  private val basis: Array[Array[Double]] = {
    val b = Array.ofDim[Double](Grid, Grid)
    var u = 0
    while (u < Grid) {
      val s = if (u == 0) math.sqrt(1.0 / Grid) else math.sqrt(2.0 / Grid)
      var x = 0
      while (x < Grid) {
        b(u)(x) = s * math.cos(((2 * x + 1) * u * math.Pi) / (2.0 * Grid))
        x += 1
      }
      u += 1
    }
    b
  }

  /** 63-bit perceptual hash of a `w`×`h` luma plane (row-major bytes). */
  def hash(luma: Array[Byte], w: Int, h: Int): Long = {
    require(w > 0 && h > 0 && luma.length >= w * h, s"phash: bad plane $w x $h")
    // integer block means over index-range partitions (exact for any dims)
    val means = new Array[Long](Grid * Grid)
    var by = 0
    while (by < Grid) {
      val y0 = (by.toLong * h / Grid).toInt; val y1 = ((by + 1).toLong * h / Grid).toInt
      var bx = 0
      while (bx < Grid) {
        val x0 = (bx.toLong * w / Grid).toInt; val x1 = ((bx + 1).toLong * w / Grid).toInt
        var sum = 0L; var n = 0L
        var y = y0
        while (y < math.max(y1, y0 + 1) && y < h) {
          var x = x0
          while (x < math.max(x1, x0 + 1) && x < w) {
            sum += (luma(y * w + x) & 0xff); n += 1; x += 1
          }
          y += 1
        }
        means(by * Grid + bx) = if (n == 0) 0L else sum / n
        bx += 1
      }
      by += 1
    }
    // integer centering: a uniform +k shift cancels EXACTLY here
    var tot = 0L
    var i = 0
    while (i < means.length) { tot += means(i); i += 1 }
    val mean = tot / (Grid * Grid)
    val plane = new Array[Double](Grid * Grid)
    i = 0
    while (i < means.length) { plane(i) = (means(i) - mean).toDouble; i += 1 }
    // 2D DCT-II, top-left Keep×Keep block only
    val rows = Array.ofDim[Double](Grid, Keep) // DCT along x, truncated to Keep
    var y = 0
    while (y < Grid) {
      var u = 0
      while (u < Keep) {
        var acc = 0.0; var x = 0
        while (x < Grid) { acc += basis(u)(x) * plane(y * Grid + x); x += 1 }
        rows(y)(u) = acc; u += 1
      }
      y += 1
    }
    val coefs = new Array[Double](Keep * Keep)
    var v = 0
    while (v < Keep) {
      var u = 0
      while (u < Keep) {
        var acc = 0.0; var yy = 0
        while (yy < Grid) { acc += basis(v)(yy) * rows(yy)(u); yy += 1 }
        coefs(v * Keep + u) = acc; u += 1
      }
      v += 1
    }
    val ac = new Array[Double](Keep * Keep - 1)
    System.arraycopy(coefs, 1, ac, 0, Keep * Keep - 1)
    val sorted = ac.clone(); java.util.Arrays.sort(sorted)
    val median = sorted((Keep * Keep - 1) / 2) // 32nd-smallest of 63
    var bits = 0L
    i = 0
    while (i < ac.length) {
      if (ac(i) > median) bits |= (1L << i)
      i += 1
    }
    bits
  }

  /** Hash rendered as fixed-width lowercase hex (portable string key). */
  def hex(bits: Long): String = f"$bits%016x"
}
