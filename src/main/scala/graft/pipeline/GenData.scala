package graft.pipeline

import graft.kernel.{Image, Payload, SplitMix64}
import graft.schema.{Doc, Media, RawSpan, Vocab}

/** Deterministic synthetic document generator (FIXTURES.md §4): a pure function
  * `(seed, docIndex) -> Doc`, with payloads keyed independently by `media_ref`
  * so any row is reproducible in isolation (needed for resume + per-doc oracle).
  * Media counts are heavy-tailed to exercise skew handling at scale.
  */
object GenData {
  final val DefaultSeed = 42L

  /** Generator fingerprint: bump on ANY change to the generated doc/media
    * content or layout. Benchmark input caches embed it in their directory
    * names, so a generator change can never silently reuse a stale
    * pre-written corpus and compare different inputs across rounds.
    */
  final val Fingerprint = "g2"

  private val words = Vector(
    "key", "agg", "row", "scan", "slow", "fast", "table", "value", "part",
    "hash", "merge", "batch", "spark", "line", "sort", "window", "span",
    "media", "text", "block", "title", "figure", "layout", "formula")

  def docId(i: Long): String = f"doc-$i%09d"

  def doc(seed: Long, i: Long): Doc = {
    val id = docId(i)
    val rng = SplitMix64.forKey(seed, id)
    // heavy tail: ~2% of docs are media-heavy (12 spans, mostly media)
    val heavy = rng.nextInt(50) == 0
    val nSpans = if (heavy) 12 else 1 + rng.nextInt(8)
    var mediaK = 0
    val spans = (0 until nSpans).map { off =>
      val isMedia = if (heavy) rng.nextInt(10) < 8 else rng.nextInt(10) < 4
      if (isMedia) {
        val ref = s"m-$id-$mediaK"
        mediaK += 1
        RawSpan("media", "", ref, off)
      } else {
        val n = 3 + rng.nextInt(8)
        val text = Seq.fill(n)(words(rng.nextInt(words.length))).mkString(" ")
        RawSpan("text", text, "", off)
      }
    }
    Doc(id, spans)
  }

  def mediaRefs(d: Doc): Seq[String] = d.spans.collect { case s if s.kind == "media" => s.media_ref }

  /** Payload for one media_ref, independent of the doc PRNG stream. */
  def payload(seed: Long, mediaRef: String): Array[Byte] = {
    val rng = SplitMix64.forKey(seed, "payload:" + mediaRef)
    rng.nextInt(3) match {
      case Vocab.StageStd => stdPayload(rng)
      case stage          => yoloPayload(rng, stage)
    }
  }

  def media(seed: Long, d: Doc): Seq[Media] =
    mediaRefs(d).map(ref => Media(ref, payload(seed, ref)))

  /** STD probability map: blobs on a 4x4 grid. Strong blobs (value >= 235:
    * mean clears box_thresh 0.6 after the +1 ring) survive; weak blobs
    * (value 90..140: above bin_thresh 0.3*255 but mean < 0.6) are
    * score-filtered; tiny 1px blobs are extent-filtered. Occasional bridged
    * blobs merge into one component (CCL path), and stacked blobs exercise
    * sort + dedup.
    */
  private def stdPayload(rng: SplitMix64): Array[Byte] = {
    val (w, h, cells) = stdCells(rng)
    Payload.encodeProbMap(w, h, cells)
  }

  /** The raw blob scene behind stdPayload, reusable as IMAGE pixel content
    * (mm2): probability cells double as 8-bit luma samples.
    */
  private def stdCells(rng: SplitMix64): (Int, Int, Array[Byte]) = {
    val w = 64 + 32 * rng.nextInt(7) // 64..256, /32
    val h = 64 + 32 * rng.nextInt(7)
    val cells = new Array[Byte](w * h)
    val gx = w / 4
    val gy = h / 4
    val nBlobs = if (rng.nextInt(20) == 0) 24 else 1 + rng.nextInt(6)
    var b = 0
    while (b < nBlobs) {
      val cellX = rng.nextInt(4)
      val cellY = rng.nextInt(4)
      val kind = rng.nextInt(10) // 0-6 strong, 7-8 weak, 9 tiny
      val (bw, bh) =
        if (kind == 9) (1, 1)
        else (math.min(8 + rng.nextInt(math.max(1, gx - 10)), gx - 2),
              math.min(8 + rng.nextInt(math.max(1, gy - 10)), gy - 2))
      val x0 = cellX * gx + rng.nextInt(math.max(1, gx - bw))
      val y0 = cellY * gy + rng.nextInt(math.max(1, gy - bh))
      val value = if (kind >= 7 && kind <= 8) (90 + rng.nextInt(50)).toByte else (235 + rng.nextInt(20)).toByte
      var y = y0
      while (y < math.min(y0 + bh, h)) {
        var x = x0
        while (x < math.min(x0 + bw, w)) { cells(y * w + x) = value; x += 1 }
        y += 1
      }
      b += 1
    }
    (w, h, cells)
  }

  /** REAL image-format payload for one media_ref (mm2): the stdCells blob
    * scene serialized as an actual uncompressed raster file — 24-bit BMP
    * (gray replicated to RGB), binary PGM, or binary PPM, chosen per ref —
    * that graft.kernel.Image genuinely parses byte-by-byte (headers, row
    * padding, bottom-up order). Keyed independently of the doc PRNG like
    * payload(), so any row reproduces in isolation.
    */
  def imagePayload(seed: Long, mediaRef: String): Array[Byte] = {
    val rng = SplitMix64.forKey(seed, "image:" + mediaRef)
    val (w, h, cells) = stdCells(rng)
    rng.nextInt(3) match {
      case 0 => Image.encodePgm(w, h, cells)
      case kind =>
        val rgb = new Array[Byte](w * h * 3)
        var i = 0
        while (i < cells.length) {
          rgb(i * 3) = cells(i); rgb(i * 3 + 1) = cells(i); rgb(i * 3 + 2) = cells(i)
          i += 1
        }
        if (kind == 1) Image.encodeBmp24(w, h, rgb) else Image.encodePpm(w, h, rgb)
    }
  }

  /** MFD / layout candidates; ~half of the boxes beyond the first are jittered
    * same-class duplicates of an earlier one so per-class NMS has work to do.
    */
  private def yoloPayload(rng: SplitMix64, stage: Int): Array[Byte] = {
    val w = 320 + 64 * rng.nextInt(11)
    val h = 320 + 64 * rng.nextInt(11)
    val nClasses = if (stage == Vocab.StageMfd) 2 else 10
    val n = 3 + rng.nextInt(10)
    val cands = scala.collection.mutable.ArrayBuffer.empty[Payload.Candidate]
    var i = 0
    while (i < n) {
      if (cands.nonEmpty && rng.nextInt(2) == 0) {
        val base = cands(rng.nextInt(cands.length))
        cands += Payload.Candidate(
          base.cls,
          base.cx + rng.nextInt(9) - 4, base.cy + rng.nextInt(9) - 4,
          base.w + rng.nextInt(7) - 3, base.h + rng.nextInt(7) - 3,
          (0.05f + 0.94f * rng.nextDouble().toFloat))
      } else {
        val cls = if (stage == Vocab.StageMfd) rng.nextInt(nClasses) else 1 + rng.nextInt(nClasses)
        val bw = 20f + rng.nextInt(w / 3)
        val bh = 20f + rng.nextInt(h / 3)
        cands += Payload.Candidate(
          cls,
          bw / 2 + rng.nextInt(math.max(1, (w - bw).toInt)),
          bh / 2 + rng.nextInt(math.max(1, (h - bh).toInt)),
          bw, bh,
          0.05f + 0.94f * rng.nextDouble().toFloat)
      }
      i += 1
    }
    Payload.encodeCandidates(stage, w, h, cands.toSeq)
  }
}
