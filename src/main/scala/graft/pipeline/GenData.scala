package graft.pipeline

import graft.kernel.{Html, Image, Jpeg, Payload, Pdf, SplitMix64}
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
    * scene serialized as an actual raster file — 24-bit BMP (gray replicated
    * to RGB), binary PGM, binary PPM, zlib-compressed PNG (gray or RGB), or
    * baseline JPEG (gray or 4:4:4 color), chosen per ref — that
    * graft.kernel.Image genuinely parses byte-by-byte (headers, row padding,
    * bottom-up order, inflate + unfilter + CRC for PNG, Huffman + IDCT +
    * YCbCr for JPEG). Keyed independently of the doc PRNG like payload(), so
    * any row reproduces in isolation. JPEG being lossy, consumers must treat
    * the DECODED pixels as ground truth (both mm2 paths decode the same
    * bytes, so the oracle compare is unaffected).
    */
  def imagePayload(seed: Long, mediaRef: String): Array[Byte] = {
    val rng = SplitMix64.forKey(seed, "image:" + mediaRef)
    val (w, h, cells) = stdCells(rng)
    def rgb: Array[Byte] = {
      val out = new Array[Byte](w * h * 3)
      var i = 0
      while (i < cells.length) {
        out(i * 3) = cells(i); out(i * 3 + 1) = cells(i); out(i * 3 + 2) = cells(i)
        i += 1
      }
      out
    }
    rng.nextInt(7) match {
      case 0 => Image.encodePgm(w, h, cells)
      case 1 => Image.encodeBmp24(w, h, rgb)
      case 2 => Image.encodePpm(w, h, rgb)
      case 3 => Image.encodePng(w, h, 1, cells)
      case 4 => Image.encodePng(w, h, 3, rgb)
      case 5 => Jpeg.encode(w, h, 1, cells)
      case _ => Jpeg.encode(w, h, 3, rgb)
    }
  }

  /** Near-duplicate image payload for one media_ref (mm6): refs with the
    * same `id / 3` share ONE blob scene (keyed "pdup:<group>", so every
    * variant regenerates it identically anywhere), and the three variants
    * differ only in ways a crawl actually delivers the same picture —
    * container re-encode (PGM vs PNG vs BMP; completely different bytes,
    * identical decoded pixels) and a uniform +1 re-exposure on the PNG
    * variant (every sample shifted, max cell is 254 so nothing clamps).
    * Both perturbations leave [[graft.kernel.Phash]] bit-identical BY
    * CONSTRUCTION (integer block means + integer centering), while byte
    * hashes differ — exactly the gap perceptual dedup exists to close.
    * JPEG is deliberately absent: a lossy round-trip re-quantizes per
    * block, which needs hamming-tolerance matching, not exact grouping.
    */
  def nearDupImagePayload(seed: Long, mediaRef: String): Array[Byte] = {
    val id = mediaRef.substring(mediaRef.lastIndexOf('-') + 1).toLong
    val rng = SplitMix64.forKey(seed, "pdup:" + (id / 3))
    val (w, h, cells) = stdCells(rng)
    (id % 3).toInt match {
      case 0 => Image.encodePgm(w, h, cells)
      case 1 =>
        val shifted = new Array[Byte](cells.length)
        var i = 0
        while (i < cells.length) { shifted(i) = ((cells(i) & 0xff) + 1).toByte; i += 1 }
        Image.encodePng(w, h, 1, shifted)
      case _ =>
        val rgb = new Array[Byte](w * h * 3)
        var i = 0
        while (i < cells.length) {
          rgb(i * 3) = cells(i); rgb(i * 3 + 1) = cells(i); rgb(i * 3 + 2) = cells(i)
          i += 1
        }
        Image.encodeBmp24(w, h, rgb)
    }
  }

  /** Hamming-near-dup image payload for one media_ref (mm7): refs with the
    * same `id / 4` share ONE blob scene (keyed "hdup:<group>"); variants 0-2
    * are mm6's exact-phash dup classes (PGM, +1-exposure PNG, BMP re-encode),
    * and variant 3 is the lossy class mm6 documents as out of scope: a
    * baseline-JPEG round trip of the same scene. JPEG re-quantizes per 8×8
    * block, so decoded pixels move slightly and the DCT phash lands a FEW
    * bits from the group's — within mm7's banding radius (pinned empirically
    * at the fixed seed by PhashSpec), never exactly on it. Exact-equality
    * grouping (mm6) structurally misses this variant; Hamming-banded
    * matching recovers it.
    */
  def hammingDupImagePayload(seed: Long, mediaRef: String): Array[Byte] = {
    val id = mediaRef.substring(mediaRef.lastIndexOf('-') + 1).toLong
    val rng = SplitMix64.forKey(seed, "hdup:" + (id / 4))
    val (w, h, cells) = stdCells(rng)
    def rgb: Array[Byte] = {
      val out = new Array[Byte](w * h * 3)
      var i = 0
      while (i < cells.length) {
        out(i * 3) = cells(i); out(i * 3 + 1) = cells(i); out(i * 3 + 2) = cells(i)
        i += 1
      }
      out
    }
    (id % 4).toInt match {
      case 0 => Image.encodePgm(w, h, cells)
      case 1 =>
        val shifted = new Array[Byte](cells.length)
        var i = 0
        while (i < cells.length) { shifted(i) = ((cells(i) & 0xff) + 1).toByte; i += 1 }
        Image.encodePng(w, h, 1, shifted)
      case 2 => Image.encodeBmp24(w, h, rgb)
      case _ => Jpeg.encode(w, h, 1, cells)
    }
  }

  /** Ingestion-grade payload mix for one media_ref (mm4): mostly valid
    * [[imagePayload]] files, with a deterministic ~25% corrupted in four
    * distinct ways a 10^12-document crawl actually delivers — truncation
    * (partial fetch), zeroed magic (content-type lies), a single flipped
    * byte mid-file (bit-rot; may or may not violate the format, e.g. a BMP
    * pixel flip decodes fine with different pixels while a PNG flip trips
    * the CRC), and a hostile header claiming 65535x65535 from a few bytes
    * (decode-bomb). Keyed independently per ref, so the same ref corrupts
    * identically on any executor and in the sequential oracle.
    */
  def mixedPayload(seed: Long, mediaRef: String): Array[Byte] = {
    val base = imagePayload(seed, mediaRef)
    val rng = SplitMix64.forKey(seed, "mix:" + mediaRef)
    rng.nextInt(16) match {
      case 0 => java.util.Arrays.copyOf(base, math.max(2, (base.length * 3) / 5))
      case 1 => val b = base.clone(); b(0) = 0; b(1) = 0; b
      case 2 => val b = base.clone(); b(b.length / 2) = (b(b.length / 2) ^ 0x55).toByte; b
      case 3 => "P5 65535 65535 255\n ".getBytes("US-ASCII")
      case _ => base
    }
  }

  /** Deterministic HTML page around a document's text (hx1): the text is cut
    * into consecutive chunks (split points in CHARACTER space, so chunk
    * concatenation is byte-exact), each chunk escaped into one `<p>` (some
    * with a short inline `<a>` whose anchor text is part of the chunk), the
    * whole article wrapped in realistic boilerplate the extractor must
    * strip: doctype, head (title/style/script raw-text with markup-looking
    * characters), nav + promo + related-links blocks (link density ~1),
    * footer with entities, comments, attribute soup. Recovering
    * `documents.text` exactly from this page is hx1's oracle.
    */
  def htmlPayload(seed: Long, docId: Long, text: String): String = {
    val rng = SplitMix64.forKey(seed, "html:" + docId)
    def word() = words(rng.nextInt(words.length))
    def links(n: Int, sep: String): String =
      (0 until n).map(_ => s"""<a href="/${word()}/${rng.nextInt(100)}">${word()}</a>""")
        .mkString(sep)
    // consecutive character-space cuts — concat(chunks) == text by
    // construction (cuts are distinct, so every chunk is non-empty; the
    // extractor keeps whitespace-only blocks, so even all-space chunks
    // survive the round trip)
    val nChunks = 1 + rng.nextInt(6)
    val cuts = (Seq.fill(math.max(0, nChunks - 1))(
      if (text.isEmpty) 0 else rng.nextInt(text.length)) :+ 0 :+ text.length)
      .distinct.sorted
    val chunks = cuts.zip(cuts.tail).map { case (a, b) => text.substring(a, b) }
    val paras = chunks.map { c =>
      // ~1/3 of long chunks carry a short inline link whose ANCHOR TEXT IS
      // PART OF THE CHUNK (split pre|mid|post): kept blocks keep anchor
      // text, so recovery stays exact while link-density math is exercised
      if (c.length >= 30 && rng.nextInt(3) == 0) {
        val midLen = 3 + rng.nextInt(5)
        val at = rng.nextInt(c.length - midLen)
        val (pre, rest) = c.splitAt(at)
        val (mid, post) = rest.splitAt(midLen)
        s"""<p class="${word()}">${Html.escape(pre)}<a href="#${word()}">${Html.escape(mid)}</a>${Html.escape(post)}</p>"""
      } else s"<p>${Html.escape(c)}</p>"
    }.mkString("\n")
    // no glue newlines around an EMPTY paragraph list: they would make the
    // container itself a (whitespace-only) leaf block and break "" recovery
    val body = if (paras.isEmpty) "" else s"\n$paras\n"
    val container = rng.nextInt(3) match {
      case 0 => s"""<article id="main">$body</article>"""
      case 1 => s"""<div class="post-body entry">$body</div>"""
      case _ => s"""<section data-role="content">$body</section>"""
    }
    s"""<!DOCTYPE html>
<html lang="en">
<head>
<title>${word()} ${word()} &mdash; ${word()}</title>
<style>p { margin: 0; } a > span { color: #ff0000; } /* if (x<y) */</style>
<script>var q = 1 < 2 && "a" > "&"; // <p>not a tag</p>
document.write("<div>" + q + "</div>");</script>
<meta charset="utf-8">
</head>
<body>
<header><h1>${word()} ${word()}</h1><div class="tagline">${word()} &amp; ${word()}</div></header>
<nav><ul>${(0 until 3 + rng.nextInt(5)).map(_ => s"<li>${links(1, "")}</li>").mkString}</ul></nav>
<!-- ad slot ${rng.nextInt(1000)} -->
<div class="promo">${links(2 + rng.nextInt(3), " &#8226; ")}</div>
$container
<div class="related"><ul>${(0 until 2 + rng.nextInt(4)).map(_ => s"<li>${links(1, "")}</li>").mkString}</ul></div>
<footer><p>&copy; ${1990 + rng.nextInt(36)} ${word()} &mdash; <a href="/about">${word()}</a> &#183; <a href="/tos">${word()}</a></p></footer>
</body>
</html>"""
  }

  /** Deterministic PDF around a document's text (px1): consecutive
    * character-space chunks (concat == text, as in htmlPayload) distributed
    * over 1-2 pages; each chunk is shown by a literal-string `Tj`, a
    * kerning-split `TJ` array, or a hex-string `Tj`, between real
    * positioning operators; ~half the content streams are genuinely
    * Flate-compressed. The file is a complete PDF (header, page tree, font,
    * xref with correct offsets) that Pdf.extractText must walk — recovering
    * `documents.text` exactly is px1's oracle.
    */
  def pdfPayload(seed: Long, docId: Long, text: String): Array[Byte] = {
    val rng = SplitMix64.forKey(seed, "pdf:" + docId)
    val nChunks = 1 + rng.nextInt(8)
    val cuts = (Seq.fill(math.max(0, nChunks - 1))(
      if (text.isEmpty) 0 else rng.nextInt(text.length)) :+ 0 :+ text.length)
      .distinct.sorted
    val chunks = cuts.zip(cuts.tail).map { case (a, b) => text.substring(a, b) }
    val nPages = 1 + rng.nextInt(2)
    val perPage = math.max(1, (chunks.size + nPages - 1) / nPages)
    val streams = chunks.grouped(perPage).map { chs =>
      val ops = chs.map { c =>
        rng.nextInt(4) match {
          case 0 if c.length >= 4 =>
            // TJ with kerning numbers: sub-strings must concatenate exactly
            val mid = 1 + rng.nextInt(c.length - 1)
            val (a, b) = c.splitAt(mid)
            s"[(${Pdf.escapeString(a)}) ${-20 - rng.nextInt(300)} (${Pdf.escapeString(b)})] TJ"
          case 1 if c.forall(_ < 256) =>
            "<" + c.map(ch => f"${ch.toInt}%02x").mkString + "> Tj"
          case _ =>
            s"(${Pdf.escapeString(c)}) Tj"
        }
      }
      val body = "BT /F1 12 Tf 72 720 Td\n" + ops.mkString("\n0 -14 Td\n") + "\nET"
      (body, rng.nextInt(2) == 0)
    }.toSeq
    Pdf.write(streams)
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
