package graft.kernel

import java.util.Locale
import graft.schema.{OutSpan, RawSpan, Region}

/** Span assembly (J5 in SURVEY.md §2.4): interleave each media span's extracted
  * regions with the document's text spans by original offset, renumbering the
  * final `order` 0..n-1. Text spans pass through; each media span is replaced by
  * its region list in the media-local reading order (empty list drops the media
  * span — empty-result guard, /root/reference/cnstd/yolov7/general.py:625-627).
  */
object Assemble {

  /** Deterministic textual rendering of a region, so span equality on
    * (kind, text, media_ref, order) captures full geometry + score semantics.
    */
  def regionText(r: Region): String =
    "[%d,%d,%d,%d];%.4f".formatLocal(Locale.ROOT, r.x0, r.y0, r.x1, r.y1, r.score)

  def assemble(spans: Seq[RawSpan], regionsByOffset: Map[Int, Seq[Region]]): Seq[OutSpan] = {
    val ordered = spans.sortBy(_.offset)
    val out = ordered.flatMap { s =>
      if (s.kind == "media")
        regionsByOffset.getOrElse(s.offset, Nil).map(r => (r.kind, regionText(r), s.media_ref))
      else
        Seq((s.kind, s.text, ""))
    }
    out.zipWithIndex.map { case ((kind, text, ref), i) => OutSpan(kind, text, ref, i) }
  }
}
