package graft.kernel

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.GenData

/** PDF kernel gates: a golden hand-authored file (escapes, octal, hex
  * strings, TJ arrays, multi-page /Kids order), Flate round-trip, structural
  * error rejection, and the generator round-trip property px1's driver
  * oracle rests on.
  */
class PdfSpec extends AnyFunSuite {

  private def rawPdf(streams: (String, Boolean)*): Array[Byte] = Pdf.write(streams)

  test("golden: escapes, octal, hex strings, TJ kerning, show-op order") {
    val cs =
      """BT /F1 12 Tf 72 720 Td
        |(paren \( inside \) and backslash \\ ok) Tj
        |0 -14 Td
        |[(kern) -120 (ed to)] TJ
        |(\164\141il) Tj
        |<20686578> Tj
        |ET""".stripMargin
    val got = Pdf.extractText(rawPdf((cs, false)))
    assert(got == "paren ( inside ) and backslash \\ okkerned totail hex", s"got [$got]")
  }

  test("golden: line continuation and unknown escape") {
    val cs = "BT (split \\\nline) Tj (esc\\q) Tj ET"
    assert(Pdf.extractText(rawPdf((cs, false))) == "split lineescq")
  }

  test("multi-page: /Kids order wins, mixed compressed and raw streams") {
    val p1 = "BT (page one ) Tj ET"
    val p2 = "BT (then two ) Tj ET"
    val p3 = "BT (and three) Tj ET"
    val got = Pdf.extractText(rawPdf((p1, true), (p2, false), (p3, true)))
    assert(got == "page one then two and three")
  }

  test("non-show operators clear their string operands") {
    // a string consumed by a non-show operator (e.g. a tag in BDC) must not leak
    val cs = "BT /Span (leaked) BDC (shown) Tj EMC ET"
    assert(Pdf.extractText(rawPdf((cs, false))) == "shown")
  }

  test("structural errors are rejected, not mis-parsed") {
    assertThrows[IllegalArgumentException](Pdf.extractText("not a pdf".getBytes))
    val ok = rawPdf(("BT (x) Tj ET", true))
    val truncated = java.util.Arrays.copyOfRange(ok, 0, ok.length / 2)
    assertThrows[Exception](Pdf.extractText(truncated))
  }

  test("generator round-trip: extractText(pdfPayload(text)) == text, exactly (px1 oracle)") {
    val rng = new scala.util.Random(13L)
    val alphabet = "abcdefgh ijkl mno pq rst uvw xyz ()\\ "
    (0 until 300).foreach { i =>
      val text =
        if (i == 0) ""
        else if (i == 1) "()"
        else (0 until (1 + rng.nextInt(400))).map(_ => alphabet(rng.nextInt(alphabet.length))).mkString
      val pdf = GenData.pdfPayload(GenData.DefaultSeed, i.toLong, text)
      val got = Pdf.extractText(pdf)
      assert(got == text,
        s"doc $i: round-trip diverged\n text=[${text.take(80)}]\n got =[${got.take(80)}]")
    }
  }

  test("generated files are real PDFs: header, xref offsets, compression present") {
    val pdf = GenData.pdfPayload(GenData.DefaultSeed, 5L, "alpha beta gamma " * 20)
    val s = new String(pdf, java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(s.startsWith("%PDF-1.4"))
    // startxref points at the literal 'xref' keyword
    val sx = s.substring(s.lastIndexOf("startxref") + 9).trim.takeWhile(_.isDigit).toInt
    assert(s.startsWith("xref", sx), "startxref offset must land on the xref table")
    // every xref entry offset lands on 'N 0 obj' (skip 'xref', the
    // subsection line, and the object-0 free entry)
    val offs = s.substring(sx).linesIterator.drop(3).toSeq
      .takeWhile(_.endsWith("n ")).map(_.take(10).toInt)
    offs.zipWithIndex.foreach { case (off, i) =>
      assert(s.startsWith(s"${i + 1} 0 obj", off), s"xref entry ${i + 1} off $off misses object")
    }
    // at least one generated doc uses FlateDecode
    assert((0 until 20).exists { d =>
      new String(GenData.pdfPayload(GenData.DefaultSeed, d.toLong, "some text here"),
        java.nio.charset.StandardCharsets.ISO_8859_1).contains("/FlateDecode")
    })
  }
}
