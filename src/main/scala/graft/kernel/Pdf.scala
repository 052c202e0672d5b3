package graft.kernel

import scala.collection.mutable.ArrayBuffer

/** PDF parse — the north rule's "PDF/layout parse" surface as a
  * deterministic kernel over REAL PDF files (ISO 32000-1 subset): body
  * objects (`N G obj … endobj`), literal streams with direct /Length,
  * /FlateDecode decompression (`java.util.zip.Inflater` — same pure-JDK
  * zlib as the PNG path), document-structure traversal
  * trailer → /Root → /Pages → /Kids → /Contents (single ref or array), and
  * a content-stream tokenizer that accumulates text in operator order from
  * `Tj`, `'`, `"` and `TJ` show operators, with full literal-string escape
  * handling (\\ \( \) \n \r \t \b \f, octal \ooo, line continuations) and
  * hex strings.
  *
  * Determinism contract: text chunks shown in content-stream order
  * concatenate exactly (no layout-driven reordering, no inserted spaces), so
  * a generator that splits a source text into consecutive chunks and emits
  * one show-op per chunk gets the ORIGINAL text back byte-for-byte — the
  * oracle for px1 is plain `md5(documents.text)`.
  */
object Pdf {

  /** Extract all shown text from a PDF, pages in /Kids order, operators in
    * content-stream order.
    */
  def extractText(bytes: Array[Byte]): String = {
    val s = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    require(s.startsWith("%PDF-"), "not a PDF: missing %PDF- header")
    val objects = scanObjects(s, bytes)
    val trailerAt = s.lastIndexOf("trailer")
    require(trailerAt >= 0, "PDF missing trailer")
    val rootRef = ref(s.substring(trailerAt), "/Root")
      .getOrElse(throw new IllegalArgumentException("trailer missing /Root"))
    val catalog = objects.getOrElse(rootRef,
      throw new IllegalArgumentException(s"missing catalog object $rootRef"))._1
    val pagesRef = ref(catalog, "/Pages")
      .getOrElse(throw new IllegalArgumentException("catalog missing /Pages"))
    val out = new StringBuilder
    def walkPages(r: Int): Unit = {
      val dict = objects.getOrElse(r,
        throw new IllegalArgumentException(s"missing pages object $r"))._1
      if (dict.contains("/Kids")) refArray(dict, "/Kids").foreach(walkPages)
      else contentRefs(dict).foreach { cr =>
        val (cdict, body) = objects.getOrElse(cr,
          throw new IllegalArgumentException(s"missing content object $cr"))
        val stream = body.getOrElse(
          throw new IllegalArgumentException(s"content object $cr has no stream"))
        val data = if (cdict.contains("/FlateDecode")) inflate(stream) else stream
        out.append(showText(new String(data, java.nio.charset.StandardCharsets.ISO_8859_1)))
      }
    }
    walkPages(pagesRef)
    out.toString
  }

  // ------------------------------------------------------------ body objects

  /** objNum → (dict-prefix string, stream bytes if present). Objects are
    * located by scanning `N 0 obj` slots (generation 0); stream payload uses
    * the dict's direct /Length — byte-exact, binary-safe.
    */
  private[kernel] def scanObjects(s: String, bytes: Array[Byte]): Map[Int, (String, Option[Array[Byte]])] = {
    val out = Map.newBuilder[Int, (String, Option[Array[Byte]])]
    val pat = java.util.regex.Pattern.compile("""(?m)^(\d+) 0 obj\b""")
    val m = pat.matcher(s)
    while (m.find()) {
      val num = m.group(1).toInt
      val end = s.indexOf("endobj", m.end())
      require(end >= 0, s"object $num missing endobj")
      val streamAt = s.indexOf("stream", m.end())
      if (streamAt >= 0 && streamAt < end) {
        val dict = s.substring(m.end(), streamAt)
        val len = num1(dict, "/Length").getOrElse(
          throw new IllegalArgumentException(s"object $num stream without direct /Length"))
        // stream keyword is followed by CRLF or LF (ISO 32000-1 §7.3.8.1)
        var dataStart = streamAt + "stream".length
        if (dataStart < s.length && s.charAt(dataStart) == '\r') dataStart += 1
        if (dataStart < s.length && s.charAt(dataStart) == '\n') dataStart += 1
        out += num -> (dict, Some(java.util.Arrays.copyOfRange(bytes, dataStart, dataStart + len)))
      } else {
        out += num -> (s.substring(m.end(), end), None)
      }
    }
    out.result()
  }

  private def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(data)
    val buf = new Array[Byte](math.max(1024, data.length * 4))
    val out = new java.io.ByteArrayOutputStream()
    while (!inf.finished()) {
      val n = inf.inflate(buf)
      require(n > 0 || inf.finished(), "FlateDecode stream stalled (truncated?)")
      out.write(buf, 0, n)
    }
    inf.end()
    out.toByteArray
  }

  // -------------------------------------------------------- dict value reads

  /** First `<key> <int>` in a dict string. */
  private def num1(dict: String, key: String): Option[Int] = {
    val at = dict.indexOf(key)
    if (at < 0) None
    else {
      val m = java.util.regex.Pattern.compile("""\s*(\d+)""")
        .matcher(dict).region(at + key.length, dict.length)
      if (m.lookingAt()) Some(m.group(1).toInt) else None
    }
  }

  /** `<key> N 0 R` indirect reference. */
  private def ref(dict: String, key: String): Option[Int] = {
    val at = dict.indexOf(key)
    if (at < 0) None
    else {
      val m = java.util.regex.Pattern.compile("""\s*(\d+)\s+\d+\s+R""")
        .matcher(dict).region(at + key.length, dict.length)
      if (m.lookingAt()) Some(m.group(1).toInt) else None
    }
  }

  /** `<key> [N 0 R M 0 R …]` reference array, in order. */
  private def refArray(dict: String, key: String): Seq[Int] = {
    val at = dict.indexOf(key)
    if (at < 0) Nil
    else {
      val open = dict.indexOf('[', at)
      val close = dict.indexOf(']', open)
      require(open >= 0 && close > open, s"$key: malformed array")
      val body = dict.substring(open + 1, close)
      val m = java.util.regex.Pattern.compile("""(\d+)\s+\d+\s+R""").matcher(body)
      val acc = ArrayBuffer[Int]()
      while (m.find()) acc += m.group(1).toInt
      acc.toSeq
    }
  }

  /** /Contents: single `N 0 R` or an array of refs. */
  private[kernel] def contentRefs(pageDict: String): Seq[Int] = {
    val at = pageDict.indexOf("/Contents")
    if (at < 0) Nil
    else {
      val after = pageDict.substring(at + "/Contents".length)
      val trimmed = after.dropWhile(_.isWhitespace)
      if (trimmed.startsWith("[")) refArray(pageDict, "/Contents")
      else ref(pageDict, "/Contents").toSeq
    }
  }

  // -------------------------------------------------- content stream scanner

  /** Accumulate shown text in operator order: literal/hex strings are pushed
    * on encounter; `Tj`, `'`, `"` show the last string; `TJ` shows every
    * string in its array (kerning numbers skipped). Other operators and
    * operands are structural no-ops for extraction.
    */
  private[kernel] def showText(cs: String): String = {
    val out = new StringBuilder
    var pending: ArrayBuffer[String] = ArrayBuffer()
    var inArray = false
    var i = 0
    val n = cs.length
    while (i < n) {
      val c = cs.charAt(i)
      if (c == '(') {
        val (str, next) = literalString(cs, i)
        pending += str
        i = next
      } else if (c == '<' && i + 1 < n && cs.charAt(i + 1) != '<') {
        val close = cs.indexOf('>', i + 1)
        require(close > i, "unterminated hex string")
        val hex = cs.substring(i + 1, close).filterNot(_.isWhitespace)
        val padded = if (hex.length % 2 == 1) hex + "0" else hex
        val sb = new StringBuilder
        padded.grouped(2).foreach(h => sb.append(Integer.parseInt(h, 16).toChar))
        pending += sb.toString
        i = close + 1
      } else if (c == '[') { inArray = true; pending.clear(); i += 1 }
      else if (c == ']') { inArray = false; i += 1 }
      else if (c == 'T' && i + 1 < n && cs.charAt(i + 1) == 'J') {
        pending.foreach(out.append); pending.clear(); i += 2
      } else if (c == 'T' && i + 1 < n && cs.charAt(i + 1) == 'j') {
        pending.lastOption.foreach(out.append); pending.clear(); i += 2
      } else if ((c == '\'' || c == '"') && !inArray) {
        pending.lastOption.foreach(out.append); pending.clear(); i += 1
      } else if (c.isLetter || c == '/') {
        // a non-show operator (or a /Name operand): it consumed any pending
        // operands; skip the whole token so 'Td' is not re-read as show-'d'
        if (!inArray && c != '/') pending.clear()
        i += 1
        while (i < n && cs.charAt(i).isLetterOrDigit) i += 1
      } else {
        i += 1
      }
    }
    out.toString
  }

  /** Literal string starting at `(`; returns (decoded, index past `)`).
    * Handles nested balanced parens, all escapes of §7.3.4.2 (octal up to 3
    * digits, overflow mod 256), and backslash-EOL line continuation.
    */
  private def literalString(cs: String, start: Int): (String, Int) = {
    val b = new StringBuilder
    var depth = 1
    var i = start + 1
    val n = cs.length
    while (depth > 0) {
      require(i < n, "unterminated literal string")
      val c = cs.charAt(i)
      if (c == '\\') {
        require(i + 1 < n, "dangling escape")
        cs.charAt(i + 1) match {
          case 'n' => b.append('\n'); i += 2
          case 'r' => b.append('\r'); i += 2
          case 't' => b.append('\t'); i += 2
          case 'b' => b.append('\b'); i += 2
          case 'f' => b.append('\f'); i += 2
          case '(' => b.append('('); i += 2
          case ')' => b.append(')'); i += 2
          case '\\' => b.append('\\'); i += 2
          case '\n' => i += 2 // line continuation
          case '\r' => i += (if (i + 2 < n && cs.charAt(i + 2) == '\n') 3 else 2)
          case d if d >= '0' && d <= '7' =>
            var v = 0; var k = 0; i += 1
            while (k < 3 && i < n && cs.charAt(i) >= '0' && cs.charAt(i) <= '7') {
              v = v * 8 + (cs.charAt(i) - '0'); i += 1; k += 1
            }
            b.append((v % 256).toChar)
          case other => b.append(other); i += 2 // unknown escape: char stands
        }
      } else if (c == '(') { depth += 1; b.append(c); i += 1 }
      else if (c == ')') { depth -= 1; if (depth > 0) b.append(c); i += 1 }
      else { b.append(c); i += 1 }
    }
    (b.toString, i)
  }

  // ------------------------------------------------------------------ writer

  /** Escape a chunk for a PDF literal string. */
  def escapeString(s: String): String = {
    val b = new StringBuilder(s.length + 8)
    s.foreach {
      case '\\' => b.append("\\\\")
      case '('  => b.append("\\(")
      case ')'  => b.append("\\)")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case c    => b.append(c)
    }
    b.toString
  }

  /** Write a complete single-xref PDF: catalog, page tree, one page per
    * content stream, Helvetica font, correct byte offsets in the xref and
    * startxref. `streams` are raw content-stream bodies; each is
    * Flate-compressed iff its flag is set (mixed files exercise both paths).
    */
  def write(streams: Seq[(String, Boolean)]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def put(s: String): Unit =
      out.write(s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    val offsets = ArrayBuffer[Int]()
    put("%PDF-1.4\n%âãÏÓ\n")
    val nPages = streams.length
    val fontObj = 3 + 2 * nPages
    def obj(body: => Unit): Unit = { offsets += out.size(); body }
    obj { put(s"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n") }
    val kids = (0 until nPages).map(p => s"${3 + 2 * p} 0 R").mkString(" ")
    obj { put(s"2 0 obj << /Type /Pages /Kids [$kids] /Count $nPages >> endobj\n") }
    streams.zipWithIndex.foreach { case ((body, compress), p) =>
      val pageNum = 3 + 2 * p
      val contNum = pageNum + 1
      obj {
        put(s"$pageNum 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
          s"/Resources << /Font << /F1 $fontObj 0 R >> >> /Contents $contNum 0 R >> endobj\n")
      }
      val raw = body.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
      val data = if (compress) {
        val d = new java.util.zip.Deflater()
        d.setInput(raw); d.finish()
        val buf = new Array[Byte](raw.length + 64)
        val zo = new java.io.ByteArrayOutputStream()
        while (!d.finished()) zo.write(buf, 0, d.deflate(buf))
        d.end()
        zo.toByteArray
      } else raw
      obj {
        val filter = if (compress) " /Filter /FlateDecode" else ""
        put(s"$contNum 0 obj << /Length ${data.length}$filter >> stream\n")
        out.write(data)
        put("\nendstream endobj\n")
      }
    }
    obj {
      put(s"$fontObj 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> endobj\n")
    }
    val xrefAt = out.size()
    val total = offsets.length + 1
    put(s"xref\n0 $total\n0000000000 65535 f \n")
    offsets.foreach(off => put(f"$off%010d 00000 n \n"))
    put(s"trailer << /Size $total /Root 1 0 R >>\nstartxref\n$xrefAt\n%%EOF\n")
    out.toByteArray
  }
}
