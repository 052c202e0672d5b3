package graft.kernel

import scala.collection.mutable.ArrayBuffer

/** HTML boilerplate stripping — the north rule's "HTML boilerplate strip,
  * DOM heuristics" surface as a deterministic kernel: a tag-soup-tolerant
  * parser (void elements, raw-text script/style, comments, unclosed tags)
  * plus an Arc90/Boilerpipe-style main-content extractor (Kohlschütter et
  * al., WSDM'10 "Boilerplate Detection using Shallow Text Features"):
  * semantic boilerplate containers are removed wholesale, remaining LEAF
  * block elements are scored by link density, and low-link-density blocks
  * are emitted verbatim in document order.
  *
  * Determinism contract: text nodes are concatenated exactly as written
  * (entities unescaped, no whitespace normalization), so a generator that
  * splits a source text into consecutive chunks, escapes them, and places
  * each chunk in one kept block gets the ORIGINAL text back byte-for-byte —
  * the oracle for HtmlOps.htmlExtract is plain `md5(documents.text)`.
  */
object Html {

  sealed trait Node
  final case class Elem(tag: String, attrs: Map[String, String],
                        children: Vector[Node]) extends Node
  final case class Text(s: String) extends Node

  /** Elements that never close (HTML5 void elements). */
  private val Void = Set("area", "base", "br", "col", "embed", "hr", "img",
    "input", "link", "meta", "source", "track", "wbr")

  /** Raw-text elements: content runs to the matching close tag, '<' inside
    * is NOT markup (script bodies legally contain `a < b && c > d`).
    */
  private val RawText = Set("script", "style", "textarea", "title")

  /** Containers removed wholesale before scoring: non-content by role. */
  val DroppedTags: Set[String] = Set("script", "style", "noscript", "head",
    "template", "nav", "footer", "header", "aside", "form", "iframe", "button",
    "select", "option", "svg", "figcaption")

  /** Block-level elements — candidates for leaf-block scoring. */
  val BlockTags: Set[String] = Set("html", "body", "div", "article", "section",
    "main", "p", "li", "ul", "ol", "table", "tr", "td", "th", "blockquote",
    "pre", "h1", "h2", "h3", "h4", "h5", "h6", "dl", "dt", "dd", "figure")

  /** A leaf block whose anchor-text fraction exceeds this is boilerplate
    * (link lists, "related articles", ad units). Content paragraphs with an
    * occasional inline link sit far below; nav/promo blocks sit near 1.0.
    */
  val MaxLinkDensity = 0.35

  // ---------------------------------------------------------------- entities

  private val Named = Map("amp" -> "&", "lt" -> "<", "gt" -> ">",
    "quot" -> "\"", "apos" -> "'", "nbsp" -> " ", "copy" -> "©",
    "mdash" -> "—", "hellip" -> "…")

  def escape(s: String): String = {
    val b = new StringBuilder(s.length + 16)
    s.foreach {
      case '&' => b.append("&amp;")
      case '<' => b.append("&lt;")
      case '>' => b.append("&gt;")
      case '"' => b.append("&quot;")
      case c   => b.append(c)
    }
    b.toString
  }

  /** Named (the common set), decimal `&#NN;` and hex `&#xHH;` references;
    * unknown or unterminated references pass through verbatim (browser
    * behavior for text content).
    */
  def unescape(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val b = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c != '&') { b.append(c); i += 1 }
      else {
        val semi = s.indexOf(';', i + 1)
        val body = if (semi > i && semi - i <= 10) s.substring(i + 1, semi) else null
        val rep =
          if (body == null) null
          else if (body.startsWith("#x") || body.startsWith("#X"))
            try Character.toChars(Integer.parseInt(body.drop(2), 16)).mkString
            catch { case _: Exception => null }
          else if (body.startsWith("#"))
            try Character.toChars(Integer.parseInt(body.drop(1), 10)).mkString
            catch { case _: Exception => null }
          else Named.getOrElse(body, null)
        if (rep == null) { b.append('&'); i += 1 }
        else { b.append(rep); i = semi + 1 }
      }
    }
    b.toString
  }

  // ------------------------------------------------------------------ parser

  /** Tag-soup-tolerant parse to a single root. Tolerances: unknown close
    * tags are ignored; a close tag for a non-innermost open element closes
    * everything down to it (misnesting recovery); EOF auto-closes the stack;
    * comments and doctypes are skipped; attribute values may be double-,
    * single-, or un-quoted.
    */
  def parse(html: String): Elem = {
    // (tag, attrs, children-so-far) stack; index 0 is the synthetic root
    val stack = ArrayBuffer[(String, Map[String, String], ArrayBuffer[Node])]()
    stack += (("#root", Map.empty, ArrayBuffer.empty))
    def closeTop(): Unit = {
      val (tag, attrs, kids) = stack.remove(stack.length - 1)
      stack.last._3 += Elem(tag, attrs, kids.toVector)
    }
    var i = 0
    val n = html.length
    while (i < n) {
      val lt = html.indexOf('<', i)
      if (lt < 0) {
        if (i < n) stack.last._3 += Text(unescape(html.substring(i)))
        i = n
      } else {
        if (lt > i) stack.last._3 += Text(unescape(html.substring(i, lt)))
        if (html.startsWith("<!--", lt)) {
          val end = html.indexOf("-->", lt + 4)
          i = if (end < 0) n else end + 3
        } else if (lt + 1 < n && (html.charAt(lt + 1) == '!' || html.charAt(lt + 1) == '?')) {
          val end = html.indexOf('>', lt + 1) // doctype / processing instr
          i = if (end < 0) n else end + 1
        } else if (lt + 1 < n && html.charAt(lt + 1) == '/') {
          val end = html.indexOf('>', lt + 2)
          val name = (if (end < 0) html.substring(lt + 2) else html.substring(lt + 2, end))
            .trim.toLowerCase
          if (stack.exists(_._1 == name)) // misnesting recovery
            while (stack.length > 1 && stack.last._1 != name) closeTop()
          if (stack.length > 1 && stack.last._1 == name) closeTop()
          i = if (end < 0) n else end + 1
        } else {
          val (name, attrs, selfClosed, after) = parseTag(html, lt)
          if (name.isEmpty) { // stray '<' — literal text, browser-style
            stack.last._3 += Text("<")
            i = lt + 1
          } else if (RawText(name) && !selfClosed) {
            val closeAt = html.toLowerCase.indexOf(s"</$name", after)
            val bodyEnd = if (closeAt < 0) n else closeAt
            val raw = html.substring(after, bodyEnd)
            stack.last._3 += Elem(name, attrs, Vector(Text(raw)))
            val gtAfter = html.indexOf('>', bodyEnd)
            i = if (closeAt < 0 || gtAfter < 0) n else gtAfter + 1
          } else if (Void(name) || selfClosed) {
            stack.last._3 += Elem(name, attrs, Vector.empty)
            i = after
          } else {
            stack += ((name, attrs, ArrayBuffer.empty))
            i = after
          }
        }
      }
    }
    while (stack.length > 1) closeTop() // EOF auto-close
    Elem("#root", Map.empty, stack.head._3.toVector)
  }

  /** Parse one open tag starting at `<`; returns (name, attrs, selfClosed,
    * index just past '>'). Empty name signals "not a tag".
    */
  private def parseTag(html: String, lt: Int): (String, Map[String, String], Boolean, Int) = {
    var i = lt + 1
    val n = html.length
    val nameStart = i
    while (i < n && (html.charAt(i).isLetterOrDigit || html.charAt(i) == '-')) i += 1
    if (i == nameStart) return ("", Map.empty, false, lt + 1)
    val name = html.substring(nameStart, i).toLowerCase
    val attrs = Map.newBuilder[String, String]
    var selfClosed = false
    var done = false
    while (!done && i < n) {
      while (i < n && html.charAt(i).isWhitespace) i += 1
      if (i < n && html.charAt(i) == '>') { i += 1; done = true }
      else if (i + 1 < n && html.charAt(i) == '/' && html.charAt(i + 1) == '>') {
        selfClosed = true; i += 2; done = true
      } else if (i < n) {
        val as = i
        while (i < n && !html.charAt(i).isWhitespace &&
               html.charAt(i) != '=' && html.charAt(i) != '>' && html.charAt(i) != '/') i += 1
        val aname = html.substring(as, i).toLowerCase
        while (i < n && html.charAt(i).isWhitespace) i += 1
        if (i < n && html.charAt(i) == '=') {
          i += 1
          while (i < n && html.charAt(i).isWhitespace) i += 1
          if (i < n && (html.charAt(i) == '"' || html.charAt(i) == '\'')) {
            val q = html.charAt(i)
            val vEnd = html.indexOf(q, i + 1)
            val v = if (vEnd < 0) html.substring(i + 1) else html.substring(i + 1, vEnd)
            attrs += aname -> unescape(v)
            i = if (vEnd < 0) n else vEnd + 1
          } else {
            val vs = i
            while (i < n && !html.charAt(i).isWhitespace && html.charAt(i) != '>') i += 1
            attrs += aname -> unescape(html.substring(vs, i))
          }
        } else if (aname.nonEmpty) attrs += aname -> ""
        else i += 1 // lone '/' not followed by '>': skip
      }
    }
    (name, attrs.result(), selfClosed, i)
  }

  // ------------------------------------------------------- content extraction

  private def allText(n: Node): String = n match {
    case Text(s)           => s
    case Elem(_, _, kids)  => kids.map(allText).mkString
  }

  private def linkText(n: Node): String = n match {
    case Text(_)            => ""
    case e @ Elem("a", _, _) => allText(e)
    case Elem(_, _, kids)   => kids.map(linkText).mkString
  }

  private def hasBlockChild(e: Elem): Boolean =
    e.children.exists { case Elem(t, _, _) => BlockTags(t); case _ => false }

  /** Main-content extraction: strip DroppedTags subtrees, then walk the
    * remaining tree top-down. A block element with no block children is a
    * LEAF BLOCK: emit its full text (anchor text included, whitespace
    * preserved verbatim) iff it is non-empty and its link density is
    * <= MaxLinkDensity. Block elements with block children recurse;
    * inline/text directly under a non-leaf block is ignored (inter-block
    * glue, never document content in well-formed pages).
    */
  def mainContent(html: String): String = {
    val out = new StringBuilder
    def walk(e: Elem): Unit = {
      if (!DroppedTags(e.tag)) {
        if (e.tag != "#root" && BlockTags(e.tag) && !hasBlockChild(e)) {
          val txt = allText(e)
          if (txt.nonEmpty) {
            val ld = linkText(e).length.toDouble / txt.length
            if (ld <= MaxLinkDensity) out.append(txt)
          }
        } else {
          e.children.foreach { case k: Elem => walk(k); case _ => () }
        }
      }
    }
    walk(parse(html))
    out.toString
  }
}
