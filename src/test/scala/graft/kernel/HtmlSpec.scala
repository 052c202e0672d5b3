package graft.kernel

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.GenData

/** HTML kernel gates: entity round-trips, tag-soup parser tolerances,
  * raw-text elements, the link-density block heuristic on hand-authored
  * pages, and the generator round-trip property hx1's driver oracle rests
  * on (wrap text in a full boilerplate page, strip it, get the exact text
  * back).
  */
class HtmlSpec extends AnyFunSuite {

  test("escape/unescape round-trips markup-significant characters") {
    val s = """a < b && c > d "quoted" & 'single' — done"""
    assert(Html.unescape(Html.escape(s)) == s)
    assert(Html.unescape("&#65;&#x42;&amp;&unknown;&#bad;& loose") == "AB&&unknown;&#bad;& loose")
    assert(Html.unescape("&copy; &mdash; &nbsp;") == "© —  ")
  }

  test("parser: void elements, attributes in three quote styles, self-close") {
    val root = Html.parse(
      """<div id="a" class='b c' data-x=5 hidden><br><img src="x.png"/>text</div>""")
    val div = root.children.collect { case e: Html.Elem => e }.head
    assert(div.tag == "div")
    assert(div.attrs == Map("id" -> "a", "class" -> "b c", "data-x" -> "5", "hidden" -> ""))
    assert(div.children.collect { case e: Html.Elem => e.tag } == Vector("br", "img"))
    assert(div.children.collect { case t: Html.Text => t.s }.mkString == "text")
  }

  test("parser: raw-text script/style swallow markup-like content") {
    val root = Html.parse(
      """<style>p > a { x: 1 }</style><script>if (a<b) w("<div>");</script><p>keep</p>""")
    val tags = root.children.collect { case e: Html.Elem => e.tag }
    assert(tags == Vector("style", "script", "p"))
    val script = root.children.collect { case e: Html.Elem if e.tag == "script" => e }.head
    assert(script.children.collect { case t: Html.Text => t.s }.mkString
      == """if (a<b) w("<div>");""")
  }

  test("parser: misnesting recovery and EOF auto-close keep text reachable") {
    val root = Html.parse("<div><b>bold<i>both</b>after</i><p>tail")
    def allText(n: Html.Node): String = n match {
      case Html.Text(s)          => s
      case Html.Elem(_, _, kids) => kids.map(allText).mkString
    }
    assert(allText(root) == "boldbothaftertail")
    // a stray '<' that opens no tag is literal text, not a parse failure
    assert(allText(Html.parse("5 < 6 but <em>ok</em>")) == "5 < 6 but ok")
  }

  test("mainContent: semantic containers drop wholesale, link-dense leaves drop by density") {
    val page =
      """<html><head><title>t</title></head><body>
        |<nav><a href="/">home</a><a href="/x">x</a></nav>
        |<div class="menu"><a href="/a">aaa</a> <a href="/b">bbb</a></div>
        |<div><p>real content paragraph with an <a href="#">inline</a> link kept whole</p></div>
        |<footer><p>copyright</p></footer>
        |</body></html>""".stripMargin
    val got = Html.mainContent(page)
    assert(got == "real content paragraph with an inline link kept whole", s"got [$got]")
  }

  test("mainContent: nested blocks recurse, anchor text inside kept blocks is kept") {
    val page = "<body><article><div><p>alpha </p><p>beta</p></div>" +
      "<ul><li><a href='/1'>boiler</a></li><li><a href='/2'>plate</a></li></ul></article></body>"
    assert(Html.mainContent(page) == "alpha beta")
  }

  test("generator round-trip: mainContent(htmlPayload(text)) == text, exactly (hx1 oracle)") {
    val rng = new scala.util.Random(11L)
    val alphabet = "abcdefgh ijkl mno pq rst uvw xyz "
    (0 until 300).foreach { i =>
      val text =
        if (i == 0) ""
        else if (i == 1) "x"
        else (0 until (1 + rng.nextInt(400))).map(_ => alphabet(rng.nextInt(alphabet.length))).mkString
      val html = GenData.htmlPayload(GenData.DefaultSeed, i.toLong, text)
      val got = Html.mainContent(html)
      assert(got == text,
        s"doc $i: round-trip diverged\n text=[${text.take(80)}]\n got =[${got.take(80)}]")
    }
  }

  test("generator pages are real pages: boilerplate present and stripped") {
    val html = GenData.htmlPayload(GenData.DefaultSeed, 7L, "the quick brown fox " * 10)
    assert(html.contains("<nav>") && html.contains("<footer>") && html.contains("<script>"))
    assert(html.length > 800)
    val stripped = Html.mainContent(html)
    assert(!stripped.contains("href") && !stripped.contains("©"))
  }
}
