package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.functions.Html

/** The HTML main-content extractor: tag stripping (quote-aware),
  * raw-text element bodies, comments, character references, link
  * counting, the escape round-trip on hostile text, and the
  * never-throw contract under truncation.
  */
class HtmlSpec extends AnyFunSuite with Matchers {

  test("character references: named, decimal, hex, unknown, unterminated") {
    Html.extract("a &amp; b").text shouldBe "a & b"
    Html.extract("&lt;p&gt; is literal").text shouldBe "<p> is literal"
    Html.extract("it&#39;s").text shouldBe "it's"
    Html.extract("&#x41;&#66;").text shouldBe "AB"
    Html.extract("&quot;q&quot; &apos;a&apos;").text shouldBe "\"q\" 'a'"
    // unknown entity: the ampersand is kept literal, text not eaten
    Html.extract("AT&T; x").text shouldBe "AT&T; x"
    // unterminated reference at EOF
    Html.extract("fish &chips").text shouldBe "fish &chips"
  }

  test("script/style bodies are skipped whole — markup-looking strings never leak") {
    val html = """<p>keep</p><script>var s = "<p>leak?</p>"; if (a > b) {}</script>""" +
      """<style>p::before { content: "<no>"; }</style><p>also keep</p>"""
    val e = Html.extract(html)
    e.text shouldBe "keep also keep"
    e.nScriptBlocks shouldBe 1
    e.nStyleBlocks shouldBe 1
    // case-insensitive close tags
    Html.extract("<SCRIPT>x = 1;</ScRiPt>after").text shouldBe "after"
  }

  test("comments hide markup; quote-aware tags survive '>' in attribute values") {
    val e = Html.extract("""<!-- <div>ghost</div> -->real<a href="x" title="a>b">link</a>""")
    e.text shouldBe "real link"
    e.nCommentBlocks shouldBe 1
    e.nLinks shouldBe 1
  }

  test("link counting: <a> counts, <abbr>/<address> do not") {
    val e = Html.extract("""<a href="1">x</a><abbr>y</abbr><address>z</address><A HREF="2">w</A>""")
    e.nLinks shouldBe 2
  }

  test("tags separate words; whitespace collapses like the oracle regexp") {
    Html.extract("<p>one</p><p>two</p>").text shouldBe "one two"
    Html.extract("  a \t\r\n  b  ").text shouldBe "a b"
    Html.extract("").text shouldBe ""
    Html.extract("<p></p>").text shouldBe ""
  }

  test("escape round-trip: hostile document text survives the page embedding exactly") {
    val hostile = Seq(
      """<script>alert("x")</script> & <p> 'quoted' "double"""",
      "emoji 👍 café 中文",
      "a && b &amp; c &#39; d",
      "   ", // all-whitespace
      ""
    )
    hostile.zipWithIndex.foreach { case (text, i) =>
      val ext = Html.extract(Html.fixturePage(i.toLong, text))
      val collapsed = Html.collapseWs(text)
      val expected = Html.collapseWs(
        s"Doc $i Home About Q&A $collapsed (c) example.org's corpus")
      withClue(s"text [$text]: ") { ext.text shouldBe expected }
      ext.nLinks shouldBe 3
      ext.nScriptBlocks shouldBe 1
      ext.nStyleBlocks shouldBe 1
      ext.nCommentBlocks shouldBe 1
    }
  }

  test("truncation fuzz: every prefix of a real page extracts without throwing") {
    val page = Html.fixturePage(7L, "some body text with &amp; and <tags> escaped")
    (0 until page.length).foreach { cut =>
      noException should be thrownBy Html.extract(page.substring(0, cut))
    }
    // unclosed constructs at EOF keep the recovered prefix
    Html.extract("before<script>never closed").text shouldBe "before"
    Html.extract("before<p unclosed").text shouldBe "before"
    Html.extract("before<!-- unclosed").text shouldBe "before"
  }
}
