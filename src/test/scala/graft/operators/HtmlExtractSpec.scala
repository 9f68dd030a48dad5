package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Block-scoring contracts of the boilerplate remover: chrome (nav /
  * footer / script / style / comments) drops, content survives verbatim,
  * entities decode, link-dense blocks die, malformed input degrades
  * instead of throwing.
  */
class HtmlExtractSpec extends AnyFunSuite {

  private def ex(s: String) = HtmlExtract.extractText(s)

  test("content paragraph survives; nav, script, style, comments, footer drop") {
    val html =
      """<html><head><title>T</title><style>.x{color:red}</style>
        |<script>var a = "<p>not text</p>";</script></head>
        |<body><!-- tracking pixel -->
        |<nav><a href="/">Home</a> <a href="/a">About</a> <a href="/b">More</a></nav>
        |<p>The quick brown fox jumps over the lazy dog near the river bank today.</p>
        |<footer>© 2026 corp</footer></body></html>""".stripMargin
    assert(ex(html) ==
      "The quick brown fox jumps over the lazy dog near the river bank today.")
  }

  test("link-dense long block drops even past the length floor") {
    val links = (1 to 12).map(i =>
      s"""<a href="/$i">category number $i</a>""").mkString(" ")
    val html = s"<div>$links</div><p>Plain sentence with enough characters to keep here.</p>"
    assert(ex(html) == "Plain sentence with enough characters to keep here.")
  }

  test("multiple content blocks join in document order with newlines") {
    val html = "<p>First paragraph has plenty of characters to pass.</p>" +
      "<p>Second paragraph also has plenty of characters to pass.</p>"
    assert(ex(html) ==
      "First paragraph has plenty of characters to pass.\n" +
        "Second paragraph also has plenty of characters to pass.")
  }

  test("entities decode, inline tags strip, whitespace collapses") {
    val html = "<p>Tom &amp; Jerry &lt;3 <b>bold</b>   and &#65;&#x42; plus&nbsp;space.</p>"
    assert(ex(html) == "Tom & Jerry <3 bold and AB plus space.")
  }

  test("anchors inside content count toward link density but keep their text") {
    val html = "<p>Read the full documentation at " +
      "<a href=\"/docs\">the docs page</a> for all of the configuration details.</p>"
    assert(ex(html).contains("the docs page"))
  }

  test("plain text (no tags) passes through cleaned; null propagates") {
    assert(ex("just a plain line of text that is long enough to keep") ==
      "just a plain line of text that is long enough to keep")
    assert(HtmlExtract.extractText(null) == null)
  }

  test("malformed markup degrades, never throws") {
    val html = "<p>Unclosed paragraph with enough characters to keep it here " +
      "<div<bad <a href=>broken</p"
    assert(ex(html).startsWith("Unclosed paragraph"))
  }
}
