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

  test("malformed numeric entities pass through raw instead of throwing") {
    // overflow (>Int), out-of-range code point, hex digits in a decimal
    // form, NUL — each would throw from toInt/toChars unguarded and kill
    // the per-row UDF task on one bad crawl page
    val html = "<p>bad refs &#99999999999; and &#1114112; and &#ff; " +
      "and &#x110000; and &#0; in one long enough paragraph.</p>"
    assert(ex(html) == "bad refs &#99999999999; and &#1114112; and &#ff; " +
      "and &#x110000; and &#0; in one long enough paragraph.")
  }

  test("typographic named entities decode; unknown names pass through") {
    val html = "<p>He said &ldquo;wait&rdquo; &mdash; then&hellip; " +
      "it&rsquo;s &copy; 2026 &trade; &unknownname; done here now.</p>"
    assert(ex(html) == "He said “wait” — then… it’s © 2026 ™ &unknownname; done here now.")
  }

  test("single-pass decode: &amp;lt; is the literal text &lt;, not <") {
    val html = "<p>Escaped markup literal &amp;lt;p&amp;gt; stays escaped " +
      "in this long enough paragraph of content text.</p>"
    assert(ex(html).contains("&lt;p&gt;"))
    assert(!ex(html).contains("<p>"))
  }

  test("a long title never leaks into the main text; extractTitle returns it") {
    val html = "<html><head><title>A Very Long Page Title With Plenty Of " +
      "Characters To Pass The Block Floor</title></head><body>" +
      "<p>Body paragraph with enough characters to be kept as content.</p>" +
      "</body></html>"
    assert(ex(html) == "Body paragraph with enough characters to be kept as content.")
    assert(HtmlExtract.extractTitle(html) == "A Very Long Page Title With " +
      "Plenty Of Characters To Pass The Block Floor")
  }

  test("extractTitle: entity decode, no title, null") {
    assert(HtmlExtract.extractTitle(
      "<title>Tom &amp; Jerry &mdash; S1</title>") == "Tom & Jerry — S1")
    assert(HtmlExtract.extractTitle("<p>no title here</p>") == "")
    assert(HtmlExtract.extractTitle(null) == null)
  }
}
