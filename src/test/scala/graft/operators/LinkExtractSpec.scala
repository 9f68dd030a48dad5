package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Outlink extraction contracts: RFC 3986 resolution (relative, rooted,
  * protocol-relative, ../ traversal), base-tag override, fragment drop,
  * non-http scheme filtering, anchor cleaning, canonical link, and
  * malformed-input degradation.
  */
class LinkExtractSpec extends AnyFunSuite {

  private val page = "http://site.example.com/a/b/page.html"

  test("resolution: rooted, relative, ../, protocol-relative, absolute") {
    def one(href: String) =
      LinkExtract.links(s"""<a href="$href">x</a>""", page).map(_._1)
    assert(one("/doc/5") == Seq("http://site.example.com/doc/5"))
    assert(one("next.html") == Seq("http://site.example.com/a/b/next.html"))
    assert(one("../up.html") == Seq("http://site.example.com/a/up.html"))
    assert(one("//cdn.example.com/x") == Seq("http://cdn.example.com/x"))
    assert(one("https://other.org/y") == Seq("https://other.org/y"))
  }

  test("fragments drop; non-http schemes and malformed hrefs skip silently") {
    val html = """<a href="/p#section">frag</a> <a href="mailto:a@b.c">m</a>
      |<a href="javascript:void(0)">j</a> <a href="data:text/plain,x">d</a>
      |<a href="ht tp://bad url">bad</a> <a href="">empty</a>""".stripMargin
    assert(LinkExtract.links(html, page).map(_._1) ==
      Seq("http://site.example.com/p"))
  }

  test("<base href> overrides the page URL as resolution base") {
    val html = """<base href="http://cdn.example.com/root/"><a href="x.html">x</a>"""
    assert(LinkExtract.links(html, page).map(_._1) ==
      Seq("http://cdn.example.com/root/x.html"))
  }

  test("anchor text: inline tags strip, whitespace collapses, order kept") {
    val html = """<a href="/1">first   <b>bold</b> link</a><a href='/2'>second</a>
      |<a href=/3>unquoted</a>""".stripMargin
    assert(LinkExtract.links(html, page) == Seq(
      ("http://site.example.com/1", "first bold link"),
      ("http://site.example.com/2", "second"),
      ("http://site.example.com/3", "unquoted")))
  }

  test("canonical link resolves absolute; absent -> None; comments ignored") {
    val html = """<head><link rel="canonical" href="/the/one"></head>"""
    assert(LinkExtract.canonicalUrl(html, page) ==
      Some("http://site.example.com/the/one"))
    assert(LinkExtract.canonicalUrl("<p>no link</p>", page).isEmpty)
    assert(LinkExtract.canonicalUrl(
      """<!-- <link rel="canonical" href="/fake"> --><p>x</p>""", page).isEmpty)
  }

  test("null html degrades to empty, never throws") {
    assert(LinkExtract.links(null, page).isEmpty)
    assert(LinkExtract.canonicalUrl(null, page).isEmpty)
  }
}
