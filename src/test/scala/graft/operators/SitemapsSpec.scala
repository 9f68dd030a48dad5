package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Sitemap protocol contracts: urlset entries with and without lastmod,
  * sitemapindex fan-out, XML entity decode, robots Sitemap: directives
  * (group-independent), and malformed degradation.
  */
class SitemapsSpec extends AnyFunSuite {

  test("urlset: loc + optional lastmod, document order") {
    val xml =
      """<?xml version="1.0"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <url><loc>http://h.test/a</loc><lastmod>2026-01-02</lastmod></url>
        |  <url><loc> http://h.test/b?x=1&amp;y=2 </loc></url>
        |</urlset>""".stripMargin
    assert(Sitemaps.urls(xml) == Seq(
      Sitemaps.SitemapUrl("http://h.test/a", "2026-01-02"),
      Sitemaps.SitemapUrl("http://h.test/b?x=1&y=2", "")))
  }

  test("sitemapindex: child sitemap fan-out") {
    val xml =
      """<sitemapindex>
        |  <sitemap><loc>http://h.test/maps/s1.xml</loc></sitemap>
        |  <sitemap><loc>http://h.test/maps/s2.xml</loc><lastmod>2026-02-01</lastmod></sitemap>
        |</sitemapindex>""".stripMargin
    assert(Sitemaps.children(xml) ==
      Seq("http://h.test/maps/s1.xml", "http://h.test/maps/s2.xml"))
    assert(Sitemaps.urls(xml).isEmpty, "an index document carries no page urls")
  }

  test("robots Sitemap: directives parse group-independently") {
    val robots = "User-agent: a\nDisallow: /x\nSitemap: http://h.test/s1.xml\n" +
      "User-agent: *\nSITEMAP: http://h.test/s2.xml # trailing comment\n"
    assert(RobotsTxt.sitemaps(robots) ==
      Seq("http://h.test/s1.xml", "http://h.test/s2.xml"))
    assert(RobotsTxt.sitemaps(null).isEmpty)
  }

  test("malformed xml degrades to the parseable loc entries, never throws") {
    val xml = "<urlset><url><loc>http://h.test/ok</loc></url><url>no loc" +
      "</url><url><loc>http://h.test/also" // truncated
    assert(Sitemaps.urls(xml).map(_.loc) == Seq("http://h.test/ok"))
    assert(Sitemaps.urls(null).isEmpty)
  }
}
