package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sitemap parsing (sitemaps.org protocol — the public crawl-discovery
  * format robots.txt points at): `<urlset>` documents yield page URLs
  * with their optional `<lastmod>`/`<changefreq>`/`<priority>` hints;
  * `<sitemapindex>` documents yield CHILD sitemap URLs (the two-level
  * fan-out large sites ship — an index of ≤50k-URL chunks).
  *
  * Deliberately regex/scan-based like [[HtmlExtract]]: one linear pass
  * per document, per-row flatMap, zero shuffle; malformed XML degrades
  * to "whatever `<loc>` entries parse", never an exception. Entity
  * decoding covers the XML five (sitemap locs are URL-encoded by spec,
  * so `&amp;` is the one that actually occurs).
  */
object Sitemaps {

  private val UrlEntry = "(?is)<url\\b[^>]*>(.*?)</url\\s*>".r
  private val SitemapEntry = "(?is)<sitemap\\b[^>]*>(.*?)</sitemap\\s*>".r
  private val Loc = "(?is)<loc\\s*>(.*?)</loc\\s*>".r
  private val LastMod = "(?is)<lastmod\\s*>(.*?)</lastmod\\s*>".r

  private def decode(s: String): String = s.trim
    .replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
    .replace("&apos;", "'").replace("&amp;", "&")

  final case class SitemapUrl(loc: String, lastmod: String)

  /** Page entries of a `<urlset>` document: (loc, lastmod — empty when
    * absent), in document order.
    */
  def urls(xml: String): Seq[SitemapUrl] = {
    if (xml == null) return Seq.empty
    UrlEntry.findAllMatchIn(xml).flatMap { m =>
      Loc.findFirstMatchIn(m.group(1)).map { l =>
        SitemapUrl(decode(l.group(1)),
          LastMod.findFirstMatchIn(m.group(1)).map(x => decode(x.group(1)))
            .getOrElse(""))
      }
    }.toSeq
  }

  /** Child sitemap URLs of a `<sitemapindex>` document. */
  def children(xml: String): Seq[String] = {
    if (xml == null) return Seq.empty
    SitemapEntry.findAllMatchIn(xml).flatMap(m =>
      Loc.findFirstMatchIn(m.group(1)).map(l => decode(l.group(1)))).toSeq
  }

  /** DataFrame form over (idCol, xmlCol): one row per page entry —
    * (idCol, loc, lastmod). Per-row flatMap, zero shuffle.
    */
  def extract(docs: DataFrame, idCol: String, xmlCol: String): DataFrame = {
    val ex = udf((x: String) => urls(x).map(u => (u.loc, u.lastmod)))
    docs.select(col(idCol), explode(ex(col(xmlCol))).as("u"))
      .select(col(idCol), col("u._1").as("loc"), col("u._2").as("lastmod"))
  }
}
