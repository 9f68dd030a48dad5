package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Outlink extraction — the transform that turns a crawled page into
  * LINK-GRAPH edges (the input of the PageRank / host-authority /
  * label-propagation family, and of frontier scheduling in a crawler):
  * every `<a href>` resolved against the page URL (RFC 3986 via
  * `java.net.URI.resolve` — `<base href>` honored when present), with
  * its ANCHOR TEXT (the retrieval/graph signal), plus the page's
  * `<link rel="canonical">` target (the URL-dedup hint real pipelines
  * collapse on before content dedup).
  *
  * Scale shape: one regex pass per document — a per-row flatMap, zero
  * shuffle; the downstream edge aggregation is where keys first cross an
  * exchange (exactly the PageRank family's input contract). Scheme
  * filtering keeps http(s) only (javascript:/mailto:/data: are not
  * edges); fragments drop (RFC 3986 — a fragment is not a resource);
  * malformed hrefs skip silently — a bad attribute must not kill the
  * task (the HtmlExtract degradation contract).
  */
object LinkExtract {

  private val Anchor = "(?is)<a\\b([^>]*)>(.*?)</a\\s*>".r
  private val Href =
    "(?is)href\\s*=\\s*(?:\"([^\"]*)\"|'([^']*)'|([^\\s>]+))".r
  private val BaseTag =
    "(?is)<base\\b[^>]*?href\\s*=\\s*[\"']?([^\"'\\s>]+)".r
  private val CanonicalTag =
    "(?is)<link\\b[^>]*?rel\\s*=\\s*[\"']?canonical[\"']?[^>]*?>".r
  private val Comment = "(?s)<!--.*?-->".r
  private val AnyTag = "(?s)<[^>]*>".r

  private def hrefOf(attrs: String): Option[String] =
    Href.findFirstMatchIn(attrs).map(m =>
      Option(m.group(1)).orElse(Option(m.group(2))).getOrElse(m.group(3)))

  /** RFC 3986 resolution of `href` against `base`; None for non-http(s)
    * results or unparseable input (skip, never throw). Fragments drop.
    */
  def resolve(base: String, href: String): Option[String] = {
    val noFrag = href.takeWhile(_ != '#').trim
    if (noFrag.isEmpty) return None
    try {
      val abs = new java.net.URI(base).resolve(noFrag)
      val scheme = Option(abs.getScheme).map(_.toLowerCase).getOrElse("")
      if (scheme == "http" || scheme == "https") Some(abs.toString) else None
    } catch { case _: Exception => None }
  }

  /** All outlinks of one page: (absolute url, cleaned anchor text) in
    * document order. `<base href>` overrides the page URL as the
    * resolution base when present (the HTML rule).
    */
  def links(html: String, pageUrl: String): Seq[(String, String)] = {
    if (html == null) return Seq.empty
    val noComment = Comment.replaceAllIn(html, " ")
    val base = BaseTag.findFirstMatchIn(noComment).map(_.group(1))
      .flatMap(b => resolve(pageUrl, b)).getOrElse(pageUrl)
    Anchor.findAllMatchIn(noComment).flatMap { m =>
      hrefOf(m.group(1)).flatMap(resolve(base, _)).map { url =>
        val anchor = AnyTag.replaceAllIn(m.group(2), " ")
          .replaceAll("\\s+", " ").trim
        (url, anchor)
      }
    }.toSeq
  }

  /** The page's `<link rel="canonical">` target resolved absolute; None
    * when the page declares none.
    */
  def canonicalUrl(html: String, pageUrl: String): Option[String] = {
    if (html == null) return None
    CanonicalTag.findFirstMatchIn(Comment.replaceAllIn(html, " "))
      .flatMap(m => hrefOf(m.matched))
      .flatMap(resolve(pageUrl, _))
  }

  /** DataFrame form: one row per outlink — (idCol, link, anchor). The
    * edge list the graph layer consumes (`select(idCol, link)` is the
    * PageRank input; keep `anchor` for retrieval signals).
    */
  def extract(docs: DataFrame, idCol: String, htmlCol: String,
      urlCol: String): DataFrame = {
    val ex = udf((h: String, u: String) => links(h, u))
    docs.select(col(idCol), explode(ex(col(htmlCol), col(urlCol))).as("l"))
      .select(col(idCol), col("l._1").as("link"), col("l._2").as("anchor"))
  }

  /** DataFrame form of [[canonicalUrl]]: (idCol, canonical) — null when
    * undeclared. The URL-dedup collapse key.
    */
  def canonical(docs: DataFrame, idCol: String, htmlCol: String,
      urlCol: String): DataFrame = {
    val ex = udf((h: String, u: String) => canonicalUrl(h, u).orNull)
    docs.select(col(idCol), ex(col(htmlCol), col(urlCol)).as("canonical"))
  }
}
