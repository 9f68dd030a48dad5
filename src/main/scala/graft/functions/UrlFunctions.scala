package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for web-corpus curation — the normalization pass
  * that runs BEFORE url-level dedup in a Common-Crawl-style pipeline, so
  * `http://WWW.Site.com:80/p?utm_source=x&b=2&a=1#frag` and
  * `http://www.site.com/p?a=1&b=2` collapse to one key. Built entirely
  * from codegen'd built-ins (regexp_* + higher-order array functions) —
  * zero UDFs, so the whole pass stays inside WholeStageCodegen and the
  * DuckDB oracle replays it expression by expression (q285/q286).
  *
  * Rules (each deliberately oracle-replayable; RFC 3986 component split):
  *  - scheme and host lowercased; userinfo stripped
  *  - default ports dropped (http:80, https:443); other ports kept
  *  - empty path → "/"
  *  - fragment dropped
  *  - query: empty params dropped, tracking params dropped
  *    (utm_*, gclid, fbclid, msclkid, ref), the rest SORTED
  *    lexicographically and rejoined — param order never splits a key
  *
  * The reference engine has no web-curation surface (its ingestion is
  * vector files and catalogs, SURVEY §2.1) — this extends the repo's
  * LLM-pipeline layer alongside the dedup family.
  */
object UrlFunctions {

  private val trackingParam = "^(utm_[^=]*|gclid|fbclid|msclkid|ref)="

  /** Canonical form of a URL column. Inputs without a scheme pass through
    * the same component split with scheme "" (never null), keeping the
    * map total over dirty corpora.
    */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    // scheme OPTIONAL in the strip so a canonical schemeless form
    // ("://host/…") re-enters cleanly — canonicalization is idempotent
    val rest = regexp_replace(url, "^([A-Za-z][A-Za-z0-9+.-]*)?://", "")
    val noFrag = regexp_replace(rest, "#.*$", "")
    val authority = regexp_extract(noFrag, "^([^/?]*)", 1)
    val hostport = regexp_replace(authority, "^[^/?@]*@", "")
    val host = lower(regexp_replace(hostport, ":[0-9]+$", ""))
    val port = regexp_extract(hostport, ":([0-9]+)$", 1)
    val keptPort = when(port === "", lit(""))
      .when(scheme === "http" && port === "80", lit(""))
      .when(scheme === "https" && port === "443", lit(""))
      .otherwise(concat(lit(":"), port))
    val pathQuery = regexp_extract(noFrag, "^[^/?]*(.*)$", 1)
    val path = regexp_extract(pathQuery, "^([^?]*)", 1)
    val normPath = when(path === "", lit("/")).otherwise(path)
    val query = regexp_extract(pathQuery, "\\?(.*)$", 1)
    val kept = array_join(
      array_sort(filter(split(query, "&"),
        p => p =!= "" && !p.rlike(trackingParam))), "&")
    val queryPart = when(kept === "", lit("")).otherwise(concat(lit("?"), kept))
    concat(scheme, lit("://"), host, keptPort, normPath, queryPart)
  }

  /** Registrable-domain approximation: the last two host labels
    * (`a.b.site.com` → `site.com`). A faithful answer needs the public
    * suffix list (zero-egress: not bundled); two labels is the standard
    * offline approximation and is documented as such wherever it feeds a
    * card.
    */
  def hostOf(canonUrl: Column): Column =
    regexp_extract(canonUrl, "^[a-z0-9+.-]*://([^/:?]*)", 1)

  /** See [[hostOf]] — last two labels of the host. */
  def domainOf(canonUrl: Column): Column =
    regexp_extract(hostOf(canonUrl), "([^.]+\\.[^.]+)$", 1)

  /** The DuckDB replay of [[canonicalizeUrl]] over a column expression —
    * kept HERE, next to the Spark form, so the two rule sets cannot
    * drift apart silently. `expr` is the SQL text of the url column.
    * Composed from the same component snippets the Spark form uses, one
    * per RFC component.
    */
  def canonicalizeUrlSql(expr: String): String = {
    val scheme = s"lower(regexp_extract($expr, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    val noFrag =
      s"regexp_replace(regexp_replace($expr, '^([A-Za-z][A-Za-z0-9+.-]*)?://', ''), '#.*$$', '')"
    val hostport =
      s"regexp_replace(regexp_extract($noFrag, '^([^/?]*)', 1), '^[^/?@]*@', '')"
    val host = s"lower(regexp_replace($hostport, ':[0-9]+$$', ''))"
    val port = s"regexp_extract($hostport, ':([0-9]+)$$', 1)"
    val path = s"regexp_extract(regexp_extract($noFrag, '^[^/?]*(.*)$$', 1), '^([^?]*)', 1)"
    val query = s"regexp_extract(regexp_extract($noFrag, '^[^/?]*(.*)$$', 1), '\\?(.*)$$', 1)"
    val kept =
      s"""array_to_string(list_sort(list_filter(string_split($query, '&'),
         |  p -> p != '' AND NOT regexp_matches(p, '^(utm_[^=]*|gclid|fbclid|msclkid|ref)='))), '&')""".stripMargin
    s"""concat(
       |  $scheme, '://',
       |  $host,
       |  CASE
       |    WHEN $port = '' THEN ''
       |    WHEN $scheme = 'http' AND $port = '80' THEN ''
       |    WHEN $scheme = 'https' AND $port = '443' THEN ''
       |    ELSE concat(':', $port)
       |  END,
       |  CASE WHEN $path = '' THEN '/' ELSE $path END,
       |  CASE WHEN $kept = '' THEN '' ELSE concat('?', $kept) END)""".stripMargin
  }
}
