package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HTML main-text extraction — the first transform a raw-crawl corpus
  * passes through before any quality/dedup stage sees it. Heuristic in
  * the jusText / Arc90-readability family (public literature: Pomikálek
  * 2011; the block-scoring idea every production boilerplate remover
  * uses): segment the page into BLOCKS at block-level tag boundaries,
  * score each block by text mass and LINK DENSITY (anchor-text fraction),
  * keep content-shaped blocks, drop chrome (nav bars are short and ~100%
  * links; footers are short; script/style/comments are not text at all).
  *
  * Deliberately regex/scan-based and dependency-free: no DOM is built —
  * one linear pass per document, so the operator is a per-row map
  * (zero shuffle) and a malformed page degrades to "strip tags, keep
  * long blocks", never an exception. Limits are documented, not hidden:
  * CDATA is treated as text, conditional comments as comments, and
  * attributes containing a literal '>' inside quotes will split a tag
  * early — acceptable for crawl-scale curation (jusText makes the same
  * trade), and the q336 oracle pins the behavior on template-wrapped
  * corpus text.
  */
object HtmlExtract {

  private val ScriptStyle =
    "(?is)<(script|style|noscript|template)\\b[^>]*>.*?</\\1\\s*>".r
  private val Comment = "(?s)<!--.*?-->".r
  // block-level boundaries: opening OR closing forms all split blocks
  private val BlockTag =
    ("(?i)</?(p|div|br|li|ul|ol|h[1-6]|td|tr|table|section|article|aside|" +
      "header|footer|nav|main|title|blockquote|pre|dd|dt|figure|form)\\b[^>]*>").r
  private val AnchorSpan = "(?is)<a\\b[^>]*>(.*?)</a\\s*>".r
  private val AnyTag = "(?s)<[^>]*>".r
  private val Entities = Map("&amp;" -> "&", "&lt;" -> "<", "&gt;" -> ">",
    "&quot;" -> "\"", "&#39;" -> "'", "&apos;" -> "'", "&nbsp;" -> " ")

  private def decodeEntities(s: String): String = {
    var out = s
    Entities.foreach { case (k, v) => out = out.replace(k, v) }
    // numeric character references (decimal + hex)
    out = "&#(\\d+);".r.replaceAllIn(out,
      m => java.util.regex.Matcher.quoteReplacement(
        new String(Character.toChars(m.group(1).toInt))))
    "&#[xX]([0-9a-fA-F]+);".r.replaceAllIn(out,
      m => java.util.regex.Matcher.quoteReplacement(
        new String(Character.toChars(Integer.parseInt(m.group(1), 16)))))
  }

  private def clean(s: String): String =
    decodeEntities(AnyTag.replaceAllIn(s, " "))
      .replaceAll("\\s+", " ").trim

  /** Extract the main text of one HTML page: blocks with at least
    * `minChars` of cleaned text and link density ≤ `maxLinkDensity`,
    * joined by single newlines in document order. Non-HTML input (no
    * tags) passes through cleaned — the crawl-reality fallback.
    */
  def extractText(html: String, minChars: Int = 25,
      maxLinkDensity: Double = 0.34): String = {
    if (html == null) return null
    val noScript = ScriptStyle.replaceAllIn(html, " ")
    val noComment = Comment.replaceAllIn(noScript, " ")
    val blocks = BlockTag.split(noComment)
    val kept = blocks.iterator.map { raw =>
      val anchorChars = AnchorSpan.findAllMatchIn(raw)
        .map(m => clean(m.group(1)).length).sum
      val text = clean(raw)
      (text, anchorChars)
    }.filter { case (text, anchorChars) =>
      text.length >= minChars &&
        (text.isEmpty || anchorChars.toDouble / text.length <= maxLinkDensity)
    }.map(_._1)
    kept.mkString("\n")
  }

  /** DataFrame form: (idCol, textCol = extracted main text). One per-row
    * map over the html column — no shuffle, no state; nulls propagate.
    */
  def extract(docs: DataFrame, idCol: String, htmlCol: String,
      minChars: Int = 25, maxLinkDensity: Double = 0.34): DataFrame = {
    val ex = udf((h: String) => extractText(h, minChars, maxLinkDensity))
    docs.select(col(idCol), ex(col(htmlCol)).as("text"))
  }
}
