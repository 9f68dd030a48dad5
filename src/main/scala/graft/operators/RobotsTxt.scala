package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** robots.txt evaluation (RFC 9309 — the public Robots Exclusion
  * Protocol): the compliance filter a crawl corpus passes before any
  * curation stage may legally touch it. Group selection picks the most
  * specific `User-agent` match (longest product-token match, `*`
  * fallback); rule precedence is LONGEST-PATTERN-MATCH with Allow
  * winning ties; patterns support `*` wildcards and the `$` end anchor.
  *
  * Scale shape: robots files are PER-HOST (millions of rows, tiny next
  * to pages), so [[compileRules]] parses each host's file ONCE into
  * pattern arrays — a per-row map over the small table — and
  * [[filterAllowed]] joins pages to compiled rules on the host key
  * (hash join; pattern evaluation is then a per-row scan of that
  * host's few rules, never a re-parse per page). Malformed lines skip
  * silently — a broken robots.txt must not kill ingestion (the
  * conservative default for a MISSING file is the caller's join choice:
  * left join + null rules → allowed, the crawl convention).
  */
object RobotsTxt {

  /** `*`/`$` pattern match against a path (RFC 9309 §2.2.3) — translated
    * to an anchored regex (quoted literals joined by `.*`), which handles
    * the case a greedy left-to-right walk cannot: an anchored pattern
    * whose literal recurs (a slash-star `.bin$` pattern vs `/a.bin.bin`
    * must match on the LAST occurrence).
    */
  def patternMatches(pattern: String, path: String): Boolean = {
    val anchored = pattern.endsWith("$")
    val pat = if (anchored) pattern.dropRight(1) else pattern
    val body = pat.split("\\*", -1)
      .map(p => if (p.isEmpty) "" else java.util.regex.Pattern.quote(p))
      .mkString(".*")
    path.matches(body + (if (anchored) "" else ".*"))
  }

  private final case class Group(agents: Seq[String], allows: Seq[String],
      disallows: Seq[String], crawlDelay: Option[Double])

  /** RFC 9309 §2.2.1 grouping: consecutive `User-agent` lines share one
    * rule group; a rule line (Allow/Disallow/Crawl-delay) ends the
    * user-agent run; UNKNOWN directives and `Sitemap` (group-independent
    * per §2.2.4) are ignored WITHOUT affecting grouping — an unknown or
    * `Sitemap` line between two `User-agent` lines must not split them
    * into separate groups (the over-permissive failure: the first agent
    * would get an empty allow-all rule set).
    */
  private def parseGroups(robotsTxt: String): Seq[Group] = {
    val groups = scala.collection.mutable.ArrayBuffer.empty[Group]
    var agents = scala.collection.mutable.ArrayBuffer.empty[String]
    var allows = scala.collection.mutable.ArrayBuffer.empty[String]
    var disallows = scala.collection.mutable.ArrayBuffer.empty[String]
    var delay: Option[Double] = None
    var inAgents = true
    def flush(): Unit = {
      if (agents.nonEmpty)
        groups += Group(agents.toSeq, allows.toSeq, disallows.toSeq, delay)
      agents = scala.collection.mutable.ArrayBuffer.empty[String]
      allows = scala.collection.mutable.ArrayBuffer.empty[String]
      disallows = scala.collection.mutable.ArrayBuffer.empty[String]
      delay = None
    }
    robotsTxt.linesIterator.foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val i = line.indexOf(':')
      if (i > 0) {
        val key = line.substring(0, i).trim.toLowerCase
        val value = line.substring(i + 1).trim
        key match {
          case "user-agent" =>
            if (!inAgents) flush()
            inAgents = true
            agents += value.toLowerCase
          case "allow" =>
            inAgents = false
            if (value.nonEmpty) allows += value
          case "disallow" =>
            inAgents = false
            if (value.nonEmpty) disallows += value
          case "crawl-delay" =>
            // the de-facto politeness-rate extension, parsed first-class:
            // a RULE line (ends the user-agent run like Allow/Disallow —
            // a delay-only group must close before the next User-agent,
            // or `UA: bot / Crawl-delay: 4 / UA: *` would merge bot and *)
            inAgents = false
            delay = value.toDoubleOption.filter(_ > 0).orElse(delay)
          case _ => // sitemap/unknown: no grouping effect (RFC 9309 §2.2.4)
        }
      }
    }
    flush()
    groups.toSeq
  }

  /** The groups applying to `agent`: all groups whose BEST matching
    * product token (case-insensitive containment) has the maximal length
    * — RFC 9309 §2.2.1's "most specific match", with same-specificity
    * groups MERGED as the RFC requires (two `User-agent: bot` groups
    * combine; only the single maxBy group would silently drop the
    * other's Disallow rules). No specific match ⇒ ALL `*` groups merge
    * (the fallback).
    */
  private def matchingGroups(groups: Seq[Group], agent: String): Seq[Group] = {
    val agentLc = agent.toLowerCase
    val scored = groups.flatMap { g =>
      val best = g.agents.collect {
        case a if a != "*" && agentLc.contains(a) => a.length
      }
      if (best.isEmpty) None else Some((best.max, g))
    }
    if (scored.nonEmpty) {
      val top = scored.map(_._1).max
      scored.collect { case (l, g) if l == top => g }
    } else groups.filter(_.agents.contains("*"))
  }

  /** Allow/Disallow patterns applying to `agent`: the most specific
    * matching groups' rules, UNIONED (case-insensitive product-token
    * match; merged `*` fallback; empty Disallow = no rule, per RFC).
    */
  def parse(robotsTxt: String, agent: String): (Seq[String], Seq[String]) = {
    if (robotsTxt == null) return (Seq.empty, Seq.empty)
    val gs = matchingGroups(parseGroups(robotsTxt), agent)
    (gs.flatMap(_.allows), gs.flatMap(_.disallows))
  }

  /** The `Crawl-delay` (seconds) applying to `agent` — the per-host
    * politeness RATE the frontier converts into a per-wave host budget
    * ([[Frontier.select]]'s `hostDelays`). When merged groups disagree,
    * the MAXIMUM wins (the most conservative rate). None when no
    * applicable group declares one.
    */
  def crawlDelay(robotsTxt: String, agent: String): Option[Double] = {
    if (robotsTxt == null) return None
    matchingGroups(parseGroups(robotsTxt), agent)
      .flatMap(_.crawlDelay).maxOption
  }

  /** `Sitemap:` directives of a robots.txt — group-independent per RFC
    * 9309 §2.2.4 (they apply to all agents), the crawl-discovery seeds
    * [[Sitemaps]] expands.
    */
  def sitemaps(robotsTxt: String): Seq[String] = {
    if (robotsTxt == null) return Seq.empty
    robotsTxt.linesIterator.flatMap { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val i = line.indexOf(':')
      if (i > 0 && line.substring(0, i).trim.equalsIgnoreCase("sitemap")) {
        val v = line.substring(i + 1).trim
        if (v.nonEmpty) Some(v) else None
      } else None
    }.toSeq
  }

  /** Longest-match verdict (Allow wins ties); no matching rule ⇒
    * allowed (the RFC default).
    */
  def isAllowed(allows: Seq[String], disallows: Seq[String],
      path: String): Boolean = {
    val bestAllow = allows.filter(patternMatches(_, path))
      .map(_.length).maxOption.getOrElse(-1)
    val bestDisallow = disallows.filter(patternMatches(_, path))
      .map(_.length).maxOption.getOrElse(-1)
    bestAllow >= bestDisallow
  }

  /** Parse each host's robots.txt ONCE: (hostCol, allows ARRAY,
    * disallows ARRAY) — the compiled form [[filterAllowed]] joins
    * against (per-row map over the per-host table; pages never pay a
    * re-parse).
    */
  def compileRules(robots: DataFrame, agent: String,
      hostCol: String = "host", txtCol: String = "robots_txt"): DataFrame = {
    val parseUdf = udf((txt: String) => {
      val (a, d) = parse(txt, agent)
      (a, d)
    })
    robots.select(col(hostCol), parseUdf(col(txtCol)).as("r"))
      .select(col(hostCol), col("r._1").as("allows"), col("r._2").as("disallows"))
  }

  /** Per-host crawl-delay table: (hostCol, crawl_delay DOUBLE seconds) —
    * only hosts that DECLARE a delay for `agent` emit a row (join left
    * and treat null as "no rate limit"). The [[Frontier.select]]
    * `hostDelays` input. Per-row map over the per-host robots table.
    */
  def compileDelays(robots: DataFrame, agent: String,
      hostCol: String = "host", txtCol: String = "robots_txt"): DataFrame = {
    val delayUdf = udf((txt: String) => crawlDelay(txt, agent))
    robots.select(col(hostCol), delayUdf(col(txtCol)).as("crawl_delay"))
      .filter(col("crawl_delay").isNotNull)
  }

  /** Pages → (page columns…, allowed BOOLEAN): host extracted from the
    * URL, joined to [[compileRules]] output on the host key; a host with
    * NO robots row is allowed (the crawl convention). One hash join on
    * an 8-to-40-byte key plus a per-row rule scan.
    */
  def filterAllowed(pages: DataFrame, compiledRules: DataFrame,
      urlCol: String = "url", hostCol: String = "host"): DataFrame = {
    val evalUdf = udf((allows: Seq[String], disallows: Seq[String],
        path: String) =>
      if (allows == null && disallows == null) true
      else isAllowed(Option(allows).getOrElse(Seq.empty),
        Option(disallows).getOrElse(Seq.empty), path))
    val withHost = pages.withColumn("_host",
        lower(regexp_extract(col(urlCol), "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/]+)", 1)))
      .withColumn("_path",
        regexp_replace(col(urlCol), "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*", ""))
      .withColumn("_path", when(col("_path") === "", "/").otherwise(col("_path")))
    withHost
      .join(compiledRules.withColumnRenamed(hostCol, "_host"), Seq("_host"), "left")
      .withColumn("allowed", evalUdf(col("allows"), col("disallows"), col("_path")))
      .drop("_host", "_path", "allows", "disallows")
  }
}
