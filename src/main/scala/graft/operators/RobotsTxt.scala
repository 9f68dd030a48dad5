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

  /** Allow/Disallow patterns of the most specific matching group for
    * `agent` (case-insensitive product-token match; `*` fallback;
    * empty Disallow = no rule, per RFC).
    */
  def parse(robotsTxt: String, agent: String): (Seq[String], Seq[String]) = {
    if (robotsTxt == null) return (Seq.empty, Seq.empty)
    val agentLc = agent.toLowerCase
    // split into groups: consecutive user-agent lines share the rules
    final case class Group(agents: Seq[String], allows: Seq[String],
        disallows: Seq[String])
    val groups = scala.collection.mutable.ArrayBuffer.empty[Group]
    var agents = scala.collection.mutable.ArrayBuffer.empty[String]
    var allows = scala.collection.mutable.ArrayBuffer.empty[String]
    var disallows = scala.collection.mutable.ArrayBuffer.empty[String]
    var inAgents = true
    def flush(): Unit = {
      if (agents.nonEmpty)
        groups += Group(agents.toSeq, allows.toSeq, disallows.toSeq)
      agents = scala.collection.mutable.ArrayBuffer.empty[String]
      allows = scala.collection.mutable.ArrayBuffer.empty[String]
      disallows = scala.collection.mutable.ArrayBuffer.empty[String]
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
          case _ => inAgents = false // sitemap/crawl-delay/unknown: ignored
        }
      }
    }
    flush()
    // most specific group: longest agent token that is a prefix of (or
    // contained in) the caller's agent; '*' fallback
    val candidates = groups.flatMap { g =>
      g.agents.collect {
        case a if a != "*" && agentLc.contains(a) => (a.length, g)
      }
    }
    val chosen =
      if (candidates.nonEmpty) Some(candidates.maxBy(_._1)._2)
      else groups.find(_.agents.contains("*"))
    chosen.map(g => (g.allows, g.disallows)).getOrElse((Seq.empty, Seq.empty))
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
