package graft.operators

import graft.SparkSpec

/** RFC 9309 contracts: pattern matching (wildcards, end anchor,
  * recurring literals), group selection (specific agent over `*`),
  * longest-match precedence with Allow winning ties, the no-rule and
  * no-robots defaults, and the compiled host-join DataFrame form.
  */
class RobotsTxtSpec extends SparkSpec {
  import spark.implicits._

  test("patternMatches: prefix, wildcard, anchor, recurring literal") {
    assert(RobotsTxt.patternMatches("/private/", "/private/x"))
    assert(!RobotsTxt.patternMatches("/private/", "/public/x"))
    assert(RobotsTxt.patternMatches("/*.bin$", "/data/x.bin"))
    assert(!RobotsTxt.patternMatches("/*.bin$", "/data/x.bino"))
    // the greedy-walk trap: the anchor must match on the LAST occurrence
    assert(RobotsTxt.patternMatches("/*.bin$", "/a.bin.bin"))
    assert(RobotsTxt.patternMatches("/a/*/c", "/a/b/c/d"))
    assert(RobotsTxt.patternMatches("/", "/anything"))
  }

  private val robots =
    """# corpus policy
      |User-agent: graftbot
      |Disallow: /internal/
      |Allow: /internal/pub
      |
      |User-agent: *
      |Disallow: /
      |""".stripMargin

  test("group selection: the specific agent's group wins over *") {
    val (allows, disallows) = RobotsTxt.parse(robots, "GraftBot/1.0")
    assert(allows == Seq("/internal/pub"))
    assert(disallows == Seq("/internal/"))
    val (a2, d2) = RobotsTxt.parse(robots, "otherbot")
    assert(a2.isEmpty && d2 == Seq("/"))
  }

  test("longest match wins; Allow wins ties; no rule means allowed") {
    val (a, d) = RobotsTxt.parse(robots, "graftbot")
    assert(RobotsTxt.isAllowed(a, d, "/public/x"))
    assert(!RobotsTxt.isAllowed(a, d, "/internal/secret"))
    assert(RobotsTxt.isAllowed(a, d, "/internal/pub/doc"))
    // tie: Allow and Disallow patterns of equal length -> allowed
    assert(RobotsTxt.isAllowed(Seq("/a/"), Seq("/a/"), "/a/x"))
  }

  test("consecutive user-agent lines share one rule group; empty Disallow ignored") {
    val txt = "User-agent: a\nUser-agent: b\nDisallow: /x/\n\n" +
      "User-agent: *\nDisallow:\n"
    val (_, db) = RobotsTxt.parse(txt, "b")
    assert(db == Seq("/x/"))
    val (aw, dw) = RobotsTxt.parse(txt, "w")
    assert(aw.isEmpty && dw.isEmpty, "empty Disallow = allow everything")
  }

  test("null/malformed input degrades to allow-all, never throws") {
    assert(RobotsTxt.parse(null, "x") == (Seq.empty, Seq.empty))
    val (a, d) = RobotsTxt.parse("garbage line\n:::\nDisallow /nope", "x")
    assert(a.isEmpty && d.isEmpty)
  }

  test("filterAllowed: host join, per-host rules, missing robots -> allowed") {
    val pages = Seq(
      (1L, "http://h0.test/public/1"),
      (2L, "http://h0.test/internal/2"),
      (3L, "http://h0.test/internal/pub/3"),
      (4L, "http://nowhere.test/anything"),
      (5L, "http://h1.test/x")).toDF("doc_id", "url")
    val robotsDf = Seq(
      ("h0.test", robots),
      ("h1.test", "User-agent: *\nDisallow: /\n")).toDF("host", "robots_txt")
    val compiled = RobotsTxt.compileRules(robotsDf, "graftbot")
    val got = RobotsTxt.filterAllowed(pages, compiled)
      .select("doc_id", "allowed").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got == Map(1L -> true, 2L -> false, 3L -> true,
      4L -> true, 5L -> false))
  }

  test("RFC 9309 §2.2.1: same-specificity groups MERGE (union of rules)") {
    val txt = "User-agent: bot\nDisallow: /a/\n\n" +
      "User-agent: bot\nDisallow: /b/\nAllow: /b/ok\n"
    val (a, d) = RobotsTxt.parse(txt, "bot")
    assert(d.toSet == Set("/a/", "/b/"), s"both groups' disallows apply: $d")
    assert(a == Seq("/b/ok"))
    assert(!RobotsTxt.isAllowed(a, d, "/a/x"),
      "a path only the SECOND same-agent group disallows must be blocked")
    // '*' fallback also merges across all * groups
    val star = "User-agent: *\nDisallow: /x/\n\nUser-agent: *\nDisallow: /y/\n"
    val (_, dw) = RobotsTxt.parse(star, "anything")
    assert(dw.toSet == Set("/x/", "/y/"))
  }

  test("most specific match still wins over merged shorter matches") {
    val txt = "User-agent: bot\nDisallow: /all/\n\n" +
      "User-agent: graftbot\nDisallow: /gb/\n"
    // 'graftbot' contains both tokens; the longer token's group applies alone
    val (_, d) = RobotsTxt.parse(txt, "graftbot")
    assert(d == Seq("/gb/"))
  }

  test("Sitemap / unknown directives between User-agent lines never split a group") {
    val txt = "User-agent: a\nHost: h.test\nUser-agent: b\n" +
      "Sitemap: http://h.test/s.xml\nUser-agent: c\nDisallow: /x/\n"
    // all three agents share the one rule group — none gets an
    // over-permissive empty rule set from the interleaved directives
    Seq("a", "b", "c").foreach { ag =>
      val (_, d) = RobotsTxt.parse(txt, ag)
      assert(d == Seq("/x/"), s"agent $ag must inherit the shared Disallow")
    }
    assert(RobotsTxt.sitemaps(txt) == Seq("http://h.test/s.xml"))
    // Crawl-delay, by contrast, IS a rule line: it closes the run, so a
    // delay-only group never swallows the next User-agent
    val dtxt = "User-agent: a\nCrawl-delay: 2\nUser-agent: star\nDisallow: /y/\n"
    assert(RobotsTxt.crawlDelay(dtxt, "a") == Some(2.0))
    assert(RobotsTxt.parse(dtxt, "a") == ((Seq.empty, Seq.empty)))
    assert(RobotsTxt.parse(dtxt, "star")._2 == Seq("/y/"))
    assert(RobotsTxt.crawlDelay(dtxt, "star").isEmpty)
  }

  test("crawlDelay: per-agent, max across merged groups, None when absent") {
    val txt = "User-agent: graftbot\nDisallow: /g/\nCrawl-delay: 1.5\n\n" +
      "User-agent: graftbot\nCrawl-delay: 4\n\n" +
      "User-agent: *\nCrawl-delay: 10\n"
    assert(RobotsTxt.crawlDelay(txt, "graftbot") == Some(4.0),
      "merged same-agent groups take the most conservative (max) delay")
    assert(RobotsTxt.crawlDelay(txt, "otherbot") == Some(10.0), "* fallback")
    assert(RobotsTxt.crawlDelay("User-agent: *\nDisallow: /\n", "x").isEmpty)
    assert(RobotsTxt.crawlDelay(null, "x").isEmpty)
    // malformed / non-positive values skip silently
    assert(RobotsTxt.crawlDelay(
      "User-agent: *\nCrawl-delay: nope\n", "x").isEmpty)
    assert(RobotsTxt.crawlDelay(
      "User-agent: *\nCrawl-delay: -3\n", "x").isEmpty)
  }

  test("compileDelays: (host, crawl_delay) rows only for declaring hosts") {
    val robotsDf = Seq(
      ("h0.test", "User-agent: *\nCrawl-delay: 2\nDisallow: /p/\n"),
      ("h1.test", "User-agent: *\nDisallow: /\n"),
      ("h2.test", "User-agent: graftbot\nCrawl-delay: 0.5\n\nUser-agent: *\nCrawl-delay: 9\n"))
      .toDF("host", "robots_txt")
    val got = RobotsTxt.compileDelays(robotsDf, "graftbot")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == Map("h0.test" -> 2.0, "h2.test" -> 0.5))
  }
}
