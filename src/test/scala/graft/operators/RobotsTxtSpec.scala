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
}
