package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Edge cases of the canonicalizer the synthesized q285 corpus can't
  * reach: https default port, unknown schemes, schemeless input, pure
  * tracking queries, null totality.
  */
class UrlFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(url: String): String =
    Seq(Tuple1(url)).toDF("u")
      .select(UrlFunctions.canonicalizeUrl(col("u"))).as[String].head()

  test("component rules: case, ports, userinfo, fragment, params") {
    assert(canon("HTTPS://Host.COM:443/x?b=2&a=1") == "https://host.com/x?a=1&b=2")
    assert(canon("https://h.com:8443/") == "https://h.com:8443/")
    assert(canon("ftp://H.com:21/f") == "ftp://h.com:21/f",
      "only http/https default ports are dropped")
    assert(canon("http://a.com#frag") == "http://a.com/")
    assert(canon("http://u:p@a.com/x") == "http://a.com/x")
    assert(canon("http://a.com/x?utm_source=1&utm_medium=2") == "http://a.com/x",
      "a query of only tracking params disappears entirely")
    assert(canon("http://a.com/x?b=2&&a=1&") == "http://a.com/x?a=1&b=2",
      "empty params from doubled separators are dropped")
  }

  test("schemeless input passes through the same split, total and stable") {
    assert(canon("example.com/x?a=1") == "://example.com/x?a=1")
    assert(canon(canon("example.com/x?a=1")) == "://example.com/x?a=1",
      "canonicalization is idempotent")
  }

  test("idempotent on its own output for the full rule set") {
    val dirty = "HTTP://U:P@WWW.Site.COM:80/p/3?utm_x=1&z=9&a=1#f"
    assert(canon(canon(dirty)) == canon(dirty))
  }

  test("null stays null (total over dirty corpora)") {
    val out = Seq(Tuple1(null: String)).toDF("u")
      .select(UrlFunctions.canonicalizeUrl(col("u"))).collect()(0)
    assert(out.isNullAt(0))
  }

  test("hostOf / domainOf extract from the canonical form") {
    val c = canon("HTTP://WWW.Sub.Site.COM/x")
    assert(c == "http://www.sub.site.com/x")
    val df = Seq(Tuple1(c)).toDF("c")
    assert(df.select(UrlFunctions.hostOf(col("c"))).as[String].head() == "www.sub.site.com")
    assert(df.select(UrlFunctions.domainOf(col("c"))).as[String].head() == "site.com")
  }
}
