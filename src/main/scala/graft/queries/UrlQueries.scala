package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.UrlFunctions

/** URL-canonicalization queries. The documents table carries no URL
  * column, so both sides derive the SAME deterministic dirty URL from
  * (doc_id, source) — mixed-case scheme/host, userinfo, default and
  * non-default ports, empty paths, tracking params in shuffled order,
  * trailing fragments — and the queries prove the canonicalizer collapses
  * exactly the variants it should: the kernel under test is the
  * canonicalization, not the synthesis.
  */
object UrlQueries {

  /** Dirty-URL synthesis (Spark side). Every branch keys off doc_id mods
    * so the SQL twin replays it bit-for-bit.
    */
  private def dirtyUrl = concat(
    lit("HTTP://"),
    when(col("doc_id") % 3 === 0, lit("User:Pw@")).otherwise(lit("")),
    when(col("doc_id") % 2 === 0, lit("WWW.")).otherwise(lit("")),
    col("source"), lit(".Example.COM"),
    when(col("doc_id") % 5 === 0, lit(":80"))
      .otherwise(when(col("doc_id") % 7 === 0, lit(":8080")).otherwise(lit(""))),
    when(col("doc_id") % 11 === 0, lit(""))
      .otherwise(concat(lit("/p/"), (col("doc_id") % 13).cast("string"))),
    when(col("doc_id") % 2 === 0, lit("?utm_source=x&b=2&a=1"))
      .otherwise(lit("?z=9&a=1&utm_campaign=c&")),
    when(col("doc_id") % 4 === 0, lit("#frag")).otherwise(lit("")))

  /** The same synthesis in DuckDB SQL. */
  private val dirtyUrlSql =
    """concat('HTTP://',
      |  CASE WHEN doc_id % 3 = 0 THEN 'User:Pw@' ELSE '' END,
      |  CASE WHEN doc_id % 2 = 0 THEN 'WWW.' ELSE '' END,
      |  source, '.Example.COM',
      |  CASE WHEN doc_id % 5 = 0 THEN ':80'
      |       WHEN doc_id % 7 = 0 THEN ':8080' ELSE '' END,
      |  CASE WHEN doc_id % 11 = 0 THEN ''
      |       ELSE concat('/p/', (doc_id % 13)::VARCHAR) END,
      |  CASE WHEN doc_id % 2 = 0 THEN '?utm_source=x&b=2&a=1'
      |       ELSE '?z=9&a=1&utm_campaign=c&' END,
      |  CASE WHEN doc_id % 4 = 0 THEN '#frag' ELSE '' END)""".stripMargin

  def all: Seq[GQuery] = Seq(

    // Canonicalization itself, one row per doc: lowercased scheme/host,
    // userinfo gone, :80 dropped / :8080 kept, empty path -> '/',
    // fragment gone, tracking params gone, survivors sorted. The oracle
    // is UrlFunctions.canonicalizeUrlSql — the SQL twin maintained NEXT
    // TO the Spark rules so they cannot drift silently.
    GQuery(
      "q285_url_canonicalize",
      s"""WITH t AS (SELECT doc_id, $dirtyUrlSql AS url FROM documents)
         |SELECT doc_id, ${UrlFunctions.canonicalizeUrlSql("url")} AS canon_url
         |FROM t""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          UrlFunctions.canonicalizeUrl(dirtyUrl).as("canon_url"))
    },

    // URL-level dedup card: canonical groups that actually collapsed
    // (>1 doc), keeper = least doc_id — proving the merges the rules
    // promise (port-80 variant merges with portless, userinfo variants
    // merge, tracking params never split a group).
    GQuery(
      "q286_url_dedup_card",
      s"""WITH t AS (SELECT doc_id, $dirtyUrlSql AS url FROM documents),
         |c AS (SELECT doc_id, ${UrlFunctions.canonicalizeUrlSql("url")} AS canon_url
         |      FROM t)
         |SELECT canon_url, min(doc_id) AS keeper_doc, count(*) AS n_docs
         |FROM c GROUP BY canon_url HAVING count(*) > 1""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          UrlFunctions.canonicalizeUrl(dirtyUrl).as("canon_url"))
        .groupBy("canon_url")
        .agg(min(col("doc_id")).as("keeper_doc"), count(lit(1)).as("n_docs"))
        .filter(col("n_docs") > 1)
    },

    // Composition card: canonical HOST graph -> PageRank = the Common-
    // Crawl-style host authority ranking. Doc d's host links to the host
    // of doc (3d+7 mod N); rank the ~40 hosts with 10 damped iterations.
    // The oracle chains the canonicalizer replay, the host extraction,
    // the edge build and the unrolled MATERIALIZED power iteration —
    // one green row proves the ops COMPOSE, not just pass alone.
    GQuery(
      "q295_host_authority",
      s"""WITH t AS (SELECT doc_id, $dirtyUrlSql AS url FROM documents),
         |h AS MATERIALIZED (
         |  SELECT doc_id,
         |         regexp_extract(${UrlFunctions.canonicalizeUrlSql("url")},
         |                        '^[a-z0-9+.-]*://([^/:?]*)', 1) AS host
         |  FROM t),
         |nn AS (SELECT count(*) AS n FROM documents),
         |edges AS MATERIALIZED (
         |  SELECT DISTINCT a.host AS src, b.host AS dst
         |  FROM h a JOIN h b ON b.doc_id = (a.doc_id*3 + 7) % (SELECT n FROM nn)
         |  WHERE a.host != b.host),
         |nodes AS MATERIALIZED (SELECT DISTINCT host AS id FROM
         |  (SELECT src AS host FROM edges UNION ALL SELECT dst FROM edges)),
         |odeg AS MATERIALIZED (SELECT src, count(*)::DOUBLE AS deg FROM edges GROUP BY src),
         |hn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
         |r0 AS MATERIALIZED (SELECT id, 1::DOUBLE/hn.n AS rank FROM nodes CROSS JOIN hn),
         |${(1 to 10).map { i =>
            val p = s"r${i - 1}"
            s"""r$i AS MATERIALIZED (
               |  SELECT n.id,
               |         (1::DOUBLE - 0.85::DOUBLE)/hn.n
               |         + 0.85::DOUBLE * (coalesce(c.s, 0::DOUBLE) + dg.m/hn.n) AS rank
               |  FROM nodes n
               |  CROSS JOIN hn
               |  LEFT JOIN (SELECT e.dst AS id, sum(p.rank / od.deg) AS s
               |             FROM $p p JOIN edges e ON e.src = p.id
               |             JOIN odeg od ON od.src = e.src
               |             GROUP BY e.dst) c ON c.id = n.id
               |  CROSS JOIN (SELECT coalesce(sum(p.rank), 0::DOUBLE) AS m FROM $p p
               |              WHERE NOT EXISTS (SELECT 1 FROM odeg od WHERE od.src = p.id)) dg)""".stripMargin
          }.mkString(",\n")}
         |SELECT id AS host, round(rank, 6) AS rank FROM r10""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val n = docs.count()
      val hosts = docs.select(col("doc_id"),
        UrlFunctions.hostOf(UrlFunctions.canonicalizeUrl(dirtyUrl)).as("host"))
      val edges = hosts.as("a")
        .join(hosts.as("b"),
          col("b.doc_id") === (col("a.doc_id") * 3 + 7) % n)
        .select(col("a.host").as("src"), col("b.host").as("dst"))
        .filter(col("src") =!= col("dst")).distinct()
      graft.operators.PageRank.pageRank(edges, iters = 10)
        .select(col("id").as("host"), round(col("rank"), 6).as("rank"))
    })
}
