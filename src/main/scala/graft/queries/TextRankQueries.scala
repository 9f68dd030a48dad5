package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.TextRank

/** TextRank keyword-salience query: token co-occurrence graph (window 2,
  * count-weighted, symmetrized, noise floor minCount) into the weighted
  * PageRank power iteration. The oracle replays the co-occurrence build
  * with DuckDB list slicing (the q262 tokenization contract) and unrolls
  * the 10 weighted rounds as MATERIALIZED CTEs (q299's chain shape with
  * string ids). The graph is symmetric so no node dangles; the oracle
  * keeps the general dangling term (it evaluates to 0) to stay the exact
  * twin of the operator's arithmetic.
  */
object TextRankQueries {

  private val iters = 10

  def all: Seq[GQuery] = Seq(

    GQuery(
      "q313_textrank", {
        val steps = (1 to iters).map { i =>
          val p = s"r${i - 1}"
          s"""r$i AS MATERIALIZED (
             |  SELECT n.id,
             |         (1::DOUBLE - 0.85::DOUBLE)/nn.n
             |         + 0.85::DOUBLE * (coalesce(c.s, 0::DOUBLE) + dg.m/nn.n) AS rank
             |  FROM nodes n CROSS JOIN nn
             |  LEFT JOIN (SELECT e.dst AS id, sum(p.rank * e.w / od.deg) AS s
             |             FROM $p p JOIN edges e ON e.src = p.id
             |             JOIN odeg od ON od.src = e.src
             |             GROUP BY e.dst) c ON c.id = n.id
             |  CROSS JOIN (SELECT coalesce(sum(p.rank), 0::DOUBLE) AS m FROM $p p
             |              WHERE NOT EXISTS (SELECT 1 FROM odeg od WHERE od.src = p.id)) dg)""".stripMargin
        }
        s"""WITH tk AS (
           |  SELECT list_filter(string_split(lower(text), ' '), x -> x != '') AS t
           |  FROM documents),
           |p1 AS (SELECT unnest(t[1:len(t)-1]) AS a, unnest(t[2:len(t)]) AS b
           |       FROM tk WHERE len(t) >= 2),
           |p2 AS (SELECT unnest(t[1:len(t)-2]) AS a, unnest(t[3:len(t)]) AS b
           |       FROM tk WHERE len(t) >= 3),
           |pp AS (SELECT a, b FROM p1 UNION ALL SELECT a, b FROM p2),
           |und AS (SELECT a, b FROM pp WHERE a != b
           |        UNION ALL SELECT b AS a, a AS b FROM pp WHERE a != b),
           |edges AS MATERIALIZED (
           |  SELECT a AS src, b AS dst, count(*)::DOUBLE AS w
           |  FROM und GROUP BY a, b HAVING count(*) >= 5),
           |nodes AS MATERIALIZED (SELECT DISTINCT id FROM
           |  (SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges)),
           |odeg AS MATERIALIZED (SELECT src, sum(w) AS deg FROM edges GROUP BY src),
           |nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
           |r0 AS MATERIALIZED (
           |  SELECT id, 1::DOUBLE/nn.n AS rank FROM nodes CROSS JOIN nn),
           |${steps.mkString(",\n")}
           |SELECT id AS token, round(rank, 8) AS rank FROM r$iters""".stripMargin
      }) { (s, dir) =>
      TextRank.tokenRanks(Tables.documents(s, dir), "text",
          window = 2, minCount = 5L, iters = iters)
        .select(col("token"), round(col("rank"), 8).as("rank"))
    })
}
