package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.RandomWalks

/** Deterministic random-walk training-pair queries. The walk's neighbor
  * choice is a pure integer function of (walk_id, step), so the oracle
  * replays the SAME walks step by step: ranked adjacency via
  * row_number(), each step a join on (src, pos = mix % deg), then the
  * skip-gram window join. Everything is exact integer/long arithmetic —
  * a hash oracle, no rounding anywhere.
  */
object WalkQueries {

  private val length = 5
  private val window = 2

  def all: Seq[GQuery] = Seq(

    // DeepWalk-style corpus generation: one 5-step walk from every 10th
    // doc over the quadratic link graph, skip-gram pairs within ±2 steps.
    GQuery(
      "q312_walk_pairs", {
        val steps = (1 to length).map { t =>
          s"""w$t AS MATERIALIZED (
             |  SELECT w.walk_id, a.dst AS node, $t AS step
             |  FROM w${t - 1} w JOIN adj a ON a.src = w.node
             |   AND a.pos = ((w.walk_id % 2147483647) * 48271::BIGINT
             |                + ${t}::BIGINT * 1013904223::BIGINT) % 2147483647 % a.deg)""".stripMargin
        }
        s"""WITH edges AS MATERIALIZED (
           |  SELECT DISTINCT doc_id AS src,
           |         (doc_id*doc_id + 1 + j*17) % (SELECT count(*) FROM documents) AS dst
           |  FROM documents, UNNEST([0,1,2]) AS t(j)
           |  WHERE (doc_id*doc_id + 1 + j*17) % (SELECT count(*) FROM documents) != doc_id),
           |adj AS MATERIALIZED (
           |  SELECT src, dst,
           |         row_number() OVER (PARTITION BY src ORDER BY dst) - 1 AS pos,
           |         count(*) OVER (PARTITION BY src) AS deg
           |  FROM edges),
           |w0 AS MATERIALIZED (
           |  SELECT doc_id AS walk_id, doc_id AS node, 0 AS step
           |  FROM documents WHERE doc_id % 10 = 0),
           |${steps.mkString(",\n")},
           |wk AS MATERIALIZED (
           |  ${(0 to length).map(t => s"SELECT * FROM w$t").mkString("\n  UNION ALL ")})
           |SELECT a.walk_id, a.step, a.node AS center, b.node AS context
           |FROM wk a JOIN wk b ON b.walk_id = a.walk_id
           | AND b.step != a.step AND abs(b.step - a.step) <= $window""".stripMargin
      }) { (s, dir) =>
      val starts = Tables.documents(s, dir)
        .filter(col("doc_id") % 10 === 0).select(col("doc_id").as("id"))
      val wk = RandomWalks.walks(GraphQueries.quadFixture(s, dir), starts, length)
      RandomWalks.skipGramPairs(wk, window)
    })
}
