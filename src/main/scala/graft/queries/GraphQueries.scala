package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.PageRank

/** Link-graph queries. The corpus carries no link column, so both sides
  * derive the SAME deterministic 3-out-regular graph over doc ids
  * (dst = (src·7 + j·13 + 1) mod N, self-loops dropped) — the kernel
  * under test is the distributed power iteration, not the synthesis.
  * The oracle unrolls all iterations as MATERIALIZED CTEs: each r_t is
  * referenced twice (contributions + dangling mass), and an inlining
  * planner would otherwise duplicate the whole chain 2^T times.
  */
object GraphQueries {

  private val iters = 10

  /** Spark-side deterministic edge fixture. */
  private def edgeFixture(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val docs = Tables.documents(s, dir).select(col("doc_id"))
    val n = docs.count()
    docs.select(col("doc_id").as("src"),
        explode(array(lit(0), lit(1), lit(2))).as("j"))
      .select(col("src"), ((col("src") * 7 + col("j") * 13 + 1) % n).as("dst"))
      .filter(col("dst") =!= col("src"))
  }

  /** The same fixture + T unrolled damped iterations in DuckDB SQL.
    * Exposes r{T} (and r{T+1} when `extraStep`, for the delta card).
    */
  private def prSql(t: Int, extraStep: Boolean): String = {
    val base =
      """edges AS MATERIALIZED (
        |  SELECT DISTINCT doc_id AS src,
        |         (doc_id*7 + j*13 + 1) % (SELECT count(*) FROM documents) AS dst
        |  FROM documents, UNNEST([0,1,2]) AS t(j)
        |  WHERE (doc_id*7 + j*13 + 1) % (SELECT count(*) FROM documents) != doc_id),
        |nodes AS MATERIALIZED (SELECT DISTINCT id FROM
        |  (SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges)),
        |odeg AS MATERIALIZED (SELECT src, count(*)::DOUBLE AS deg FROM edges GROUP BY src),
        |nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
        |r0 AS MATERIALIZED (SELECT id, 1::DOUBLE/nn.n AS rank FROM nodes CROSS JOIN nn)""".stripMargin
    val steps = (1 to (if (extraStep) t + 1 else t)).map { i =>
      val p = s"r${i - 1}"
      s"""r$i AS MATERIALIZED (
         |  SELECT n.id,
         |         (1::DOUBLE - 0.85::DOUBLE)/nn.n
         |         + 0.85::DOUBLE * (coalesce(c.s, 0::DOUBLE) + dg.m/nn.n) AS rank
         |  FROM nodes n
         |  CROSS JOIN nn
         |  LEFT JOIN (SELECT e.dst AS id, sum(p.rank / od.deg) AS s
         |             FROM $p p JOIN edges e ON e.src = p.id
         |             JOIN odeg od ON od.src = e.src
         |             GROUP BY e.dst) c ON c.id = n.id
         |  CROSS JOIN (SELECT coalesce(sum(p.rank), 0::DOUBLE) AS m FROM $p p
         |              WHERE NOT EXISTS (SELECT 1 FROM odeg od WHERE od.src = p.id)) dg)""".stripMargin
    }
    "WITH " + base + ",\n" + steps.mkString(",\n")
  }

  def all: Seq[GQuery] = Seq(

    // 10 damped power iterations over the 3-out-regular doc graph. Per-
    // iteration float summation ORDER differs between engines (and across
    // Spark partitionings), so ranks compare at 6 decimals — drift is
    // ~1e-12 against values ~1/N.
    GQuery(
      "q287_pagerank",
      s"""${prSql(iters, extraStep = false)}
         |SELECT id AS doc_id, round(rank, 6) AS rank FROM r$iters""".stripMargin) { (s, dir) =>
      PageRank.pageRank(edgeFixture(s, dir), iters)
        .select(col("id").as("doc_id"), round(col("rank"), 6).as("rank"))
    },

    // Convergence instrument: L1 distance one step past the returned
    // ranks — the scalar that says whether T iterations sufficed.
    GQuery(
      "q288_pagerank_delta",
      s"""${prSql(iters, extraStep = true)}
         |SELECT round(sum(abs(b.rank - a.rank)), 8) AS l1_delta
         |FROM r$iters a JOIN r${iters + 1} b USING (id)""".stripMargin) { (s, dir) =>
      val edges = edgeFixture(s, dir)
      val ranks = PageRank.pageRank(edges, iters)
      PageRank.l1Delta(edges, ranks)
        .select(round(col("l1_delta"), 8).as("l1_delta"))
    },

    // Personalized PageRank from a 10-doc seed set: teleport AND dangling
    // mass flow to the seeds — link-proximity ranking for seed-based
    // corpus expansion. Same unrolled-MATERIALIZED oracle with p(v)
    // replacing 1/N in both places it appears.
    GQuery(
      "q298_personalized_pagerank",
      s"""WITH edges AS MATERIALIZED (
         |  SELECT DISTINCT doc_id AS src,
         |         (doc_id*7 + j*13 + 1) % (SELECT count(*) FROM documents) AS dst
         |  FROM documents, UNNEST([0,1,2]) AS t(j)
         |  WHERE (doc_id*7 + j*13 + 1) % (SELECT count(*) FROM documents) != doc_id),
         |nodes AS MATERIALIZED (SELECT DISTINCT id FROM
         |  (SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges)),
         |odeg AS MATERIALIZED (SELECT src, count(*)::DOUBLE AS deg FROM edges GROUP BY src),
         |ts AS (SELECT sum(CASE WHEN id < 10 THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END) AS t
         |       FROM nodes),
         |pv AS MATERIALIZED (
         |  SELECT id, (CASE WHEN id < 10 THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END) / ts.t AS p
         |  FROM nodes CROSS JOIN ts),
         |r0 AS MATERIALIZED (SELECT id, p AS rank FROM pv),
         |${(1 to iters).map { i =>
            val pr = s"r${i - 1}"
            s"""r$i AS MATERIALIZED (
               |  SELECT pv.id,
               |         (1::DOUBLE - 0.85::DOUBLE) * pv.p
               |         + 0.85::DOUBLE * (coalesce(c.s, 0::DOUBLE) + dg.m * pv.p) AS rank
               |  FROM pv
               |  LEFT JOIN (SELECT e.dst AS id, sum(q.rank / od.deg) AS s
               |             FROM $pr q JOIN edges e ON e.src = q.id
               |             JOIN odeg od ON od.src = e.src
               |             GROUP BY e.dst) c ON c.id = pv.id
               |  CROSS JOIN (SELECT coalesce(sum(q.rank), 0::DOUBLE) AS m FROM $pr q
               |              WHERE NOT EXISTS (SELECT 1 FROM odeg od WHERE od.src = q.id)) dg)""".stripMargin
          }.mkString(",\n")}
         |SELECT id AS doc_id, round(rank, 8) AS rank FROM r$iters""".stripMargin) {
      (s, dir) =>
      val docs = Tables.documents(s, dir)
      val seeds = docs.filter(col("doc_id") < 10)
        .select(col("doc_id").as("id"), lit(1.0).as("weight"))
      PageRank.personalizedPageRank(edgeFixture(s, dir), seeds, iters)
        .select(col("id").as("doc_id"), round(col("rank"), 8).as("rank"))
    })
}
