package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{Katz, Scc}

/** Katz centrality + SCC condensation queries. q321 unrolls the damped
  * walk-count iteration over the quadratic fixture (no normalization, no
  * dangling term — the chain is q287's minus both). q320's condensation
  * ground truth is closed-form on the q319 star fixture: exactly one
  * cross edge per non-zero group, all pointing at component 0.
  */
object KatzQueries {

  private val iters = 6

  def all: Seq[GQuery] = Seq(

    // Condensation DAG of the q319 fixture: (8g → 0, cnt 1) per group.
    GQuery(
      "q320_scc_condensation",
      """SELECT DISTINCT (doc_id // 8) * 8 AS scc_src, 0::BIGINT AS scc_dst,
        |       1::BIGINT AS cnt
        |FROM documents WHERE doc_id // 8 > 0""".stripMargin) { (s, dir) =>
      val docs = graft.Tables.documents(s, dir).select(col("doc_id"))
      val m = expr("(doc_id div 8) * 8")
      val size = least(lit(8L), lit(docs.count()) - m)
      val cyc = docs.select(col("doc_id").as("src"),
        (m + pmod(col("doc_id") - m + 1, size)).as("dst"))
      val chord = docs.select(col("doc_id").as("src"),
        (m + pmod(col("doc_id") - m + 2, size)).as("dst"))
      val cross = docs.filter(col("doc_id") === m && col("doc_id") > 0)
        .select(col("doc_id").as("src"), lit(0L).as("dst"))
      val edges = cyc.unionByName(chord).unionByName(cross)
        .filter(col("src") =!= col("dst"))
      Scc.condense(edges, Scc.scc(edges))
    },

    // 6 Katz rounds, α = 0.2, over the quadratic graph.
    GQuery(
      "q321_katz", {
        val steps = (1 to iters).map { i =>
          val p = s"c${i - 1}"
          s"""c$i AS MATERIALIZED (
             |  SELECT n.id,
             |         1::DOUBLE + 0.2::DOUBLE * coalesce(ct.s, 0::DOUBLE) AS katz
             |  FROM nodes n
             |  LEFT JOIN (SELECT e.dst AS id, sum(p.katz) AS s
             |             FROM $p p JOIN edges e ON e.src = p.id
             |             GROUP BY e.dst) ct ON ct.id = n.id)""".stripMargin
        }
        s"""WITH edges AS MATERIALIZED (
           |  SELECT DISTINCT doc_id AS src,
           |         (doc_id*doc_id + 1 + j*17) % (SELECT count(*) FROM documents) AS dst
           |  FROM documents, UNNEST([0,1,2]) AS t(j)
           |  WHERE (doc_id*doc_id + 1 + j*17) % (SELECT count(*) FROM documents) != doc_id),
           |nodes AS MATERIALIZED (SELECT DISTINCT id FROM
           |  (SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges)),
           |c0 AS MATERIALIZED (SELECT id, 1.0::DOUBLE AS katz FROM nodes),
           |${steps.mkString(",\n")}
           |SELECT id AS doc_id, round(katz, 6) AS katz FROM c$iters""".stripMargin
      }) { (s, dir) =>
      Katz.katz(GraphQueries.quadFixture(s, dir), iters)
        .select(col("id").as("doc_id"), round(col("katz"), 6).as("katz"))
    })
}
