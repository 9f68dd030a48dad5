package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.Hits

/** HITS hub/authority queries over the deterministic link fixtures
  * ([[GraphQueries]]). The quadratic graph's irregular in-degrees make
  * the hub/authority split non-trivial (the 3-out-regular graph would
  * converge to uniform hubs). The oracle unrolls every half-step as
  * MATERIALIZED CTEs — each frame is referenced twice (next half-step
  * join + its own L1 normalizer), the same inlining hazard the PageRank
  * oracles guard against.
  */
object HitsQueries {

  private val iters = 8

  def all: Seq[GQuery] = Seq(

    // 8 mutual raw updates a_t = Aᵀ h_{t-1}, h_t = A a_t, ONE L1
    // normalization at the end (linear ⇒ same direction as the textbook
    // per-round-normalized form; Hits.scala). Scores compare at 6
    // decimals (float summation order is the only engine difference).
    GQuery(
      "q311_hits", {
        val base =
          """edges AS MATERIALIZED (
            |  SELECT DISTINCT doc_id AS src,
            |         (doc_id*doc_id + 1 + j*17) % (SELECT count(*) FROM documents) AS dst
            |  FROM documents, UNNEST([0,1,2]) AS t(j)
            |  WHERE (doc_id*doc_id + 1 + j*17) % (SELECT count(*) FROM documents) != doc_id),
            |nodes AS MATERIALIZED (SELECT DISTINCT id FROM
            |  (SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges)),
            |h0 AS MATERIALIZED (SELECT id, 1.0::DOUBLE AS score FROM nodes)""".stripMargin
        val steps = (1 to iters).map { i =>
          s"""a$i AS MATERIALIZED (
             |  SELECT e.dst AS id, sum(h.score) AS score
             |  FROM h${i - 1} h JOIN edges e ON e.src = h.id GROUP BY e.dst),
             |h$i AS MATERIALIZED (
             |  SELECT e.src AS id, sum(a.score) AS score
             |  FROM a$i a JOIN edges e ON e.dst = a.id GROUP BY e.src)""".stripMargin
        }
        s"""WITH $base,
           |${steps.mkString(",\n")}
           |SELECT n.id AS doc_id,
           |       round(coalesce(h.score, 0::DOUBLE) / (SELECT sum(score) FROM h$iters), 6) AS hub,
           |       round(coalesce(a.score, 0::DOUBLE) / (SELECT sum(score) FROM a$iters), 6) AS auth
           |FROM nodes n LEFT JOIN h$iters h ON h.id = n.id
           |LEFT JOIN a$iters a ON a.id = n.id""".stripMargin
      }) { (s, dir) =>
      Hits.hits(GraphQueries.quadFixture(s, dir), iters)
        .select(col("id").as("doc_id"),
          round(col("hub"), 6).as("hub"), round(col("auth"), 6).as("auth"))
    })
}
