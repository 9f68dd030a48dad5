package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.Neighborhoods

/** Bounded-BFS neighborhood queries over the quadratic link fixture.
  * The oracle unrolls the level-synchronous BFS: frontier_d = (frontier
  * ⋈ edges) EXCEPT known, known_d = known ∪ frontier_d — pure set
  * semantics, so q314 is integer-exact and only q315's harmonic sum
  * rounds. Radius 3 keeps the exact pair relation at Σ|B_3(v)| ≈ 40·N
  * rows (the operator's scale posture: exact for moderate R or seed
  * samples, [[graft.operators.Neighborhoods.hyperBall]] beyond).
  */
object NeighborhoodQueries {

  private val radius = 3

  /** Shared BFS CTE chain: edges/nodes + f1..fR, k1..kR. */
  private def bfsSql: String = {
    val base =
      """edges AS MATERIALIZED (
        |  SELECT DISTINCT doc_id AS src,
        |         (doc_id*doc_id + 1 + j*17) % (SELECT count(*) FROM documents) AS dst
        |  FROM documents, UNNEST([0,1,2]) AS t(j)
        |  WHERE (doc_id*doc_id + 1 + j*17) % (SELECT count(*) FROM documents) != doc_id),
        |nodes AS MATERIALIZED (SELECT DISTINCT id FROM
        |  (SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges)),
        |k0 AS MATERIALIZED (SELECT id, id AS other FROM nodes),
        |f0 AS MATERIALIZED (SELECT id, other FROM k0)""".stripMargin
    val rounds = (1 to radius).map { d =>
      s"""f$d AS MATERIALIZED (
         |  SELECT id, other FROM (
         |    SELECT DISTINCT p.id, e.dst AS other
         |    FROM f${d - 1} p JOIN edges e ON e.src = p.other)
         |  EXCEPT SELECT id, other FROM k${d - 1}),
         |k$d AS MATERIALIZED (
         |  SELECT id, other FROM k${d - 1} UNION SELECT id, other FROM f$d)""".stripMargin
    }
    val shells = (1 to radius)
      .map(d => s"SELECT id, $d AS dist, other FROM f$d")
      .mkString("\n  UNION ALL ")
    s"$base,\n${rounds.mkString(",\n")},\nshells AS MATERIALIZED ($shells)"
  }

  def all: Seq[GQuery] = Seq(

    // Exact neighborhood function: per-distance shell sizes + cumulative
    // ball size — the curve HyperBall estimates. Integer-exact oracle.
    GQuery(
      "q314_neighborhood_function",
      s"""WITH $bfsSql
         |SELECT id AS doc_id, dist, count(*) AS cnt,
         |       (sum(count(*)) OVER (PARTITION BY id ORDER BY dist))::BIGINT AS ball
         |FROM shells GROUP BY id, dist""".stripMargin) { (s, dir) =>
      Neighborhoods.neighborhoodFunction(GraphQueries.quadFixture(s, dir), radius)
        .select(col("id").as("doc_id"), col("dist"), col("cnt"), col("ball"))
    },

    // Harmonic centrality within radius 3: Σ 1/d over the shells.
    GQuery(
      "q315_harmonic_centrality",
      s"""WITH $bfsSql
         |SELECT id AS doc_id, round(sum(1::DOUBLE / dist), 6) AS harmonic
         |FROM shells GROUP BY id""".stripMargin) { (s, dir) =>
      Neighborhoods.harmonicCentrality(GraphQueries.quadFixture(s, dir), radius)
        .select(col("id").as("doc_id"), round(col("harmonic"), 6).as("harmonic"))
    },

    // Bounded-hop weighted shortest paths (4 Bellman-Ford rounds) from a
    // 10-doc seed set over the quadratic graph with (src+dst)%7+1 weights.
    // Integer weights make every distance exact; the oracle unrolls the
    // same relaxation rounds.
    GQuery(
      "q326_weighted_sssp", {
        val steps = (1 to 4).map { i =>
          s"""d$i AS MATERIALIZED (
             |  SELECT id, min(dist) AS dist FROM (
             |    SELECT id, dist FROM d${i - 1}
             |    UNION ALL
             |    SELECT e.dst AS id, p.dist + e.w AS dist
             |    FROM d${i - 1} p JOIN edges e ON e.src = p.id)
             |  GROUP BY id)""".stripMargin
        }
        s"""WITH raw AS (
           |  SELECT DISTINCT doc_id AS src,
           |         (doc_id*doc_id + 1 + j*17) % (SELECT count(*) FROM documents) AS dst
           |  FROM documents, UNNEST([0,1,2]) AS t(j)
           |  WHERE (doc_id*doc_id + 1 + j*17) % (SELECT count(*) FROM documents) != doc_id),
           |edges AS MATERIALIZED (
           |  SELECT src, dst, ((src + dst) % 7 + 1)::DOUBLE AS w FROM raw),
           |d0 AS MATERIALIZED (
           |  SELECT doc_id AS id, 0.0::DOUBLE AS dist FROM documents WHERE doc_id < 10),
           |${steps.mkString(",\n")}
           |SELECT id AS doc_id, round(dist, 6) AS dist FROM d4""".stripMargin
      }) { (s, dir) =>
      val weighted = GraphQueries.quadFixture(s, dir)
        .withColumn("w", ((col("src") + col("dst")) % 7 + 1).cast("double"))
      val seeds = graft.Tables.documents(s, dir)
        .filter(col("doc_id") < 10).select(col("doc_id").as("id"))
      Neighborhoods.boundedWeightedDistances(weighted, seeds, rounds = 4)
        .select(col("id").as("doc_id"), round(col("dist"), 6).as("dist"))
    })
}
