package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Triangles

/** Triangle/clustering queries over a deterministic doc graph that
  * PLANTS triangles (chain edges d→d+1 plus a d→d+2 shortcut on every
  * fifth node closes {d, d+1, d+2}) on top of the long-range (3d+7) map.
  * The oracle counts triangles DIRECTLY — the canonical id-ordered
  * triple join — so a green row proves the degree-oriented wedge
  * algorithm loses and double-counts nothing; the canonicalizations
  * deliberately differ (oracle: x<y<z by id; engine: lowest-degree
  * apex), which per-node counts are invariant to.
  */
object TriangleQueries {

  private def edgeFixture(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val docs = Tables.documents(s, dir).select(col("doc_id"))
    val n = docs.count()
    docs.select(col("doc_id").as("src"), ((col("doc_id") * 3 + 7) % n).as("dst"))
      .union(docs.select(col("doc_id").as("src"), ((col("doc_id") + 1) % n).as("dst")))
      .union(docs.filter(col("doc_id") % 5 === 0)
        .select(col("doc_id").as("src"), ((col("doc_id") + 2) % n).as("dst")))
  }

  private val baseSql =
    """nn AS (SELECT count(*) AS n FROM documents),
      |raw AS (SELECT doc_id AS src, (doc_id*3 + 7) % nn.n AS dst FROM documents, nn
      |        UNION ALL
      |        SELECT doc_id, (doc_id + 1) % nn.n FROM documents, nn
      |        UNION ALL
      |        SELECT doc_id, (doc_id + 2) % nn.n FROM documents, nn
      |        WHERE doc_id % 5 = 0),
      |und AS MATERIALIZED (
      |  SELECT DISTINCT src, dst FROM
      |    (SELECT src, dst FROM raw UNION ALL SELECT dst, src FROM raw)
      |  WHERE src != dst),
      |deg AS MATERIALIZED (SELECT src AS id, count(*) AS deg FROM und GROUP BY src),
      |tris AS MATERIALIZED (
      |  SELECT a.src AS x, a.dst AS y, b.dst AS z
      |  FROM und a
      |  JOIN und b ON b.src = a.dst AND b.dst > a.dst
      |  JOIN und c ON c.src = a.src AND c.dst = b.dst
      |  WHERE a.dst > a.src),
      |pernode AS MATERIALIZED (
      |  SELECT id, count(*) AS tri FROM
      |    (SELECT x AS id FROM tris UNION ALL SELECT y FROM tris
      |     UNION ALL SELECT z FROM tris)
      |  GROUP BY id)""".stripMargin

  def all: Seq[GQuery] = Seq(

    // Per-node degree, triangle count and local clustering coefficient.
    GQuery(
      "q293_triangle_clustering",
      s"""WITH $baseSql
         |SELECT d.id AS doc_id, d.deg,
         |       coalesce(p.tri, 0) AS tri,
         |       round(CASE WHEN d.deg < 2 THEN 0.0
         |             ELSE coalesce(p.tri, 0)::DOUBLE * 2.0
         |                  / (d.deg * (d.deg - 1))::DOUBLE END, 6) AS clustering
         |FROM deg d LEFT JOIN pernode p ON p.id = d.id""".stripMargin) { (s, dir) =>
      Triangles.clusteringCoefficients(edgeFixture(s, dir))
        .select(col("id").as("doc_id"), col("deg"), col("tri"),
          round(col("clustering"), 6).as("clustering"))
    },

    // One-row density card: the near-dup-graph shape instrument (a
    // cliquey graph dedups cleanly; a chainy one over-merges under
    // transitive keep-one).
    GQuery(
      "q294_graph_density_card",
      s"""WITH $baseSql
         |SELECT (SELECT count(*) FROM deg) AS n_nodes,
         |       (SELECT sum(deg) / 2 FROM deg)::BIGINT AS n_edges,
         |       (SELECT count(*) FROM tris) AS n_triangles,
         |       round(CASE WHEN (SELECT sum(deg * (deg - 1)) / 2.0 FROM deg) > 0
         |             THEN 3.0 * (SELECT count(*) FROM tris)
         |                  / (SELECT sum(deg * (deg - 1)) / 2.0 FROM deg)
         |             ELSE 0.0 END, 6) AS global_clustering,
         |       (SELECT round(avg(CASE WHEN d.deg < 2 THEN 0.0
         |                        ELSE coalesce(p.tri, 0)::DOUBLE * 2.0
         |                             / (d.deg * (d.deg - 1))::DOUBLE END), 6)
         |        FROM deg d LEFT JOIN pernode p ON p.id = d.id) AS mean_local""".stripMargin) {
      (s, dir) =>
      Triangles.densityCard(edgeFixture(s, dir))
        .select(col("n_nodes"), col("n_edges"), col("n_triangles"),
          round(col("global_clustering"), 6).as("global_clustering"),
          round(col("mean_local"), 6).as("mean_local"))
    },

    // WEIGHTED clustering (Barrat): per-node strength-normalized triangle
    // weight — the similarity-graph form where strong closures outrank
    // borderline ones at equal counts. Weights (src+dst)%4+1 (symmetric
    // under flip); the oracle recomputes the triple join carrying all
    // three edge weights and the per-corner w1+w2 contributions (the
    // ordered-pair sum: unit weights recover 2·tri/(deg·(deg−1))).
    GQuery(
      "q309_weighted_clustering",
      s"""WITH nn AS (SELECT count(*) AS n FROM documents),
         |raw AS (SELECT doc_id AS src, (doc_id*3 + 7) % nn.n AS dst FROM documents, nn
         |        UNION ALL
         |        SELECT doc_id, (doc_id + 1) % nn.n FROM documents, nn
         |        UNION ALL
         |        SELECT doc_id, (doc_id + 2) % nn.n FROM documents, nn
         |        WHERE doc_id % 5 = 0),
         |undw AS MATERIALIZED (
         |  SELECT src, dst, max(w) AS w FROM (
         |    SELECT src, dst, ((src + dst) % 4 + 1)::DOUBLE AS w FROM raw
         |    UNION ALL SELECT dst, src, ((src + dst) % 4 + 1)::DOUBLE FROM raw)
         |  WHERE src != dst GROUP BY src, dst),
         |degw AS MATERIALIZED (
         |  SELECT src AS id, count(*) AS deg, sum(w) AS strength
         |  FROM undw GROUP BY src),
         |trisw AS MATERIALIZED (
         |  SELECT a.src AS x, a.dst AS y, b.dst AS z,
         |         a.w AS wxy, b.w AS wyz, c.w AS wxz
         |  FROM undw a
         |  JOIN undw b ON b.src = a.dst AND b.dst > a.dst
         |  JOIN undw c ON c.src = a.src AND c.dst = b.dst
         |  WHERE a.dst > a.src),
         |pw AS MATERIALIZED (
         |  SELECT id, sum(cw) AS wtri, count(*) AS tri FROM (
         |    SELECT x AS id, wxy + wxz AS cw FROM trisw
         |    UNION ALL SELECT y, wxy + wyz FROM trisw
         |    UNION ALL SELECT z, wxz + wyz FROM trisw)
         |  GROUP BY id)
         |SELECT d.id AS doc_id, d.deg, round(d.strength, 6) AS strength,
         |       coalesce(p.tri, 0) AS tri,
         |       round(CASE WHEN d.deg < 2 THEN 0.0
         |             ELSE coalesce(p.wtri, 0.0) / (d.strength * (d.deg - 1)) END,
         |             6) AS clustering_w
         |FROM degw d LEFT JOIN pw p ON p.id = d.id""".stripMargin) { (s, dir) =>
      val weighted = edgeFixture(s, dir)
        .withColumn("w", ((col("src") + col("dst")) % 4 + 1).cast("double"))
      Triangles.weightedClusteringCoefficients(weighted)
        .select(col("id").as("doc_id"), col("deg"),
          round(col("strength"), 6).as("strength"), col("tri"),
          round(col("clustering_w"), 6).as("clustering_w"))
    },

    // Newman modularity of a 100-doc blocking over the same graph — the
    // community-quality card for partitions the graph family emits. The
    // chain edges are intra-block except at boundaries; the (3d+7) map
    // crosses blocks — Q lands in between, and the oracle recomputes
    // e_c/m − (d_c/2m)² per community from first principles.
    GQuery(
      "q310_modularity",
      """WITH nn AS (SELECT count(*) AS n FROM documents),
        |raw AS (SELECT doc_id AS src, (doc_id*3 + 7) % nn.n AS dst FROM documents, nn
        |        UNION ALL
        |        SELECT doc_id, (doc_id + 1) % nn.n FROM documents, nn
        |        UNION ALL
        |        SELECT doc_id, (doc_id + 2) % nn.n FROM documents, nn
        |        WHERE doc_id % 5 = 0),
        |und AS MATERIALIZED (
        |  SELECT DISTINCT src, dst FROM
        |    (SELECT src, dst FROM raw UNION ALL SELECT dst, src FROM raw)
        |  WHERE src != dst),
        |asg AS (SELECT doc_id AS id, doc_id // 100 AS community FROM documents),
        |tagged AS MATERIALIZED (
        |  SELECT e.src, e.dst, a.community AS cs, b.community AS cd
        |  FROM und e JOIN asg a ON a.id = e.src JOIN asg b ON b.id = e.dst),
        |mm AS (SELECT count(*) / 2.0 AS m FROM und),
        |ds AS (SELECT cs AS community, count(*)::DOUBLE AS d_c FROM tagged GROUP BY cs),
        |ic AS (SELECT cs AS community, count(*) / 2.0 AS e_c FROM tagged
        |       WHERE cs = cd GROUP BY cs)
        |SELECT (SELECT count(*) FROM ds) AS n_communities,
        |       (SELECT m FROM mm)::BIGINT AS n_edges,
        |       round((SELECT sum(coalesce(ic.e_c, 0) / mm.m
        |                         - (ds.d_c / (2*mm.m)) * (ds.d_c / (2*mm.m)))
        |              FROM ds LEFT JOIN ic USING (community) CROSS JOIN mm), 6)
        |         AS modularity""".stripMargin) { (s, dir) =>
      val assignment = Tables.documents(s, dir)
        .select(col("doc_id").as("id"), (col("doc_id") / 100).cast("long").as("community"))
      Triangles.modularity(edgeFixture(s, dir), assignment)
        .select(col("n_communities"), col("n_edges"),
          round(col("modularity"), 6).as("modularity"))
    },

    // Directed health card over the quadratic graph: reciprocity (reverse-
    // edge fraction) + (out,in)-degree assortativity. Pearson is scale-
    // free so both engines' corr agree; counts are exact.
    GQuery(
      "q327_graph_health",
      """WITH e AS MATERIALIZED (
        |  SELECT DISTINCT doc_id AS src,
        |         (doc_id*doc_id + 1 + j*17) % (SELECT count(*) FROM documents) AS dst
        |  FROM documents, UNNEST([0,1,2]) AS t(j)
        |  WHERE (doc_id*doc_id + 1 + j*17) % (SELECT count(*) FROM documents) != doc_id),
        |nodes AS (SELECT DISTINCT id FROM
        |  (SELECT src AS id FROM e UNION ALL SELECT dst FROM e)),
        |m AS (SELECT count(*) AS m FROM e),
        |rc AS (SELECT count(*) AS r FROM e a
        |       WHERE EXISTS (SELECT 1 FROM e b WHERE b.src = a.dst AND b.dst = a.src)),
        |od AS (SELECT src, count(*) AS od FROM e GROUP BY src),
        |ind AS (SELECT dst, count(*) AS ind FROM e GROUP BY dst),
        |j AS (SELECT od.od AS x, ind.ind AS y FROM e
        |      JOIN od ON od.src = e.src JOIN ind ON ind.dst = e.dst)
        |SELECT (SELECT count(*) FROM nodes) AS n_nodes,
        |       (SELECT m FROM m) AS n_edges,
        |       round((SELECT r FROM rc)::DOUBLE / (SELECT m FROM m), 6) AS reciprocity,
        |       round((SELECT corr(x, y) FROM j), 6) AS assortativity""".stripMargin) {
      (s, dir) =>
      Triangles.healthCard(GraphQueries.quadFixture(s, dir))
    },

    // WEIGHTED modularity over the quadratic graph with (src+dst)%7+1
    // weights (symmetric formula, so the max-merge symmetrization is
    // exact): Q = Σ_c [w_c/W − (s_c/2W)²]. Integer weights keep W and the
    // community sums exact; the oracle recomputes everything from first
    // principles like q310's unweighted twin.
    GQuery(
      "q328_modularity_weighted",
      """WITH raw AS (
        |  SELECT DISTINCT doc_id AS src,
        |         (doc_id*doc_id + 1 + j*17) % (SELECT count(*) FROM documents) AS dst
        |  FROM documents, UNNEST([0,1,2]) AS t(j)
        |  WHERE (doc_id*doc_id + 1 + j*17) % (SELECT count(*) FROM documents) != doc_id),
        |wr AS (SELECT src, dst, ((src + dst) % 7 + 1)::DOUBLE AS w FROM raw),
        |und AS MATERIALIZED (
        |  SELECT src, dst, max(w) AS w FROM
        |    (SELECT src, dst, w FROM wr UNION ALL SELECT dst, src, w FROM wr)
        |  WHERE src != dst GROUP BY src, dst),
        |asg AS (SELECT doc_id AS id, doc_id // 100 AS community FROM documents),
        |tg AS MATERIALIZED (
        |  SELECT e.w, a.community AS cs, b.community AS cd
        |  FROM und e JOIN asg a ON a.id = e.src JOIN asg b ON b.id = e.dst),
        |mm AS (SELECT sum(w) / 2.0 AS m FROM tg),
        |ds AS (SELECT cs AS community, sum(w) AS d_c FROM tg GROUP BY cs),
        |ic AS (SELECT cs AS community, sum(w) / 2.0 AS e_c FROM tg
        |       WHERE cs = cd GROUP BY cs)
        |SELECT (SELECT count(*) FROM ds) AS n_communities,
        |       (SELECT m FROM mm)::BIGINT AS n_edges,
        |       round((SELECT sum(coalesce(ic.e_c, 0) / mm.m
        |                         - (ds.d_c / (2*mm.m)) * (ds.d_c / (2*mm.m)))
        |              FROM ds LEFT JOIN ic USING (community) CROSS JOIN mm), 6)
        |         AS modularity""".stripMargin) { (s, dir) =>
      val weighted = GraphQueries.quadFixture(s, dir)
        .withColumn("w", ((col("src") + col("dst")) % 7 + 1).cast("double"))
      val assignment = Tables.documents(s, dir)
        .select(col("doc_id").as("id"), (col("doc_id") / 100).cast("long").as("community"))
      Triangles.modularity(weighted, assignment, weightCol = Some("w"))
        .select(col("n_communities"), col("n_edges"),
          round(col("modularity"), 6).as("modularity"))
    },

    // In-degree power-law card over the quadratic graph (its in-degrees
    // vary with the number of square roots per residue). The oracle
    // recomputes the histogram and the ln-ln least-squares moments.
    GQuery(
      "q330_degree_powerlaw",
      """WITH e AS MATERIALIZED (
        |  SELECT DISTINCT doc_id AS src,
        |         (doc_id*doc_id + 1 + j*17) % (SELECT count(*) FROM documents) AS dst
        |  FROM documents, UNNEST([0,1,2]) AS t(j)
        |  WHERE (doc_id*doc_id + 1 + j*17) % (SELECT count(*) FROM documents) != doc_id),
        |h AS (SELECT deg, count(*) AS cnt FROM
        |        (SELECT dst, count(*) AS deg FROM e GROUP BY dst)
        |      GROUP BY deg),
        |p AS (SELECT ln(deg::DOUBLE) AS x, ln(cnt::DOUBLE) AS y FROM h),
        |m AS (SELECT count(*) AS n, covar_samp(x, y) AS cv, var_samp(x) AS vx,
        |             avg(x) AS mx, avg(y) AS my FROM p)
        |SELECT n AS n_degrees,
        |       round(CASE WHEN vx IS NULL OR vx = 0 THEN NULL ELSE cv / vx END, 6) AS slope,
        |       round(CASE WHEN vx IS NULL OR vx = 0 THEN NULL
        |                  ELSE my - (cv / vx) * mx END, 6) AS intercept
        |FROM m""".stripMargin) { (s, dir) =>
      Triangles.degreeCard(GraphQueries.quadFixture(s, dir))
        .select(col("n_degrees"), round(col("slope"), 6).as("slope"),
          round(col("intercept"), 6).as("intercept"))
    })
}
