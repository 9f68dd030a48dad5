package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.KCore

/** k-core queries. The fixture is built so the peel depth is PROVABLE:
  * a cycle d→(d+1 mod N) (every node degree ≥ 2, so k=2 peels nothing
  * and k=3 removes all cycle-only nodes in ONE simultaneous round — a
  * path would cascade ~N rounds from its ends) plus planted K5 cliques
  * on doc_id%50 < 5 (internal degree 4, so they survive k=3 intact).
  * Fixpoint is reached within 2 rounds by construction; the oracle
  * unrolls 3 and the engine's convergence check enforces the same
  * stability at run time.
  */
object KCoreQueries {

  private def edgeFixture(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val docs = Tables.documents(s, dir).select(col("doc_id"))
    val n = docs.count()
    val cyc = docs.select(col("doc_id").as("src"), ((col("doc_id") + 1) % n).as("dst"))
    val members = docs.filter(pmod(col("doc_id"), lit(50)) < 5)
      .select(col("doc_id"), (col("doc_id") - pmod(col("doc_id"), lit(50))).as("blk"))
    val clq = members.as("a").join(members.as("b"),
        col("a.blk") === col("b.blk") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("src"), col("b.doc_id").as("dst"))
    cyc.union(clq)
  }

  private val baseSql =
    """nn AS (SELECT count(*) AS n FROM documents),
      |m AS (SELECT doc_id, doc_id - doc_id % 50 AS blk FROM documents
      |      WHERE doc_id % 50 < 5),
      |raw AS (SELECT doc_id AS src, (doc_id + 1) % nn.n AS dst FROM documents, nn
      |        UNION ALL
      |        SELECT a.doc_id, b.doc_id FROM m a JOIN m b
      |          ON a.blk = b.blk AND a.doc_id < b.doc_id),
      |e0 AS MATERIALIZED (
      |  SELECT DISTINCT src, dst FROM
      |    (SELECT src, dst FROM raw UNION ALL SELECT dst, src FROM raw)
      |  WHERE src != dst)""".stripMargin

  /** Unrolled peels at threshold `k`, rounds e1_<k>..e<r>_<k>. Every CTE
    * name carries the k suffix so two peels can share one query.
    */
  private def peelSql(k: Int, rounds: Int): String = {
    val base = s"e0_$k AS (SELECT src, dst FROM e0)"
    val steps = (1 to rounds).map { r =>
      s"""d${r}_$k AS (SELECT src AS id, count(*) AS deg FROM e${r - 1}_$k GROUP BY src),
         |k${r}_$k AS (SELECT id FROM d${r}_$k WHERE deg >= $k),
         |e${r}_$k AS MATERIALIZED (
         |  SELECT e.src, e.dst FROM e${r - 1}_$k e
         |  JOIN k${r}_$k a ON a.id = e.src
         |  JOIN k${r}_$k b ON b.id = e.dst)""".stripMargin
    }
    (base +: steps).mkString(",\n")
  }

  def all: Seq[GQuery] = Seq(

    // The 3-core edge set: cliques + their internal cycle edges survive,
    // every cycle-only node peels away. The engine iterates to a CHECKED
    // fixpoint; the oracle's 3 unrolled rounds reach the same set by the
    // fixture's provable depth bound.
    GQuery(
      "q296_kcore_edges",
      s"""WITH $baseSql,
         |${peelSql(3, 3)}
         |SELECT src, dst FROM e3_3""".stripMargin) { (s, dir) =>
      KCore.kCoreEdges(edgeFixture(s, dir), k = 3)
    },

    // Per-node core membership at k in {2, 3}: the whole cycle holds the
    // 2-core, only clique members reach the 3-core.
    GQuery(
      "q297_core_membership",
      s"""WITH $baseSql,
         |${peelSql(2, 2)},
         |${peelSql(3, 3)}
         |SELECT n.id AS doc_id,
         |       CASE WHEN c3.id IS NOT NULL THEN 3
         |            WHEN c2.id IS NOT NULL THEN 2
         |            ELSE 0 END AS max_core
         |FROM (SELECT DISTINCT src AS id FROM e0) n
         |LEFT JOIN (SELECT DISTINCT src AS id FROM e2_2) c2 ON c2.id = n.id
         |LEFT JOIN (SELECT DISTINCT src AS id FROM e3_3) c3 ON c3.id = n.id""".stripMargin) {
      (s, dir) =>
      KCore.coreMembership(edgeFixture(s, dir), ks = Seq(2, 3))
        .select(col("id").as("doc_id"), col("max_core"))
    },

    // Full core DECOMPOSITION in one incremental sweep: coreness(v) =
    // max{k : v ∈ k-core}, peeled over the shrinking survivor set (k-core
    // ⊆ (k−1)-core, so each threshold starts from the previous core's
    // edges). On this fixture coreness is provably 2 for cycle-only nodes
    // and 4 for K5 members (internal degree 4); the oracle derives the
    // same values from from-scratch peels at k = 2..5 (nesting makes the
    // two formulations equal) with round counts covering the fixture's
    // provable peel depths (k=5 cascades: corner nodes with a 5th cycle
    // edge outlive round 1, then fall — 3 rounds + confirmation).
    GQuery(
      "q301_coreness",
      s"""WITH $baseSql,
         |${peelSql(2, 2)},
         |${peelSql(3, 3)},
         |${peelSql(4, 3)},
         |${peelSql(5, 4)}
         |SELECT n.id AS doc_id,
         |       CASE WHEN c5.id IS NOT NULL THEN 5
         |            WHEN c4.id IS NOT NULL THEN 4
         |            WHEN c3.id IS NOT NULL THEN 3
         |            WHEN c2.id IS NOT NULL THEN 2
         |            ELSE 1 END AS coreness
         |FROM (SELECT DISTINCT src AS id FROM e0) n
         |LEFT JOIN (SELECT DISTINCT src AS id FROM e2_2) c2 ON c2.id = n.id
         |LEFT JOIN (SELECT DISTINCT src AS id FROM e3_3) c3 ON c3.id = n.id
         |LEFT JOIN (SELECT DISTINCT src AS id FROM e3_4) c4 ON c4.id = n.id
         |LEFT JOIN (SELECT DISTINCT src AS id FROM e4_5) c5 ON c5.id = n.id""".stripMargin) {
      (s, dir) =>
      KCore.coreness(edgeFixture(s, dir))
        .select(col("id").as("doc_id"), col("coreness"))
    },

    // Weighted (strength) core — the s-core: peel nodes whose incident
    // weight SUM < 7.5 until stable. Weights (src+dst)%3+1 make the
    // cycle-only nodes (strength <= 6) vanish in round 1 and the K5
    // blocks cascade by their internal weight sums — measured depth 3 at
    // sf0.01 AND sf0.1 (1120 -> 134 -> 86 -> 80 edges), oracle unrolls 5.
    GQuery(
      "q306_score_edges", {
        val sBase =
          """nn AS (SELECT count(*) AS n FROM documents),
            |m AS (SELECT doc_id, doc_id - doc_id % 50 AS blk FROM documents
            |      WHERE doc_id % 50 < 5),
            |raw AS (SELECT doc_id AS src, (doc_id + 1) % nn.n AS dst FROM documents, nn
            |        UNION ALL
            |        SELECT a.doc_id, b.doc_id FROM m a JOIN m b
            |          ON a.blk = b.blk AND a.doc_id < b.doc_id),
            |e0w AS MATERIALIZED (
            |  SELECT src, dst, max(w) AS w FROM (
            |    SELECT src, dst, ((src + dst) % 3 + 1)::DOUBLE AS w FROM raw
            |    UNION ALL SELECT dst, src, ((src + dst) % 3 + 1)::DOUBLE FROM raw)
            |  WHERE src != dst GROUP BY src, dst)""".stripMargin
        val sSteps = (1 to 5).map { r =>
          s"""dw$r AS (SELECT src AS id, sum(w) AS st FROM e${r - 1}w GROUP BY src),
             |kw$r AS (SELECT id FROM dw$r WHERE st >= 7.5),
             |e${r}w AS MATERIALIZED (
             |  SELECT e.src, e.dst, e.w FROM e${r - 1}w e
             |  JOIN kw$r a ON a.id = e.src
             |  JOIN kw$r b ON b.id = e.dst)""".stripMargin
        }.mkString(",\n")
        s"""WITH $sBase,
           |$sSteps
           |SELECT src, dst, w FROM e5w""".stripMargin
      }) { (s, dir) =>
      val weighted = edgeFixture(s, dir)
        .withColumn("w", ((col("src") + col("dst")) % 3 + 1).cast("double"))
      KCore.sCoreEdges(weighted, s = 7.5)
    })
}
