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
  private[queries] def edgeFixture(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val docs = Tables.documents(s, dir).select(col("doc_id"))
    val n = docs.count()
    docs.select(col("doc_id").as("src"),
        explode(array(lit(0), lit(1), lit(2))).as("j"))
      .select(col("src"), ((col("src") * 7 + col("j") * 13 + 1) % n).as("dst"))
      .filter(col("dst") =!= col("src"))
  }

  /** Second fixture family for the convergence queries: the QUADRATIC map
    * dst = (src² + 1 + 17j) mod N has irregular in-degrees (number of
    * square roots varies per residue), so the power iteration contracts at
    * the generic ~damping rate instead of the near-instant convergence a
    * regular graph shows — the regime an eps-stop is FOR. `dropJ0Every`
    * (> 0) drops the j=0 edge for every multiple of it: the deterministic
    * "small delta" perturbation the warm-start query re-ranks after.
    */
  private[queries] def quadFixture(s: org.apache.spark.sql.SparkSession, dir: String,
      dropJ0Every: Int = 0) = {
    val docs = Tables.documents(s, dir).select(col("doc_id"))
    val n = docs.count()
    val all = docs.select(col("doc_id").as("src"),
        explode(array(lit(0), lit(1), lit(2))).as("j"))
      .select(col("src"), col("j"),
        ((col("src") * col("src") + 1 + col("j") * 17) % n).as("dst"))
      .filter(col("dst") =!= col("src"))
    val kept = if (dropJ0Every > 0)
      all.filter(!(col("src") % dropJ0Every === 0 && col("j") === 0))
    else all
    kept.select(col("src"), col("dst"))
  }

  /** Oracle twin of [[quadFixture]]: graph CTEs prefixed `nm_`. */
  private def quadGraphSql(nm: String, dropJ0Every: Int): String = {
    val drop = if (dropJ0Every > 0) s"AND NOT (doc_id % $dropJ0Every = 0 AND j = 0)" else ""
    s"""${nm}_edges AS MATERIALIZED (
       |  SELECT DISTINCT doc_id AS src,
       |         (doc_id*doc_id + 1 + j*17) % (SELECT count(*) FROM documents) AS dst
       |  FROM documents, UNNEST([0,1,2]) AS t(j)
       |  WHERE (doc_id*doc_id + 1 + j*17) % (SELECT count(*) FROM documents) != doc_id
       |  $drop),
       |${nm}_nodes AS MATERIALIZED (SELECT DISTINCT id FROM
       |  (SELECT src AS id FROM ${nm}_edges UNION ALL SELECT dst FROM ${nm}_edges)),
       |${nm}_odeg AS MATERIALIZED (
       |  SELECT src, count(*)::DOUBLE AS deg FROM ${nm}_edges GROUP BY src),
       |${nm}_nn AS (SELECT count(*)::DOUBLE AS n FROM ${nm}_nodes)""".stripMargin
  }

  /** One damped update CTE `cur` from `prev` over graph `nm_`. */
  private def quadStepSql(nm: String, cur: String, prev: String): String =
    s"""$cur AS MATERIALIZED (
       |  SELECT n.id,
       |         (1::DOUBLE - 0.85::DOUBLE)/nn.n
       |         + 0.85::DOUBLE * (coalesce(c.s, 0::DOUBLE) + dg.m/nn.n) AS rank
       |  FROM ${nm}_nodes n CROSS JOIN ${nm}_nn nn
       |  LEFT JOIN (SELECT e.dst AS id, sum(p.rank / od.deg) AS s
       |             FROM $prev p JOIN ${nm}_edges e ON e.src = p.id
       |             JOIN ${nm}_odeg od ON od.src = e.src
       |             GROUP BY e.dst) c ON c.id = n.id
       |  CROSS JOIN (SELECT coalesce(sum(p.rank), 0::DOUBLE) AS m FROM $prev p
       |              WHERE NOT EXISTS (SELECT 1 FROM ${nm}_odeg od WHERE od.src = p.id)) dg)""".stripMargin

  /** Delta list + stop-round CTEs for a chain `pre`0..`pre`T at `eps`. */
  private def stopSql(pre: String, t: Int, eps: Double): (String, String) = {
    val deltas = (1 to t).map { i =>
      s"SELECT $i AS t, (SELECT sum(abs(a.rank - b.rank)) " +
        s"FROM $pre$i a JOIN $pre${i - 1} b USING (id)) AS d"
    }.mkString("\n  UNION ALL ")
    (s"${pre}_deltas AS (${deltas})",
      s"${pre}_stop AS (SELECT coalesce(min(t), $t) AS st FROM ${pre}_deltas WHERE d < $eps)")
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
    },

    // Edge-WEIGHTED PageRank: the walk follows w(u,v)/Σ_out w — the form
    // that ranks the similarity graphs the dedup family emits (cosine /
    // Jaccard weights) instead of flattening them to unit edges. Weights
    // are the deterministic (src+dst)%7+1 so the oracle replays them; the
    // unrolled-MATERIALIZED chain is q287's with sum(w) degrees and
    // rank·w/Σw contributions.
    GQuery(
      "q299_pagerank_weighted",
      s"""WITH edges AS MATERIALIZED (
         |  SELECT DISTINCT src, dst, ((src + dst) % 7 + 1)::DOUBLE AS w FROM (
         |    SELECT doc_id AS src,
         |           (doc_id*7 + j*13 + 1) % (SELECT count(*) FROM documents) AS dst
         |    FROM documents, UNNEST([0,1,2]) AS t(j))
         |  WHERE dst != src),
         |nodes AS MATERIALIZED (SELECT DISTINCT id FROM
         |  (SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges)),
         |odeg AS MATERIALIZED (SELECT src, sum(w) AS deg FROM edges GROUP BY src),
         |nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
         |r0 AS MATERIALIZED (SELECT id, 1::DOUBLE/nn.n AS rank FROM nodes CROSS JOIN nn),
         |${(1 to iters).map { i =>
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
          }.mkString(",\n")}
         |SELECT id AS doc_id, round(rank, 6) AS rank FROM r$iters""".stripMargin) {
      (s, dir) =>
      val weighted = edgeFixture(s, dir)
        .withColumn("wt", ((col("src") + col("dst")) % 7 + 1).cast("double"))
      PageRank.pageRank(weighted, iters, weightCol = Some("wt"))
        .select(col("id").as("doc_id"), round(col("rank"), 6).as("rank"))
    },

    // Convergence-STOPPED PageRank on the irregular quadratic graph: stop
    // at the first round with ‖r_t − r_{t−1}‖₁ < eps. The oracle replays
    // the stop RULE itself (unrolled deltas + min-t), so the query is
    // scale-honest: the stop round is whatever the rule picks at this sf
    // (eps = 4e-3 sits ≥ 23% away from every delta in the chain at both
    // sf0.01 and sf0.1 — measured before the eps was frozen).
    GQuery(
      "q302_pagerank_until", {
        val (deltas, stop) = stopSql("r", iters, 0.004)
        s"""WITH ${quadGraphSql("g", 0)},
           |r0 AS MATERIALIZED (
           |  SELECT id, 1::DOUBLE/nn.n AS rank FROM g_nodes CROSS JOIN g_nn nn),
           |${(1 to iters).map(i => quadStepSql("g", s"r$i", s"r${i - 1}")).mkString(",\n")},
           |$deltas,
           |$stop
           |SELECT id AS doc_id, round(rank, 6) AS rank,
           |       (SELECT st FROM r_stop) AS iters_run
           |FROM (${(1 to iters).map(i =>
                s"SELECT id, rank FROM r$i WHERE (SELECT st FROM r_stop) = $i")
                .mkString("\n  UNION ALL ")})""".stripMargin
      }) { (s, dir) =>
      val (ranks, t, _) =
        PageRank.pageRankUntil(quadFixture(s, dir), eps = 0.004, maxIters = iters)
      ranks.select(col("id").as("doc_id"), round(col("rank"), 6).as("rank"),
        lit(t).as("iters_run"))
    },

    // Warm-start re-rank card: after a small deterministic perturbation
    // (1% of sources lose one out-edge — the append/takedown delta case),
    // resuming from the previous converged ranks reaches eps in a
    // fraction of the from-scratch rounds. Both chains replay in the
    // oracle with the same stop rule; PageRankSpec separately pins that
    // warm and cold FIXED POINTS agree at 6 decimals under a tight eps.
    GQuery(
      "q303_pagerank_resume", {
        val (wDeltas, wStop) = stopSql("w", iters, 0.004)
        val (cDeltas, cStop) = stopSql("c", iters, 0.004)
        s"""WITH ${quadGraphSql("g", 0)},
           |${quadGraphSql("h", 100)},
           |b0 AS MATERIALIZED (
           |  SELECT id, 1::DOUBLE/nn.n AS rank FROM g_nodes CROSS JOIN g_nn nn),
           |${(1 to iters).map(i => quadStepSql("g", s"b$i", s"b${i - 1}")).mkString(",\n")},
           |w0raw AS MATERIALIZED (
           |  SELECT n.id, coalesce(b.rank, 1::DOUBLE/nn.n) AS rank
           |  FROM h_nodes n CROSS JOIN h_nn nn LEFT JOIN b$iters b ON b.id = n.id),
           |w0 AS MATERIALIZED (
           |  SELECT id, rank / (SELECT sum(rank) FROM w0raw) AS rank FROM w0raw),
           |c0 AS MATERIALIZED (
           |  SELECT id, 1::DOUBLE/nn.n AS rank FROM h_nodes CROSS JOIN h_nn nn),
           |${(1 to iters).map(i => quadStepSql("h", s"w$i", s"w${i - 1}")).mkString(",\n")},
           |${(1 to iters).map(i => quadStepSql("h", s"c$i", s"c${i - 1}")).mkString(",\n")},
           |$wDeltas,
           |$wStop,
           |$cDeltas,
           |$cStop
           |SELECT (SELECT st FROM w_stop) AS warm_rounds,
           |       (SELECT st FROM c_stop) AS cold_rounds""".stripMargin
      }) { (s, dir) =>
      import s.implicits._
      val eps = 0.004
      val perturbed = quadFixture(s, dir, dropJ0Every = 100)
      // the (base → warm resume) chain and the cold chain are independent
      // iterative jobs — submit them CONCURRENTLY (the bow-tie fixpoint
      // trick, Scc.bowTie): the scheduler interleaves their rounds, and
      // the suite's heaviest query stops paying two sequential chains
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration.Duration
      val warmF = Future {
        val base = PageRank.pageRank(quadFixture(s, dir), iters)
        PageRank.pageRankResume(perturbed, base, eps, maxIters = iters)._2
      }
      val coldF = Future {
        PageRank.pageRankUntil(perturbed, eps, maxIters = iters)._2
      }
      val warmT = Await.result(warmF, Duration.Inf)
      val coldT = Await.result(coldF, Duration.Inf)
      Seq((warmT, coldT)).toDF("warm_rounds", "cold_rounds")
    },

    // Weighted personalized PageRank: the seed-biased walk following edge
    // weights — q298's oracle with sum(w) out-degrees and rank·w/Σw
    // contributions (weights (src+dst)%7+1, the q299 fixture).
    GQuery(
      "q307_ppr_weighted",
      s"""WITH edges AS MATERIALIZED (
         |  SELECT DISTINCT src, dst, ((src + dst) % 7 + 1)::DOUBLE AS w FROM (
         |    SELECT doc_id AS src,
         |           (doc_id*7 + j*13 + 1) % (SELECT count(*) FROM documents) AS dst
         |    FROM documents, UNNEST([0,1,2]) AS t(j))
         |  WHERE dst != src),
         |nodes AS MATERIALIZED (SELECT DISTINCT id FROM
         |  (SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges)),
         |odeg AS MATERIALIZED (SELECT src, sum(w) AS deg FROM edges GROUP BY src),
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
               |  LEFT JOIN (SELECT e.dst AS id, sum(q.rank * e.w / od.deg) AS s
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
      val weighted = edgeFixture(s, dir)
        .withColumn("wt", ((col("src") + col("dst")) % 7 + 1).cast("double"))
      PageRank.personalizedPageRank(weighted, seeds, iters,
          edgeWeightCol = Some("wt"))
        .select(col("id").as("doc_id"), round(col("rank"), 8).as("rank"))
    })
}
