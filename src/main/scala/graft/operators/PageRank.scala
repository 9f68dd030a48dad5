package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed PageRank over an edge list — the link-centrality pass a
  * web-corpus curation pipeline runs on its host/URL graph (Common Crawl
  * publishes exactly this ranking to drive crawl frontiers and corpus
  * weighting; Page et al. 1999 — public literature). The reference engine
  * has no graph surface (SURVEY §2 stops at vector/metadata relations);
  * this extends the repo's curation layer next to
  * `Dedup.connectedComponents` (reachability) with the other standard
  * graph signal (authority).
  *
  * Spark shape — power iteration with bounded, shuffle-minimal steps:
  *  - `nodes`/`outDeg`/`edges` are computed ONCE and cached; every
  *    iteration is one (ranks ⋈ edges on src) hash join + one groupBy(dst)
  *    partial-aggregated shuffle carrying (dst, contrib) pairs only —
  *    never the edge payload;
  *  - the dangling-mass term is a 1-row aggregate crossJoin(broadcast) —
  *    the scalar-attachment idiom used repo-wide;
  *  - each iteration `localCheckpoint`s the new ranks frame: the rank
  *    vector is referenced twice per round (contributions + dangling),
  *    so an unmaterialized chain re-executes its prefix exponentially —
  *    and lineage/AQE re-planning stays O(1) in the iteration count. At
  *    production scale swap for `checkpoint` on reliable storage — same
  *    call site, noted here;
  *  - ranks are (id, double) — 16 bytes/node; a 10⁹-node host graph is
  *    ~16 GB cluster-wide, far under shuffle budgets.
  *
  * Determinism: the per-iteration update is a fixed arithmetic expression;
  * only float summation ORDER varies across partitionings, so ranks are
  * stable to ~1e-12 and every oracled output rounds at 6 decimals.
  */
object PageRank {

  /** `iters` rounds of the damped update
    * r'(v) = (1−d)/N + d·(Σ_{u→v} r(u)/deg(u) + danglingMass/N)
    * over `edges(srcCol, dstCol)`. Nodes = src ∪ dst (isolated ids can be
    * unioned in by the caller). Output: (id, rank DOUBLE), Σ rank = 1.
    */
  def pageRank(edges: DataFrame, iters: Int, damping: Double = 0.85,
      srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    require(iters >= 1, s"pageRank: iters must be >= 1, got $iters")
    require(damping > 0 && damping < 1, s"pageRank: damping in (0,1), got $damping")
    // id-type-agnostic: hosts/urls rank as naturally as numeric ids —
    // every step is equality joins and aggregates, no arithmetic on ids
    val e = edges.select(col(srcCol).as("src"),
      col(dstCol).as("dst")).distinct().cache()
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct().cache()
    val outDeg = e.groupBy("src").agg(count(lit(1)).cast("double").as("deg")).cache()
    val n = nodes.count()
    require(n > 0, "pageRank: empty graph")
    var ranks = nodes.select(col("id"), (lit(1.0) / n).as("rank"))
      .localCheckpoint(true)
    try for (it <- 0 until iters) {
      val contribs = ranks.join(e, col("id") === col("src"))
        .join(outDeg, "src")
        .groupBy(col("dst").as("cid"))
        .agg(sum(col("rank") / col("deg")).as("contrib"))
      val dangling = ranks.join(outDeg, col("id") === col("src"), "left_anti")
        .agg(coalesce(sum(col("rank")), lit(0.0)).as("dmass"))
      val next = nodes
        .join(contribs, col("id") === col("cid"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("id"),
          (lit((1.0 - damping) / n) + lit(damping) *
            (coalesce(col("contrib"), lit(0.0)) + col("dmass") / n)).as("rank"))
      // EVERY round checkpoints, deliberately: ranks is referenced TWICE
      // per round (contributions + dangling mass), so an un-materialized
      // chain re-executes its whole prefix 2^rounds times — measured
      // q295 5.1 s -> 30.6 s when this was relaxed to every-5th-round.
      // The per-round job overhead is the price of linear work.
      ranks = next.localCheckpoint(true)
    } finally {
      // every rank frame is checkpointed, so the builder caches can go —
      // a long-lived session running many rankings must not accumulate them
      e.unpersist(); nodes.unpersist(); outDeg.unpersist()
    }
    ranks
  }

  /** Personalized PageRank: teleport (and dangling mass) flow to the
    * SEED distribution instead of uniformly —
    * r'(v) = (1−d)·p(v) + d·(Σ_{u→v} r(u)/deg(u) + danglingMass·p(v))
    * with p the normalized seed weights (0 off-seed). The seed-biased
    * random walk is the standard graph-expansion primitive: "rank the
    * corpus by link-proximity to this curated set". Same per-iteration
    * shape and materialization rule as [[pageRank]]; `seeds` is
    * (idCol, weightCol ≥ 0), joined once and carried per round.
    */
  def personalizedPageRank(edges: DataFrame, seeds: DataFrame, iters: Int,
      damping: Double = 0.85, srcCol: String = "src", dstCol: String = "dst",
      idCol: String = "id", weightCol: String = "weight"): DataFrame = {
    require(iters >= 1, s"personalizedPageRank: iters must be >= 1, got $iters")
    require(damping > 0 && damping < 1,
      s"personalizedPageRank: damping in (0,1), got $damping")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().cache()
    val rawSeeds = seeds.select(col(idCol).as("id"),
      col(weightCol).cast("double").as("w"))
    val total = rawSeeds.agg(sum(col("w"))).collect()(0).getDouble(0)
    require(total > 0, "personalizedPageRank: seed weights must sum > 0")
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .union(rawSeeds.select("id")).distinct()
    val outDeg = e.groupBy("src").agg(count(lit(1)).cast("double").as("deg")).cache()
    val p = nodes.join(rawSeeds, Seq("id"), "left")
      .select(col("id"), (coalesce(col("w"), lit(0.0)) / total).as("p")).cache()
    var ranks = p.select(col("id"), col("p").as("rank")).localCheckpoint(true)
    try for (_ <- 0 until iters) {
      val contribs = ranks.join(e, col("id") === col("src"))
        .join(outDeg, "src")
        .groupBy(col("dst").as("cid"))
        .agg(sum(col("rank") / col("deg")).as("contrib"))
      val dangling = ranks.join(outDeg, col("id") === col("src"), "left_anti")
        .agg(coalesce(sum(col("rank")), lit(0.0)).as("dmass"))
      ranks = p
        .join(contribs, col("id") === col("cid"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("id"),
          (lit(1.0 - damping) * col("p") + lit(damping) *
            (coalesce(col("contrib"), lit(0.0)) + col("dmass") * col("p")))
            .as("rank"))
        .localCheckpoint(true)
    } finally {
      e.unpersist(); outDeg.unpersist(); p.unpersist()
    }
    ranks
  }

  /** Convergence instrument: ‖r_T − r_{T−1}‖₁ — one extra iteration from
    * the returned ranks, one scalar. The number that says whether `iters`
    * was enough.
    */
  def l1Delta(edges: DataFrame, ranks: DataFrame, damping: Double = 0.85,
      srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    val next = pageRankStep(edges, ranks, damping, srcCol, dstCol)
    ranks.select(col("id"), col("rank").as("prev"))
      .join(next.select(col("id"), col("rank").as("cur")), "id")
      .agg(sum(abs(col("cur") - col("prev"))).as("l1_delta"))
  }

  /** One update step from an existing rank vector (the [[pageRank]] loop
    * body, exposed for the delta card and for incremental re-ranking).
    */
  def pageRankStep(edges: DataFrame, ranks: DataFrame, damping: Double = 0.85,
      srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    val e = edges.select(col(srcCol).as("src"),
      col(dstCol).as("dst")).distinct()
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
    val outDeg = e.groupBy("src").agg(count(lit(1)).cast("double").as("deg"))
    val n = nodes.count()
    val contribs = ranks.join(e, col("id") === col("src"))
      .join(outDeg, "src")
      .groupBy(col("dst").as("cid"))
      .agg(sum(col("rank") / col("deg")).as("contrib"))
    val dangling = ranks.join(outDeg, col("id") === col("src"), "left_anti")
      .agg(coalesce(sum(col("rank")), lit(0.0)).as("dmass"))
    nodes
      .join(contribs, col("id") === col("cid"), "left")
      .crossJoin(broadcast(dangling))
      .select(col("id"),
        (lit((1.0 - damping) / n) + lit(damping) *
          (coalesce(col("contrib"), lit(0.0)) + col("dmass") / n)).as("rank"))
  }
}
