package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HITS (hubs and authorities, Kleinberg 1999 — public literature) over a
  * directed edge list: the OTHER classic link signal next to [[PageRank]].
  * Where PageRank scores a page by the rank of pages linking to it, HITS
  * splits the role in two — a good *hub* links to many good authorities,
  * a good *authority* is linked from many good hubs — the decomposition a
  * web-corpus curation pass uses to separate directory/aggregator pages
  * (hubs — often boilerplate to down-weight) from content pages
  * (authorities — the crawl/corpus targets). The reference engine has no
  * graph surface; this extends the repo's curation layer beside PageRank
  * and `Dedup.connectedComponents`.
  *
  * Mutual power iteration:
  *   a_t(v) = Σ_{u→v} h_{t−1}(u) ,  h_t(u) = Σ_{u→v} a_t(v)
  * with ONE L1 normalization at the end. The update is linear, so
  * per-round normalization only rescales — the final normalized vectors
  * are identical (up to float rounding, ~1e-12) to the textbook
  * normalize-every-round form, and skipping it halves the per-round job
  * count: no 1-row normalizer aggregate, no broadcast, no second
  * reference to the raw sums. Measured 8.4 s → ~1 s on the sf0.01
  * fixture (16 half-steps). Unnormalized scores grow ~(mean deg)² per
  * round — double range (1e308) accommodates any realistic (deg, iters);
  * for extreme depth, renormalize by splitting into two calls.
  *
  * Spark shape (same discipline as PageRank):
  *  - `edges`/`nodes` computed once and cached; each half-step is one
  *    hash join + one partial-aggregated shuffle carrying (id, score)
  *    pairs only — never edge payloads;
  *  - both frames materialize per round ([[Materialize]]) — the 2^T
  *    lineage guard PageRank.scala measures;
  *  - scores are (id, double) pairs — 16 bytes/node/side; nodes absent
  *    from an intermediate frame are exact zeros and rejoin at the final
  *    zero-filled projection.
  *
  * Nodes with no in-edges have authority 0; no out-edges, hub 0 (they
  * stay in the output — a rank of exactly 0.0 is information). Scores
  * are deterministic up to float summation order; oracled output rounds
  * at 6 decimals.
  */
object Hits {

  /** `iters` mutual updates over `edges(srcCol, dstCol)` (deduped).
    * Output: (id, hub DOUBLE, auth DOUBLE), each column summing to 1.
    * Id-type-agnostic — equality joins only, no arithmetic on ids.
    */
  def hits(edges: DataFrame, iters: Int,
      srcCol: String = "src", dstCol: String = "dst",
      checkpointDir: Option[String] = None): DataFrame = {
    require(iters >= 1, s"hits: iters must be >= 1, got $iters")
    val spark = edges.sparkSession
    val mat = Materialize.policy(spark, checkpointDir)

    // LAZY checkpoints: the n count below computes and persists e AND
    // nodes in ONE job (witness fusion) instead of two eager jobs + count
    val e = Materialize.sizedByKey(
        edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
          .filter(col("src") =!= col("dst")).distinct(), "src")
      .localCheckpoint(false)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct().localCheckpoint(false)
    val n = nodes.count()
    require(n > 0, "hits: empty graph")

    // h_0 = all-ones; a_0 never used. Intermediate frames carry only
    // nonzero nodes (absent row == exact 0, and 0 contributes nothing).
    var hub = mat(nodes.select(col("id"), lit(1.0).as("score")))
    var auth: DataFrame = null

    // one half-step: raw propagation of `scores` across `e` — LAZY; the
    // auth frame is referenced once per round (by the hub half-step), so
    // only the full round materializes: one checkpoint job per round
    // (measured 8.4 s → 4.6 s over the per-half-step form at sf0.01),
    // except the final auth which feeds the output twice.
    def halfStep(scores: DataFrame, fromCol: String, toCol: String): DataFrame =
      scores.join(e, col("id") === col(fromCol))
        .groupBy(col(toCol).as("id"))
        .agg(sum(col("score")).as("score"))

    for (t <- 1 to iters) {
      val a = halfStep(hub, "src", "dst")
      auth = if (t == iters) mat(a) else a
      val prevHub = hub
      hub = mat(halfStep(auth, "dst", "src"))
      // the previous hub frame is dead once the new one is materialized
      // (the lazy auth half-step that read it is baked into that plan)
      Materialize.free(prevHub)
    }

    val hz = hub.agg(sum(col("score"))).head().getDouble(0)
    val az = auth.agg(sum(col("score"))).head().getDouble(0)
    // with normalization deferred to the end, unnormalized mass grows
    // ~(mean degree)^2 per round; deep iters on dense graphs can push the
    // sums to Infinity and the output would be silent NaN — fail loudly
    // with the recovery path instead
    require(java.lang.Double.isFinite(hz) && java.lang.Double.isFinite(az)
        && hz > 0 && az > 0,
      s"hits: unnormalized score mass overflowed after $iters rounds " +
        s"(hub sum $hz, auth sum $az) — split into two shorter hits() " +
        "calls and renormalize between them")
    nodes
      .join(hub.select(col("id").as("hid"), col("score").as("hs")),
        col("id") === col("hid"), "left")
      .join(auth.select(col("id").as("aid"), col("score").as("as_")),
        col("id") === col("aid"), "left")
      .select(col("id"),
        (coalesce(col("hs"), lit(0.0)) / lit(hz)).as("hub"),
        (coalesce(col("as_"), lit(0.0)) / lit(az)).as("auth"))
  }
}
