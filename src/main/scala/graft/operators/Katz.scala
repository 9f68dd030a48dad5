package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Katz centrality (Katz 1953 — public literature): c(v) = Σ_k α^k ·
  * (#walks of length k ending at v), computed by the truncated iteration
  * c_t(v) = 1 + α Σ_{u→v} c_{t−1}(u). Unlike PageRank there is no
  * per-step normalization — influence attenuates by α per hop — so Katz
  * rewards being reachable by MANY short walks, the signal that
  * separates link-farm amplification (huge walk counts) from organic
  * in-links; requires α < 1/λ_max to converge (α·deg ≪ 1 in practice).
  *
  * Same per-round Spark shape as [[PageRank]]: one (ranks ⋈ edges) hash
  * join + one (dst, contrib) partial-agg shuffle, a left join back onto
  * the cached node frame, one materialization ([[Materialize]]); state
  * is 16 bytes/node. Truncation at `iters` leaves a geometric tail
  * ≤ (αλ)^iters — callers pick iters for the decimals they read.
  */
object Katz {

  def katz(edges: DataFrame, iters: Int, alpha: Double = 0.2,
      srcCol: String = "src", dstCol: String = "dst",
      checkpointDir: Option[String] = None): DataFrame = {
    require(iters >= 1, s"katz: iters must be >= 1, got $iters")
    require(alpha > 0 && alpha < 1, s"katz: alpha in (0,1), got $alpha")
    val mat = Materialize.policy(edges.sparkSession, checkpointDir)

    // LAZY checkpoints: the init materialization job computes and
    // persists e AND nodes too (witness fusion) — one job, not three
    val e = Materialize.sizedByKey(
      edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
        .filter(col("src") =!= col("dst")).distinct(), "src").localCheckpoint(false)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct().localCheckpoint(false)

    def step(prev: DataFrame): DataFrame = {
      val contribs = prev.join(e, col("id") === col("src"))
        .groupBy(col("dst").as("cid"))
        .agg(sum(col("katz")).as("contrib"))
      nodes.join(contribs, col("id") === col("cid"), "left")
        .select(col("id"),
          (lit(1.0) + lit(alpha) * coalesce(col("contrib"), lit(0.0))).as("katz"))
    }
    var c = mat(nodes.select(col("id"), lit(1.0).as("katz")))
    // the state is referenced ONCE per round, so two rounds fold into one
    // materialization (the PageRank reference-count rule): same
    // arithmetic, no recompute, half the checkpoint writes
    var t = 0
    while (t < iters) {
      val steps = math.min(2, iters - t)
      var nxt: DataFrame = c
      for (_ <- 0 until steps) nxt = step(nxt)
      val m = mat(nxt)
      Materialize.free(c) // superseded round's blocks go now
      c = m
      t += steps
    }
    c
  }
}
