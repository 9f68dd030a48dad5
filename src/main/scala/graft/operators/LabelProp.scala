package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Label propagation over a similarity graph — the semi-supervised pass
  * that spreads a SMALL curated label set (human quality ratings,
  * spam/ham seeds) across the near-dup/similarity graph the dedup family
  * already builds, so unlabeled docs inherit scores from their graph
  * neighborhood (Zhu & Ghahramani 2002 / Zhou et al. 2004 — public
  * literature; the reference engine has no graph surface). Companion to
  * [[PageRank]] (authority from structure alone) — this propagates an
  * EXTERNAL signal, anchored at the seeds.
  *
  * Update rule (random-walk normalization, seeds re-injected each round):
  *   f'(v) = α · Σ_{u→v} f(u)/deg(u) + (1−α) · y(v)
  * with y the seed label (0 for unlabeled). α < 1 makes the iteration a
  * contraction, so the fixed point is unique and iteration order is
  * irrelevant. Pass symmetrized edges for the undirected similarity case
  * ([[symmetrize]]).
  *
  * Spark shape = the [[PageRank]] discipline: edges/degrees computed once
  * and cached; per round one hash join + one partial-agg shuffle of
  * (dst, contrib) pairs; seeds joined back as a broadcast-size relation;
  * `localCheckpoint` per round keeps lineage O(1). State per node is one
  * double — 16 bytes/node cluster-wide.
  */
object LabelProp {

  /** Union of both edge directions, deduped — the undirected form. */
  def symmetrize(edges: DataFrame, srcCol: String = "src",
      dstCol: String = "dst"): DataFrame = {
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    e.union(e.select(col("dst").as("src"), col("src").as("dst"))).distinct()
  }

  /** `iters` rounds from f₀ = y. `seeds` is (id, label DOUBLE); nodes =
    * edge endpoints ∪ seed ids. An isolated seed (no in-edges) settles at
    * (1−α)·y from round 1 — anchored, not amplified. Output:
    * (id, score DOUBLE).
    */
  def propagate(edges: DataFrame, seeds: DataFrame, iters: Int,
      alpha: Double = 0.8, srcCol: String = "src", dstCol: String = "dst",
      idCol: String = "id", labelCol: String = "label"): DataFrame = {
    require(iters >= 1, s"propagate: iters must be >= 1, got $iters")
    require(alpha > 0 && alpha < 1, s"propagate: alpha in (0,1), got $alpha")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).distinct().cache()
    val y = seeds.select(col(idCol).cast("long").as("id"),
      col(labelCol).cast("double").as("y"))
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .union(y.select("id")).distinct().cache()
    val outDeg = e.groupBy("src").agg(count(lit(1)).cast("double").as("deg")).cache()
    val yFull = nodes.join(y, Seq("id"), "left")
      .select(col("id"), coalesce(col("y"), lit(0.0)).as("y")).cache()
    var f = yFull.select(col("id"), col("y").as("score")).localCheckpoint(true)
    try for (it <- 0 until iters) {
      val contribs = f.join(e, col("id") === col("src"))
        .join(outDeg, "src")
        .groupBy(col("dst").as("cid"))
        .agg(sum(col("score") / col("deg")).as("contrib"))
      val next = yFull
        .join(contribs, col("id") === col("cid"), "left")
        .select(col("id"),
          (lit(alpha) * coalesce(col("contrib"), lit(0.0))
            + lit(1.0 - alpha) * col("y")).as("score"))
      // every round, deliberately (the PageRank lesson: the score vector
      // feeds the next round's contribution join AND re-plans against
      // yFull — an unmaterialized chain re-executes its prefix)
      f = next.localCheckpoint(true)
    } finally {
      // f is checkpointed each round — the builder caches must not outlive
      // the call in a long-lived session
      e.unpersist(); nodes.unpersist(); outDeg.unpersist(); yFull.unpersist()
    }
    f
  }
}
