package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-radius neighborhood analysis over a directed edge list: exact
  * distance shells, the neighborhood function N(v, r), harmonic
  * centrality, and the HyperBall sketch path (Boldi & Vigna 2013 —
  * public literature) for graphs where the exact pair relation is too
  * large. These are the graph-health instruments a link-corpus curation
  * pass reads: ball growth curves separate hub-connected cores from
  * peripheral chains, and harmonic centrality is the standard
  * distance-based importance measure that — unlike closeness — handles
  * unreachable pairs gracefully (they contribute 0, not ∞).
  *
  * Exact path ([[boundedDistances]]): level-synchronous BFS. Round d
  * joins the frontier (id, other) with the edge list and anti-joins the
  * known set — one hash join + one anti-join shuffle per round, frames
  * carry (id, other) pairs only. The pair relation is Σ_v |B_R(v)| rows:
  * right for moderate R or a seed sample; at full-graph scale use
  * [[hyperBall]], whose state is one fixed-size HLL sketch per node
  * (Spark's Datasketches `hll_sketch_agg`/`hll_union_agg` — codegen'd
  * aggregates, no UDFs) and whose per-round cost is ONE (dst-grouped)
  * sketch-union shuffle, the same shape as a PageRank round.
  *
  * Both paths materialize per round ([[Materialize]]): the exact path
  * materializes each round's SHELL once and keeps the visited set as a
  * lazy union over those materialized shells (the anti-join re-reads
  * cached blocks; no per-round copy of the whole set), the sketch path
  * materializes its state frame — PageRank.scala's 2^T lineage guard.
  *
  * Distances follow OUT-edges: d(v, u) = length of the shortest directed
  * path v → u. For undirected semantics pass symmetrized edges
  * ([[LabelProp.symmetrize]]).
  */
object Neighborhoods {

  /** Exact (id, other, dist) pairs for 1 ≤ dist ≤ radius. Deterministic
    * (set semantics; no floats). Self-pairs (dist 0) are excluded.
    */
  def boundedDistances(edges: DataFrame, radius: Int,
      srcCol: String = "src", dstCol: String = "dst",
      checkpointDir: Option[String] = None): DataFrame = {
    require(radius >= 1, s"boundedDistances: radius >= 1, got $radius")
    val mat = Materialize.policy(edges.sparkSession, checkpointDir)
    // LAZY checkpoint: the first round's materialization job computes
    // and persists e too (witness fusion) — one job, not two
    val e = Materialize.sizedByKey(
      edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
        .filter(col("src") =!= col("dst")).distinct(), "src").localCheckpoint(false)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()

    // `known` is a LAZY union of the already-materialized shells: every
    // leg is a LogicalRDD, so the anti-join re-reads cached blocks and
    // the per-round "copy the whole visited set into a fresh
    // materialization" job (O(Σ shells) per round — quadratic in total
    // across rounds) is gone. Same BFS set semantics, one materialization
    // per round instead of two.
    var known = mat(nodes.select(col("id"), col("id").as("other")))
    var frontier = known
    var acc: DataFrame = null
    for (d <- 1 to radius) {
      val next = mat(frontier.join(e, col("other") === col("src"))
        .select(col("id"), col("dst").as("other")).distinct()
        .join(known, Seq("id", "other"), "left_anti"))
      val shell = next.withColumn("dist", lit(d))
      acc = if (acc == null) shell else acc.unionByName(shell)
      known = known.unionByName(next)
      frontier = next
    }
    acc
  }

  /** Ball shell sizes per node: (id, dist, cnt) = |{u : d(id,u) = dist}|
    * for 1..radius, plus the cumulative ball size |B_dist(id)| — the
    * exact HyperBall neighborhood function. Nodes whose shell is empty at
    * some dist simply have no row there (cnt 0).
    */
  def neighborhoodFunction(edges: DataFrame, radius: Int,
      srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    val shells = boundedDistances(edges, radius, srcCol, dstCol)
      .groupBy(col("id"), col("dist")).agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy("dist")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    shells.withColumn("ball", sum(col("cnt")).over(w))
  }

  /** Harmonic centrality within `radius`:
    * H(v) = Σ_{u ≠ v, d(v,u) ≤ radius} 1 / d(v,u). One fixed expression
    * per pair — deterministic to float summation order.
    */
  def harmonicCentrality(edges: DataFrame, radius: Int,
      srcCol: String = "src", dstCol: String = "dst"): DataFrame =
    boundedDistances(edges, radius, srcCol, dstCol)
      .groupBy(col("id"))
      .agg(sum(lit(1.0) / col("dist")).as("harmonic"))

  /** Bounded-hop weighted shortest paths from a seed set (Bellman–Ford
    * relaxation rounds): dist(v) = min cost of a directed path of at most
    * `rounds` edges from any seed. Weights must be ≥ 0. Each round is one
    * hash join + one (id, min dist) partial-agg shuffle — the frame
    * carries only REACHED nodes (16 bytes each) and is materialized per
    * round. Integer-valued weights make the result exact; the oracle
    * unrolls the same relaxation. Output: (id, dist) with dist = 0.0 on
    * seeds.
    */
  def boundedWeightedDistances(edges: DataFrame, seeds: DataFrame, rounds: Int,
      srcCol: String = "src", dstCol: String = "dst", weightCol: String = "w",
      seedIdCol: String = "id", checkpointDir: Option[String] = None): DataFrame = {
    require(rounds >= 1, s"boundedWeightedDistances: rounds >= 1, got $rounds")
    val mat = Materialize.policy(edges.sparkSession, checkpointDir)
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
        col(weightCol).cast("double").as("w"))
      .filter(col("src") =!= col("dst") && col("w") >= 0)
      .groupBy("src", "dst").agg(min(col("w")).as("w"))
      .localCheckpoint(false) // computed+persisted by the first round's job
    var d = mat(seeds.select(col(seedIdCol).as("id")).distinct()
      .select(col("id"), lit(0.0).as("dist")))
    for (_ <- 1 to rounds) {
      val relax = d.join(e, col("id") === col("src"))
        .select(col("dst").as("id"), (col("dist") + col("w")).as("dist"))
      val nxt = mat(d.unionByName(relax)
        .groupBy("id").agg(min(col("dist")).as("dist")))
      Materialize.free(d)
      d = nxt
    }
    d
  }

  /** HyperBall: approximate ball sizes via per-node HLL sketches.
    * State is (id, sketch) — one fixed-size binary per node regardless of
    * ball size. Round r unions each node's sketch with its out-neighbors'
    * sketches (one join + one `hll_union_agg` shuffle) and emits the
    * estimated |B_r(v)| (the estimate INCLUDES the node itself, matching
    * N(v,r) = |{u : d ≤ r}| with d = 0 allowed). Output: (id, dist, est).
    * Estimates carry standard HLL error (~1.6% at lgK 12); the exact twin
    * above is the spec's ground truth.
    */
  def hyperBall(edges: DataFrame, radius: Int,
      srcCol: String = "src", dstCol: String = "dst", lgK: Int = 12,
      checkpointDir: Option[String] = None): DataFrame = {
    require(radius >= 1, s"hyperBall: radius >= 1, got $radius")
    val mat = Materialize.policy(edges.sparkSession, checkpointDir)
    // LAZY checkpoint: the first round's materialization job computes
    // and persists e too (witness fusion) — one job, not two
    val e = Materialize.sizedByKey(
      edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
        .filter(col("src") =!= col("dst")).distinct(), "src").localCheckpoint(false)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()

    var state = mat(nodes.groupBy(col("id"))
      .agg(hll_sketch_agg(col("id"), lit(lgK)).as("sk")))
    var acc: DataFrame = null
    for (d <- 1 to radius) {
      // gather out-neighbor sketches onto src, union with own sketch
      val gathered = state.join(e, col("id") === col("dst"))
        .groupBy(col("src").as("gid"))
        .agg(hll_union_agg(col("sk")).as("nsk"))
      state = mat(state.join(gathered, col("id") === col("gid"), "left")
        .select(col("id"),
          when(col("nsk").isNull, col("sk"))
            .otherwise(hll_union(col("sk"), col("nsk"))).as("sk")))
      val est = state.select(col("id"), lit(d).as("dist"),
        hll_sketch_estimate(col("sk")).as("est"))
      acc = if (acc == null) est else acc.unionByName(est)
    }
    acc
  }
}
