package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core extraction over an undirected edge list — the dense-community
  * instrument next to [[Triangles]]: the k-core is the maximal subgraph
  * where every node keeps degree ≥ k after everyone below is removed
  * (Seidman 1983 — public literature). On a near-dup graph the 3-core is
  * the "everything here really is mutually similar" region, where
  * transitive keep-one is safe; the 1-core minus 2-core is the chain
  * tail where it is not ([[Triangles]] measures the same risk by local
  * density; this measures it by peeling).
  *
  * Spark shape — iterative peeling with bounded rounds: each round
  * recomputes degrees over the surviving edge set (one partial-agg
  * shuffle) and drops nodes under k (one broadcast-friendly semi-join:
  * the dropped set is usually tiny). [[Materialize]] per round — the
  * survivor relation is referenced twice (degree pass + edge filter),
  * the same double-reference materialization rule PageRank documents;
  * pass `checkpointDir` for reliable-storage checkpointing on a real
  * cluster. Rounds are data-dependent but ≤ the peel depth, which on
  * power-law graphs is tiny (a planted fixture converges in ≤ 3; the
  * operator fails loudly at `maxRounds` instead of silently returning a
  * non-core — the [[Dedup.connectedComponents]] discipline).
  *
  * Cores are NESTED (k-core ⊆ (k−1)-core), so the multi-k instruments
  * peel INCREMENTALLY: each threshold starts from the previous core's
  * surviving edges, never from the original edge set — at a realistic
  * coreness sweep that saves ~|ks|× the shuffles on the biggest
  * relation. [[coreness]] is the one-pass form: peel at k = 1, 2, 3, …
  * on the shrinking survivor set and record each node's removal
  * threshold — the full core decomposition in Σ peel-depth rounds.
  *
  * Ids are type-agnostic (longs, strings/hosts): every step is equality
  * joins and counts — host-graph cores work directly.
  */
object KCore {

  /** One peel at threshold `k` from an already-symmetrized, self-loop-free
    * edge frame. Returns (survivingEdges materialized, survivingEdgeCount,
    * roundsUsed); `converged` enforcement is the caller's (budget is
    * shared across a sweep). The input must already be materialized.
    * `startCount` (>= 0) is the caller's already-known edge count of
    * `start` — passing it saves the entry count job on incremental sweeps.
    *
    * WITNESS FUSION (the PageRank.iterateUntil discipline): each round's
    * survivor frame materializes LAZILY and the convergence count is the
    * job that computes and persists it; the previous round's count is
    * REMEMBERED instead of re-aggregated — one job per round where the
    * old shape paid three (materialize + count(next) + count(cur)).
    */
  private def peel(start: DataFrame, k: Int, maxRounds: Int,
      matLazy: DataFrame => DataFrame,
      startCount: Long = -1L): (DataFrame, Long, Int, Boolean) = {
    var cur = start
    var curCount = if (startCount >= 0) startCount else start.count()
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxRounds) {
      val deg = cur.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
      val keep = deg.filter(col("deg") >= k).select("id")
      val next = matLazy(cur
        .join(keep.select(col("id").as("src")), Seq("src"), "left_semi")
        .join(keep.select(col("id").as("dst")), Seq("dst"), "left_semi")
        .select(col("src"), col("dst")))
      // one aggregate answers "did this round remove anything" AND
      // computes/persists the new frame
      val nextCount = next.count()
      converged = nextCount == curCount
      // free superseded rounds, but never the caller-owned `start`
      if (!(cur eq start)) Materialize.free(cur)
      cur = next
      curCount = nextCount
      rounds += 1
    }
    (cur, curCount, rounds, converged)
  }

  private def undirected(edges: DataFrame, srcCol: String, dstCol: String) =
    LabelProp.symmetrize(edges, srcCol, dstCol)
      .filter(col("src") =!= col("dst"))

  /** Surviving (src, dst) edges of the k-core (symmetrized, both
    * directions present). Returns an empty frame when nothing survives.
    */
  def kCoreEdges(edges: DataFrame, k: Int, maxRounds: Int = 50,
      srcCol: String = "src", dstCol: String = "dst",
      checkpointDir: Option[String] = None): DataFrame = {
    require(k >= 1, s"kCoreEdges: k must be >= 1, got $k")
    require(maxRounds >= 1, s"kCoreEdges: maxRounds must be >= 1, got $maxRounds")
    val mat = Materialize.policy(edges.sparkSession, checkpointDir)
    val matLazy = Materialize.policyLazy(edges.sparkSession, checkpointDir)
    val (core, _, rounds, converged) =
      peel(mat(undirected(edges, srcCol, dstCol)), k, maxRounds, matLazy)
    require(converged,
      s"kCoreEdges: no fixpoint after $rounds rounds (maxRounds=$maxRounds) — raise maxRounds")
    core
  }

  /** Per-node core membership card at the given k values: (id, max_core)
    * where max_core is the LARGEST of `ks` whose core contains the node
    * (0 if none). `ks` must be ascending; each peel starts from the
    * PREVIOUS core's surviving edges (nesting), so the sweep costs one
    * full peel plus |ks|−1 incremental ones.
    */
  def coreMembership(edges: DataFrame, ks: Seq[Int], maxRounds: Int = 50,
      srcCol: String = "src", dstCol: String = "dst",
      checkpointDir: Option[String] = None): DataFrame = {
    require(ks.nonEmpty && ks == ks.sorted && ks.distinct == ks,
      s"coreMembership: ks must be ascending and distinct: $ks")
    val mat = Materialize.policy(edges.sparkSession, checkpointDir)
    val matLazy = Materialize.policyLazy(edges.sparkSession, checkpointDir)
    val und = mat(undirected(edges, srcCol, dstCol))
    val nodes = und.select(col("src").as("id")).distinct()
    var cur = und
    var curCount = -1L
    ks.foldLeft(nodes.select(col("id"), lit(0).as("max_core"))) { (acc, k) =>
      val (core, coreCount, rounds, converged) =
        peel(cur, k, maxRounds, matLazy, curCount)
      require(converged,
        s"coreMembership: k=$k no fixpoint after $rounds rounds — raise maxRounds")
      cur = core
      curCount = coreCount
      val members = core.select(col("src").as("id")).distinct()
      acc.join(members.withColumn("in_core", lit(1)), Seq("id"), "left")
        .select(col("id"),
          when(col("in_core").isNotNull, lit(k)).otherwise(col("max_core"))
            .as("max_core"))
    }
  }

  /** Weighted (strength) core — the s-core generalization (Eidsaa &
    * Almaas 2013 — public literature): peel nodes whose incident weight
    * SUM falls under `s` until stable. On a similarity graph this keeps
    * the region that is strongly mutually similar in AGGREGATE — two
    * borderline edges don't substitute for one strong one the way the
    * unweighted 2-core pretends. Edges symmetrize with max-merged weights
    * ([[LabelProp.symmetrizeWeighted]]); weights must be > 0. Same peel
    * shape as [[kCoreEdges]]: one sum aggregate + two semi-joins per
    * round, materialized survivors, loud non-convergence. Output:
    * surviving (src, dst, w), both directions.
    */
  def sCoreEdges(edges: DataFrame, s: Double, maxRounds: Int = 50,
      srcCol: String = "src", dstCol: String = "dst", weightCol: String = "w",
      checkpointDir: Option[String] = None): DataFrame = {
    require(s > 0, s"sCoreEdges: s must be > 0, got $s")
    require(maxRounds >= 1, s"sCoreEdges: maxRounds must be >= 1, got $maxRounds")
    val mat = Materialize.policy(edges.sparkSession, checkpointDir)
    val matLazy = Materialize.policyLazy(edges.sparkSession, checkpointDir)
    var cur = mat(LabelProp.symmetrizeWeighted(edges, srcCol, dstCol, weightCol)
      .filter(col("src") =!= col("dst")).filter(col("w") > 0))
    var curCount = cur.count()
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxRounds) {
      val strength = cur.groupBy(col("src").as("id")).agg(sum(col("w")).as("st"))
      val keep = strength.filter(col("st") >= s).select("id")
      // witness fusion: the count computes and persists the new frame,
      // and the previous count is remembered (see peel)
      val next = matLazy(cur
        .join(keep.select(col("id").as("src")), Seq("src"), "left_semi")
        .join(keep.select(col("id").as("dst")), Seq("dst"), "left_semi")
        .select(col("src"), col("dst"), col("w")))
      val nextCount = next.count()
      converged = nextCount == curCount
      Materialize.free(cur)
      cur = next
      curCount = nextCount
      rounds += 1
    }
    require(converged,
      s"sCoreEdges: no fixpoint after $rounds rounds (maxRounds=$maxRounds) — raise maxRounds")
    cur
  }

  /** Full core decomposition in ONE incremental sweep: (id, coreness INT)
    * for every node with at least one edge, coreness(v) = max{k : v is in
    * the k-core}. Peels at k = 1, 2, 3, … over the SHRINKING survivor
    * set; a node removed while peeling at threshold k survived the
    * (k−1)-peel, so its coreness is exactly k−1. Terminates when the
    * survivor set empties (the max coreness is reached); total rounds =
    * Σ_k peel-depth(k), budgeted by `maxRounds` ACROSS the sweep —
    * failing loudly on exhaustion rather than returning a partial
    * decomposition.
    */
  def coreness(edges: DataFrame, maxRounds: Int = 200,
      srcCol: String = "src", dstCol: String = "dst",
      checkpointDir: Option[String] = None): DataFrame = {
    require(maxRounds >= 1, s"coreness: maxRounds must be >= 1, got $maxRounds")
    val spark = edges.sparkSession
    val mat = Materialize.policy(spark, checkpointDir)
    var cur = mat(undirected(edges, srcCol, dstCol))
    // materialized so the later free(result) only ever touches the result
    // frame's own blocks, never a leaf shared with the live edge frame
    var result = mat(cur.select(col("src").as("id")).distinct()
      .select(col("id"), lit(0).as("coreness")))
    val matLazy = Materialize.policyLazy(spark, checkpointDir)
    var budget = maxRounds
    var k = 1
    var n = cur.count()
    while (n > 0) {
      val (core, coreCount, rounds, converged) = peel(cur, k, budget, matLazy, n)
      require(converged,
        s"coreness: k=$k exhausted the $maxRounds-round budget — raise maxRounds")
      budget -= math.max(rounds - 1, 0) // converged peels spend rounds-1 removing
      val survivors = core.select(col("src").as("id")).distinct()
      // survivors of the k-peel have coreness >= k; the k-peel's victims
      // keep their previous value (k-1 or earlier thresholds)
      val newResult = mat(result.join(survivors.withColumn("in_core", lit(1)), Seq("id"), "left")
        .select(col("id"),
          when(col("in_core").isNotNull, lit(k)).otherwise(col("coreness"))
            .as("coreness")))
      // the old result (and, once newResult is materialized, the old edge
      // frame unless peel returned it unchanged) are dead — free them
      Materialize.free(result)
      if (!(core eq cur)) Materialize.free(cur)
      result = newResult
      cur = core
      n = coreCount // peel already counted the survivors (witness fusion)
      k += 1
    }
    result
  }
}
