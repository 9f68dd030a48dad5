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
  * the dropped set is usually tiny). `localCheckpoint` per round — the
  * survivor relation is referenced twice (degree pass + edge filter),
  * the same double-reference materialization rule PageRank documents.
  * Rounds are data-dependent but ≤ the peel depth, which on power-law
  * graphs is tiny (a planted fixture converges in ≤ 3; the operator
  * fails loudly at `maxRounds` instead of silently returning a
  * non-core — the [[Dedup.connectedComponents]] discipline).
  */
object KCore {

  /** Surviving (src, dst) edges of the k-core (symmetrized, both
    * directions present). Returns an empty frame when nothing survives.
    */
  def kCoreEdges(edges: DataFrame, k: Int, maxRounds: Int = 50,
      srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    require(k >= 1, s"kCoreEdges: k must be >= 1, got $k")
    require(maxRounds >= 1, s"kCoreEdges: maxRounds must be >= 1, got $maxRounds")
    var cur = LabelProp.symmetrize(edges, srcCol, dstCol)
      .filter(col("src") =!= col("dst"))
      .localCheckpoint(true)
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxRounds) {
      val deg = cur.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
      val keep = deg.filter(col("deg") >= k).select("id")
      val next = cur
        .join(keep.select(col("id").as("src")), Seq("src"), "left_semi")
        .join(keep.select(col("id").as("dst")), Seq("dst"), "left_semi")
        .select(col("src"), col("dst"))
        .localCheckpoint(true)
      // one aggregate answers "did this round remove anything"
      converged = next.count() == cur.count()
      cur = next
      rounds += 1
    }
    require(converged,
      s"kCoreEdges: no fixpoint after $maxRounds rounds — raise maxRounds")
    cur
  }

  /** Per-node core membership card at the given k values: (id, max_core)
    * where max_core is the LARGEST of `ks` whose core contains the node
    * (0 if none). `ks` must be ascending and small — one peel per k.
    */
  def coreMembership(edges: DataFrame, ks: Seq[Int], maxRounds: Int = 50,
      srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    require(ks.nonEmpty && ks == ks.sorted && ks.distinct == ks,
      s"coreMembership: ks must be ascending and distinct: $ks")
    val und = LabelProp.symmetrize(edges, srcCol, dstCol)
      .filter(col("src") =!= col("dst"))
    val nodes = und.select(col("src").as("id")).distinct()
    ks.foldLeft(nodes.select(col("id"), lit(0).as("max_core"))) { (acc, k) =>
      val core = kCoreEdges(edges, k, maxRounds, srcCol, dstCol)
        .select(col("src").as("id")).distinct()
      acc.join(core.withColumn("in_core", lit(1)), Seq("id"), "left")
        .select(col("id"),
          when(col("in_core").isNotNull, lit(k)).otherwise(col("max_core"))
            .as("max_core"))
    }
  }
}
