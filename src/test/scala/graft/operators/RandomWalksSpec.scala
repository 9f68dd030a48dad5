package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Random-walk contracts: every consecutive pair is a real edge, walks
  * are bit-deterministic across runs and seeds diverge, sinks truncate,
  * the choice mix actually spreads across neighbors, and the skip-gram
  * pair count matches its closed form on full-length walks.
  */
class RandomWalksSpec extends SparkSpec {
  import spark.implicits._

  // quadratic-map graph over 60 nodes: irregular, no sinks
  private lazy val edges = (0L until 60L).flatMap(i =>
    Seq(0, 1, 2).map(j => (i, (i * i + 1 + 17 * j) % 60)))
    .filter(p => p._1 != p._2).distinct.toDF("src", "dst").cache()
  private lazy val starts = (0L until 60L by 5L).toDF("id")

  test("every consecutive walk pair is an edge of the graph") {
    val wk = RandomWalks.walks(edges, starts, length = 6)
    val hops = wk.as("a").join(wk.as("b"),
        col("a.walk_id") === col("b.walk_id") &&
          col("b.step") === col("a.step") + 1)
      .select(col("a.node").as("src"), col("b.node").as("dst"))
    assert(hops.count() == 12 * 6, "12 walks x 6 hops, no truncation")
    assert(hops.except(edges).count() == 0, "all hops are edges")
  }

  test("walks are deterministic; different seeds diverge") {
    val a = RandomWalks.walks(edges, starts, 6).orderBy("walk_id", "step")
      .collect().toSeq
    val b = RandomWalks.walks(edges, starts, 6).orderBy("walk_id", "step")
      .collect().toSeq
    assert(a == b, "same seed, bit-identical")
    val c = RandomWalks.walks(edges, starts, 6, seed = 7L)
      .orderBy("walk_id", "step").collect().toSeq
    assert(a != c, "seed must steer the walks")
  }

  test("sink truncates the walk") {
    val chain = Seq((0L, 1L), (1L, 2L)).toDF("src", "dst") // 2 is a sink
    val wk = RandomWalks.walks(chain, Seq(0L).toDF("id"), length = 5)
      .orderBy("step").collect()
    assert(wk.map(_.getInt(2)).toSeq == Seq(0, 1, 2), "truncated at the sink")
    assert(wk.map(_.getLong(1)).toSeq == Seq(0L, 1L, 2L))
  }

  test("the choice mix spreads across neighbors (no constant-index collapse)") {
    // star-out: node 0 -> 1..8; 100 walks of length 1 from 100 aliases of 0
    // is not expressible (walk_id = start), so instead check across steps:
    // walks from all 60 nodes, step-1 choices must hit more than one pos
    val adj = RandomWalks.rankedAdjacency(edges)
    val wk = RandomWalks.walks(edges, (0L until 60L).toDF("id"), 1)
    val firstHops = wk.filter(col("step") === 1)
      .join(wk.filter(col("step") === 0).select(col("walk_id"),
        col("node").as("origin")), "walk_id")
      .join(adj, col("origin") === col("src") && col("node") === col("dst"))
    val positions = firstHops.select("pos").distinct().as[Long].collect()
    assert(positions.length > 1, s"choices collapsed to pos ${positions.toSeq}")
  }

  test("skip-gram pair count matches the closed form on full-length walks") {
    val wk = RandomWalks.walks(edges, starts, length = 5)
    val pairs = RandomWalks.skipGramPairs(wk, window = 2)
    // per full walk of 6 positions, ordered pairs with 0<|i-j|<=2:
    // sum_i |{j}| = 2*(2*6 - 2*3/2) ... computed directly:
    val perWalk = (0 to 5).map(i =>
      (0 to 5).count(j => j != i && math.abs(j - i) <= 2)).sum
    assert(pairs.count() == 12L * perWalk, s"expected ${12L * perWalk}")
    // symmetry: (center@s, context) pairs mirror (context@s', center)
    val sym = pairs.groupBy("walk_id").count().as[(Long, Long)].collect()
    assert(sym.forall(_._2 == perWalk), "every walk contributes equally")
  }
}
