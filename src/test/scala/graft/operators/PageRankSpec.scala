package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** PageRank contracts: probability-mass conservation, known closed-form
  * graphs, dangling-mass redistribution, convergence of the delta
  * instrument, and O(1) lineage across iterations (the property that
  * keeps a 50-iteration run plannable at all).
  */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  test("mass conserved and strictly positive on a ring") {
    val ring = (0L until 20L).map(i => (i, (i + 1) % 20)).toDF("src", "dst")
    val r = PageRank.pageRank(ring, iters = 15).select("rank").as[Double].collect()
    assert(math.abs(r.sum - 1.0) < 1e-9, s"mass ${r.sum}")
    assert(r.forall(_ > 0))
    // the ring is vertex-transitive: every node must score exactly 1/20
    assert(r.forall(v => math.abs(v - 0.05) < 1e-9), r.toSeq.take(3).toString)
  }

  test("star graph concentrates rank on the center") {
    val star = (1L until 10L).map(i => (i, 0L)).toDF("src", "dst")
    val r = PageRank.pageRank(star, iters = 60)
      .collect().map(row => row.getLong(0) -> row.getDouble(1)).toMap
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
    // closed form with d=0.85, n=10, dangling center: c = 0.12975/0.26475;
    // 60 iterations contract the transient to ~0.735^60 ~ 1e-8
    assert(math.abs(r(0L) - 0.12975 / 0.26475) < 1e-6, s"center ${r(0L)}")
    val leaves = r.filterKeys(_ != 0L).values.toSeq
    assert(r(0L) > 4 * leaves.max, "center dominates every leaf")
    assert(leaves.max - leaves.min < 1e-12, "leaves are symmetric")
  }

  test("dangling node redistributes its mass — total stays 1") {
    // 0 -> 1 -> 2, and 2 has NO outlinks (dangling)
    val chain = Seq((0L, 1L), (1L, 2L)).toDF("src", "dst")
    val r = PageRank.pageRank(chain, iters = 25).select("rank").as[Double].collect()
    assert(math.abs(r.sum - 1.0) < 1e-9,
      s"dangling mass must be redistributed, sum ${r.sum}")
  }

  test("l1 delta shrinks as iterations grow (the convergence instrument)") {
    // IRREGULAR in-degrees (a regular graph starts AT the uniform fixed
    // point and every delta is exactly 0): a 7i+1 ring plus a hub
    val edges = ((0L until 60L).map(i => (i, (i * 7 + 1) % 60)) ++
      (1L until 10L).map(i => (i, 0L)))
      .filter { case (a, b) => a != b }.toDF("src", "dst")
    val early = PageRank.l1Delta(edges, PageRank.pageRank(edges, 2))
      .as[Double].head()
    val late = PageRank.l1Delta(edges, PageRank.pageRank(edges, 12))
      .as[Double].head()
    assert(late < early / 10,
      s"delta must contract geometrically: iters=2 -> $early, iters=12 -> $late")
  }

  test("personalized PageRank: mass conserved, seeds and their reach outrank the far side") {
    // ring 0..19; seed node 0 — rank must decay with ring distance
    val ring = (0L until 20L).map(i => (i, (i + 1) % 20)).toDF("src", "dst")
    val seeds = Seq((0L, 1.0)).toDF("id", "weight")
    val r = PageRank.personalizedPageRank(ring, seeds, iters = 30)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(math.abs(r.values.sum - 1.0) < 1e-9, s"mass ${r.values.sum}")
    assert(r(0L) > r(1L) && r(1L) > r(2L) && r(2L) > r(3L),
      s"rank must decay along the walk direction: $r")
    assert(r(0L) > r(10L) * 4, s"the seed dominates the antipode: ${r(0L)} vs ${r(10L)}")
    val e = intercept[IllegalArgumentException](
      PageRank.personalizedPageRank(ring, Seq((0L, 0.0)).toDF("id", "weight"), 5))
    assert(e.getMessage.contains("sum > 0"))
  }

  test("lineage is O(1) in the iteration count (checkpointed each step)") {
    val edges = (0L until 30L).map(i => (i, (i + 7) % 30)).toDF("src", "dst")
    val short = PageRank.pageRank(edges, 2).queryExecution.optimizedPlan.toString
    val long = PageRank.pageRank(edges, 12).queryExecution.optimizedPlan.toString
    // both plans are a single checkpointed scan leaf — iteration count
    // must not leak into the lineage
    assert(!long.contains("Join"), s"iteration chain leaked into the plan:\n$long")
    assert(math.abs(long.length - short.length) < 200,
      s"plan grows with iters: ${short.length} vs ${long.length}")
  }
}
