package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Neighborhood contracts: exact BFS distances on closed-form graphs
  * (chain, cycle, tree), shell/ball bookkeeping, harmonic centrality
  * closed forms, and HyperBall estimates vs the exact twin.
  */
class NeighborhoodsSpec extends SparkSpec {
  import spark.implicits._

  test("directed chain: shells are single nodes at exact distances") {
    val chain = (0L until 6L).map(i => (i, i + 1)).toDF("src", "dst")
    val d = Neighborhoods.boundedDistances(chain, radius = 3)
      .as[(Long, Long, Int)].collect().toSet
    // node 0 reaches 1@1, 2@2, 3@3; node 4 reaches 5@1, 6@2; node 6 nothing
    assert(d.contains((0L, 1L, 1)) && d.contains((0L, 2L, 2)) && d.contains((0L, 3L, 3)))
    assert(!d.exists(t => t._1 == 0L && t._2 == 4L), "radius bound")
    assert(!d.exists(_._1 == 6L), "sink has an empty ball")
    // distances are SHORTEST: no duplicate (id, other) at two dists
    assert(d.map(t => (t._1, t._2)).size == d.size)
  }

  test("directed cycle of 8: ball grows one per round, harmonic is Σ 1/d") {
    val cyc = (0L until 8L).map(i => (i, (i + 1) % 8)).toDF("src", "dst")
    val nf = Neighborhoods.neighborhoodFunction(cyc, radius = 4)
      .as[(Long, Int, Long, Long)].collect()
    assert(nf.length == 8 * 4)
    assert(nf.forall(_._3 == 1L), "each shell has exactly one node")
    nf.filter(_._1 == 3L).sortBy(_._2).map(_._4).toSeq match {
      case balls => assert(balls == Seq(1L, 2L, 3L, 4L), balls.toString)
    }
    val h = Neighborhoods.harmonicCentrality(cyc, radius = 4)
      .as[(Long, Double)].collect().toMap
    val expected = 1.0 + 0.5 + 1.0 / 3 + 0.25
    h.values.foreach(v => assert(math.abs(v - expected) < 1e-12, v.toString))
  }

  test("shortest distance wins when multiple paths exist") {
    // 0->1->3 and 0->3 direct: d(0,3) must be 1
    val g = Seq((0L, 1L), (1L, 3L), (0L, 3L)).toDF("src", "dst")
    val d = Neighborhoods.boundedDistances(g, radius = 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(d.contains((0L, 3L, 1)))
    assert(!d.contains((0L, 3L, 2)))
  }

  test("bounded weighted distances: closed forms, hop bound, cheaper-long-path wins") {
    // 0 -(5)-> 1 -(1)-> 2, and 0 -(10)-> 2 direct: via-1 path costs 6 < 10
    val g = Seq((0L, 1L, 5.0), (1L, 2L, 1.0), (0L, 2L, 10.0))
      .toDF("src", "dst", "w")
    val seeds = Seq(0L).toDF("id")
    val d2 = Neighborhoods.boundedWeightedDistances(g, seeds, rounds = 2)
      .as[(Long, Double)].collect().toMap
    assert(d2 == Map(0L -> 0.0, 1L -> 5.0, 2L -> 6.0), d2.toString)
    // rounds = 1 cannot take the 2-hop path: direct edge wins
    val d1 = Neighborhoods.boundedWeightedDistances(g, seeds, rounds = 1)
      .as[(Long, Double)].collect().toMap
    assert(d1(2L) == 10.0, d1.toString)
  }

  test("bounded weighted distances: multi-seed min, duplicate edges keep min weight") {
    val g = Seq((0L, 5L, 3.0), (0L, 5L, 7.0), (1L, 5L, 1.0))
      .toDF("src", "dst", "w")
    val d = Neighborhoods.boundedWeightedDistances(g, Seq(0L, 1L).toDF("id"), 1)
      .as[(Long, Double)].collect().toMap
    assert(d(5L) == 1.0, "nearest seed wins; dup edge min-merged")
    assert(d(0L) == 0.0 && d(1L) == 0.0)
  }

  test("hyperball estimates track the exact neighborhood function") {
    // quadratic graph, 200 nodes: compare est vs exact ball at r=1..3
    val edges = (0L until 200L).flatMap(i => Seq(0, 1, 2).map(j =>
      (i, (i * i + 1 + 17 * j) % 200))).filter(p => p._1 != p._2)
      .toDF("src", "dst").cache()
    val exact = Neighborhoods.neighborhoodFunction(edges, 3)
      .select(col("id"), col("dist"), col("ball")).as[(Long, Int, Long)]
      .collect().map(t => (t._1, t._2) -> (t._3 + 1)).toMap // +1: est includes self
    val est = Neighborhoods.hyperBall(edges, 3, lgK = 14)
      .as[(Long, Int, Double)].collect()
    est.foreach { case (id, r, e) =>
      val ex = exact.getOrElse((id, r),
        // nodes with an empty shell at r still carry their cumulative ball
        exact.filter(k => k._1._1 == id && k._1._2 < r)
          .maxByOption(_._1._2).map(_._2).getOrElse(1L))
      assert(math.abs(e - ex) <= math.max(2.0, 0.05 * ex),
        s"node $id r=$r est $e exact $ex")
    }
  }
}
