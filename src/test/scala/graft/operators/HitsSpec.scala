package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** HITS contracts: closed forms on star and bipartite graphs, L1
  * normalization of both score vectors, the hub/authority role split on
  * a directed chain, and agreement of the iterates' direction with the
  * principal-eigenvector fixed point.
  */
class HitsSpec extends SparkSpec {
  import spark.implicits._

  private def asMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap

  test("in-star: center is the sole authority, leaves split hub mass evenly") {
    val star = (1L until 9L).map(i => (i, 0L)).toDF("src", "dst")
    val m = asMap(Hits.hits(star, iters = 5))
    assert(math.abs(m(0L)._2 - 1.0) < 1e-12, s"center auth ${m(0L)._2}")
    assert(math.abs(m(0L)._1) < 1e-12, "center has no out-edges: hub 0")
    (1L until 9L).foreach { i =>
      assert(math.abs(m(i)._1 - 0.125) < 1e-12, s"leaf $i hub ${m(i)._1}")
      assert(math.abs(m(i)._2) < 1e-12, s"leaf $i auth ${m(i)._2}")
    }
  }

  test("both score vectors are L1-normalized and non-negative") {
    // irregular graph: quadratic map over 50 nodes
    val edges = (0L until 50L).flatMap(i => Seq(0, 1, 2).map(j =>
      (i, (i * i + 1 + 17 * j) % 50))).filter(p => p._1 != p._2)
      .toDF("src", "dst")
    val rows = Hits.hits(edges, iters = 8).collect()
    val hubs = rows.map(_.getDouble(1))
    val auths = rows.map(_.getDouble(2))
    assert(math.abs(hubs.sum - 1.0) < 1e-9, s"hub mass ${hubs.sum}")
    assert(math.abs(auths.sum - 1.0) < 1e-9, s"auth mass ${auths.sum}")
    assert(hubs.forall(_ >= 0) && auths.forall(_ >= 0))
  }

  test("bipartite complete graph: closed-form uniform split per side") {
    // 3 hubs x 4 authorities, complete: fixed point is exact after one round
    val edges = (for (h <- 0L until 3L; a <- 10L until 14L) yield (h, a))
      .toDF("src", "dst")
    val m = asMap(Hits.hits(edges, iters = 1))
    (0L until 3L).foreach { h =>
      assert(math.abs(m(h)._1 - 1.0 / 3) < 1e-12, s"hub $h ${m(h)._1}")
      assert(math.abs(m(h)._2) < 1e-12)
    }
    (10L until 14L).foreach { a =>
      assert(math.abs(m(a)._2 - 1.0 / 4) < 1e-12, s"auth $a ${m(a)._2}")
      assert(math.abs(m(a)._1) < 1e-12)
    }
  }

  test("directed chain splits roles: every non-sink hubs, every non-source authorities") {
    val chain = (0L until 10L).map(i => (i, i + 1)).toDF("src", "dst")
    val m = asMap(Hits.hits(chain, iters = 12))
    assert(math.abs(m(10L)._1) < 1e-12, "sink is no hub")
    assert(math.abs(m(0L)._2) < 1e-12, "source is no authority")
    assert(m(0L)._1 > 0 && m(10L)._2 > 0)
    // interior nodes carry both roles
    (1L until 10L).foreach(i => assert(m(i)._1 > 0 && m(i)._2 > 0, s"node $i"))
  }

  test("iterates approach the AᵀA principal eigenvector (fixed-point residual shrinks)") {
    val edges = (0L until 40L).flatMap(i => Seq(0, 1, 2).map(j =>
      (i, (i * i + 1 + 17 * j) % 40))).filter(p => p._1 != p._2)
      .toDF("src", "dst").cache()
    def authVec(iters: Int): Map[Long, Double] =
      Hits.hits(edges, iters).collect()
        .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val a3 = authVec(3); val a10 = authVec(10); val a11 = authVec(11)
    def dist(x: Map[Long, Double], y: Map[Long, Double]) =
      x.keys.map(k => math.abs(x(k) - y(k))).sum
    // successive-iterate movement at t=10..11 must be far below the
    // t=3..10 movement: geometric contraction to the fixed point
    assert(dist(a10, a11) < dist(a3, a10) / 10 + 1e-15,
      s"residual ${dist(a10, a11)} vs earlier ${dist(a3, a10)}")
  }

  test("duplicate edges and self-loops are ignored") {
    val noisy = Seq((1L, 0L), (1L, 0L), (2L, 0L), (0L, 0L), (2L, 2L))
      .toDF("src", "dst")
    val clean = Seq((1L, 0L), (2L, 0L)).toDF("src", "dst")
    val a = Hits.hits(noisy, 4).orderBy("id").collect().toSeq
    val b = Hits.hits(clean, 4).orderBy("id").collect().toSeq
    assert(a == b)
  }
}
