package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Label-propagation contracts: community members inherit their seed's
  * sign, isolated seeds anchor at (1−α)·y, scores never exceed the seed
  * range (contraction), and iteration converges geometrically.
  */
class LabelPropSpec extends SparkSpec {
  import spark.implicits._

  // two triangles {0,1,2} and {10,11,12} joined by one weak bridge 2-10
  private lazy val twoCommunities = LabelProp.symmetrize(Seq(
    (0L, 1L), (1L, 2L), (2L, 0L),
    (10L, 11L), (11L, 12L), (12L, 10L),
    (2L, 10L)).toDF("src", "dst"))

  private lazy val seeds = Seq((0L, 1.0), (11L, -1.0)).toDF("id", "label")

  test("community members inherit their seed's sign across the bridge cut") {
    val f = LabelProp.propagate(twoCommunities, seeds, iters = 20)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(Seq(0L, 1L, 2L).forall(f(_) > 0), s"left community positive: $f")
    assert(Seq(10L, 11L, 12L).forall(f(_) < 0), s"right community negative: $f")
    assert(f(0L) > f(2L), "the bridge node is pulled toward the other side")
    assert(f(11L) < f(10L))
  }

  test("an isolated seed anchors at (1 - alpha) * y") {
    val f = LabelProp.propagate(twoCommunities,
        seeds.union(Seq((99L, 1.0)).toDF("id", "label")), iters = 10, alpha = 0.8)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(f(99L) - 0.2) < 1e-12, s"isolated seed: ${f(99L)}")
  }

  test("contraction: no score ever exceeds the seed magnitude") {
    val f = LabelProp.propagate(twoCommunities, seeds, iters = 30)
      .select("score").as[Double].collect()
    assert(f.forall(s => math.abs(s) <= 1.0 + 1e-12), f.toSeq.toString)
  }

  test("unit weights reduce to the unweighted propagation exactly") {
    val weighted = twoCommunities.withColumn("wt", lit(1.0))
    val unw = LabelProp.propagate(twoCommunities, seeds, iters = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val w = LabelProp.propagate(weighted, seeds, iters = 10,
        weightCol = Some("wt"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(unw.keySet == w.keySet)
    unw.foreach { case (id, v) =>
      assert(math.abs(v - w(id)) < 1e-12, s"node $id: $v vs ${w(id)}")
    }
  }

  test("heavier edges conduct more label mass") {
    // seed 0 reaches 1 over weight 4 and 2 over weight 1: after one round
    // f(1) = alpha * 4/5 * f0(0), f(2) = alpha * 1/5 * f0(0) — exactly 4:1
    val e = LabelProp.symmetrizeWeighted(
      Seq((0L, 1L, 4.0), (0L, 2L, 1.0)).toDF("src", "dst", "w"))
    val f = LabelProp.propagate(e, Seq((0L, 1.0)).toDF("id", "label"),
        iters = 1, alpha = 0.8, weightCol = Some("w"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(f(1L) - 0.8 * 0.8) < 1e-12, s"heavy leg: ${f(1L)}")
    assert(math.abs(f(2L) - 0.8 * 0.2) < 1e-12, s"light leg: ${f(2L)}")
    assert(math.abs(f(1L) / f(2L) - 4.0) < 1e-9, s"conductance ratio: $f")
  }

  test("string ids: host-graph propagation works without casts") {
    val hosts = LabelProp.symmetrize(Seq(
      ("a.com", "b.com"), ("b.com", "c.com"), ("x.org", "y.org"))
      .toDF("src", "dst"))
    val f = LabelProp.propagate(hosts,
        Seq(("a.com", 1.0)).toDF("id", "label"), iters = 10)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(f("a.com") > f("b.com") && f("b.com") > f("c.com"),
      s"label must decay with hop distance: $f")
    assert(f("c.com") > 0, s"two hops still reached: $f")
    assert(f("x.org") == 0.0 && f("y.org") == 0.0,
      s"disconnected component must stay at zero: $f")
  }

  test("iteration converges geometrically (alpha is the rate)") {
    def at(t: Int) = LabelProp.propagate(twoCommunities, seeds, iters = t)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val (a, b, c) = (at(5), at(10), at(20))
    val d1 = a.map { case (k, v) => math.abs(v - c(k)) }.max
    val d2 = b.map { case (k, v) => math.abs(v - c(k)) }.max
    assert(d2 < d1 / 2, s"not contracting: |f5-f20|=$d1 vs |f10-f20|=$d2")
  }
}
