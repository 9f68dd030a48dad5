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

  test("iteration converges geometrically (alpha is the rate)") {
    def at(t: Int) = LabelProp.propagate(twoCommunities, seeds, iters = t)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val (a, b, c) = (at(5), at(10), at(20))
    val d1 = a.map { case (k, v) => math.abs(v - c(k)) }.max
    val d2 = b.map { case (k, v) => math.abs(v - c(k)) }.max
    assert(d2 < d1 / 2, s"not contracting: |f5-f20|=$d1 vs |f10-f20|=$d2")
  }
}
