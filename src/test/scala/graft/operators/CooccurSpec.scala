package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Co-occurrence contracts: hand-checkable pair counts and scores, the
  * oversized-group skew guard, symmetric emission, top-neighbor cut, and
  * the rate z-score window semantics.
  */
class CooccurSpec extends SparkSpec {
  import spark.implicits._

  private lazy val baskets = Seq(
    (1L, "x"), (1L, "y"), (1L, "z"),
    (2L, "x"), (2L, "y"),
    (3L, "x"), (3L, "y"),
    (4L, "z")).toDF("g", "item")

  test("pair counts, jaccard and lift match hand computation") {
    val p = Cooccur.pairs(baskets, "g", "item")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    // (x,y) in groups 1,2,3: cnt 3; n_x=3, n_y=3 -> jaccard 3/(3+3-3)=1
    // lift = 3*4/(3*3) = 4/3
    assert(p(("x", "y"))._1 == 3L)
    assert(p(("x", "y"))._2 == 1.0)
    assert(math.abs(p(("x", "y"))._3 - 4.0 / 3) < 1e-12)
    // (x,z) only group 1: jaccard 1/(3+2-1) = 0.25, lift 1*4/(3*2)
    assert(p(("x", "z"))._1 == 1L && p(("x", "z"))._2 == 0.25)
    assert(math.abs(p(("x", "z"))._3 - 4.0 / 6) < 1e-12)
    // ordered canonical pairs only
    assert(!p.contains(("y", "x")))
  }

  test("duplicate (group, item) rows count once") {
    val dup = baskets.union(baskets)
    val p1 = Cooccur.pairs(baskets, "g", "item").orderBy("a", "b").collect().toSeq
    val p2 = Cooccur.pairs(dup, "g", "item").orderBy("a", "b").collect().toSeq
    assert(p1 == p2)
  }

  test("oversized groups are excluded from pairs AND totals AND the group universe") {
    val withMega = baskets.union(
      (0 until 50).map(i => (99L, s"m$i")).toDF("g", "item"))
    val p = Cooccur.pairs(withMega, "g", "item", maxGroupSize = 10L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(4)).toMap
    assert(!p.keys.exists(k => k._1.startsWith("m") || k._2.startsWith("m")))
    // lift unchanged vs the clean fixture: the mega group left the universe
    assert(math.abs(p(("x", "y")) - 4.0 / 3) < 1e-12)
  }

  test("symmetric emission mirrors every pair; topNeighbors cuts per item") {
    val sym = Cooccur.pairs(baskets, "g", "item", symmetric = true)
    assert(sym.count() == 2 * Cooccur.pairs(baskets, "g", "item").count())
    val top = Cooccur.topNeighbors(sym, k = 1)
      .select("a", "b").as[(String, String)].collect().toMap
    assert(top("x") == "y" && top("y") == "x", top.toString)
  }

  test("rate z-scores: trailing window excludes the current bucket, nulls under 2 obs") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    // type 'a': counts 10, 10, 10, 22 across 4 hours
    val events = (Seq.fill(10)(0) ++ Seq.fill(10)(1) ++ Seq.fill(10)(2) ++
      Seq.fill(22)(3)).zipWithIndex.map { case (h, i) =>
      (i.toLong, 1L, "a", new java.sql.Timestamp(t0 + h * 3600000L + (i % 60) * 1000L))
    }.toDF("event_id", "user_id", "event_type", "ts")
    val z = Funnel.rateZscores(events, trailing = 24)
      .orderBy("hour").collect()
    assert(z(0).isNullAt(3), "first bucket: no trailing obs")
    assert(z(1).isNullAt(3), "second: one obs, stddev undefined")
    assert(z(2).isNullAt(3), "third: identical counts, zero variance")
    // fourth: mu = 10, sd = 0 over {10,10,10} -> still null? no: sd of
    // {10,10,10} is 0 -> null; the fixture needs variance — recheck:
    val z3 = z(3)
    assert(z3.isNullAt(3))
  }

  test("rate z-scores compute (cnt - mu)/sd over the trailing buckets") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    // counts 8, 12, 30: third bucket sees mu=10, sd=stddev_samp{8,12}
    val events = (Seq.fill(8)(0) ++ Seq.fill(12)(1) ++ Seq.fill(30)(2))
      .zipWithIndex.map { case (h, i) =>
      (i.toLong, 1L, "a", new java.sql.Timestamp(t0 + h * 3600000L + (i % 60) * 1000L))
    }.toDF("event_id", "user_id", "event_type", "ts")
    val z = Funnel.rateZscores(events, trailing = 24).orderBy("hour").collect()
    val sd = math.sqrt(((8.0 - 10) * (8 - 10) + (12.0 - 10) * (12 - 10)) / 1)
    assert(math.abs(z(2).getDouble(3) - (30.0 - 10) / sd) < 1e-9)
  }
}
