package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ProfileStatsSpec extends SparkSpec {
  import spark.implicits._

  test("perDimStats computes correct moments per dimension") {
    val df = Seq(
      (0L, Seq(1.0f, 10.0f)),
      (1L, Seq(2.0f, 20.0f)),
      (2L, Seq(3.0f, 30.0f))).toDF("id", "vec")
    val stats = ProfileStats.perDimStats(df, "vec").orderBy("dim").collect()
    assert(stats(0).getAs[Double]("mean") == 2.0)
    assert(stats(1).getAs[Double]("mean") == 20.0)
    assert(math.abs(stats(0).getAs[Double]("std") - 1.0) < 1e-12)
    assert(stats(0).getAs[Double]("min") == 1.0 && stats(0).getAs[Double]("max") == 3.0)
    assert(stats(0).getAs[Long]("cnt") == 3)
  }

  test("histogram clamps out-of-range values into edge buckets") {
    val df = Seq(-5.0, 0.0, 9.9, 10.0, 55.0, 99.9, 150.0).toDF("v")
    val h = ProfileStats.histogram(df, col("v"), 0.0, 100.0, 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(0) == 3) // -5 clamped, 0.0, 9.9
    assert(h(1) == 1) // 10.0
    assert(h(5) == 1) // 55
    assert(h(9) == 2) // 99.9 + 150 clamped
  }

  test("quantiles: exact linear interpolation") {
    val df = (1 to 5).map(_.toDouble).toDF("v")
    val q = ProfileStats.quantiles(df, col("v"), Seq(0.0, 0.5, 0.75, 1.0))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(q(0.0) == 1.0 && q(0.5) == 3.0 && q(1.0) == 5.0)
    assert(q(0.75) == 4.0)
  }

  test("quantilesExactDistributed equals the aggregation-buffer exact form") {
    val rnd = new scala.util.Random(7)
    val df = (1 to 5000).map(_ => rnd.nextGaussian() * 100).toDF("v")
    val ps = Seq(0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 0.999, 1.0)
    val agg = ProfileStats.quantiles(df, col("v"), ps)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val dist = ProfileStats.quantilesExactDistributed(df, col("v"), ps)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    ps.foreach(p => assert(math.abs(agg(p) - dist(p)) < 1e-9, s"p=$p: ${agg(p)} vs ${dist(p)}"))
  }

  test("K-S: identical samples give D=0, disjoint samples give D=1") {
    val same = (1 to 100).flatMap(i => Seq((0, i.toDouble, 1), (0, i.toDouble, 2)))
      .toDF("dim", "value", "tag")
    val d0 = ProfileStats.ksStatistic(same).collect()(0).getAs[Double]("d")
    assert(d0 == 0.0)

    val disjoint = ((1 to 50).map(i => (0, i.toDouble, 1)) ++
      (51 to 100).map(i => (0, i.toDouble, 2))).toDF("dim", "value", "tag")
    val d1 = ProfileStats.ksStatistic(disjoint).collect()(0).getAs[Double]("d")
    assert(d1 == 1.0)
  }

  test("K-S handles ties via RANGE frame (CDF includes all equal values)") {
    // sample1 = {1,1,2}, sample2 = {1,2,2}: D = |2/3 - 1/3| at x=1
    val df = Seq((0, 1.0, 1), (0, 1.0, 1), (0, 2.0, 1), (0, 1.0, 2), (0, 2.0, 2), (0, 2.0, 2))
      .toDF("dim", "value", "tag")
    val d = ProfileStats.ksStatistic(df).collect()(0).getAs[Double]("d")
    assert(math.abs(d - 1.0 / 3.0) < 1e-12)
  }

  test("ksPValue: small D on large samples is insignificant, D=1 is significant") {
    assert(ProfileStats.ksPValue(0.01, 1000, 1000) > 0.9)
    assert(ProfileStats.ksPValue(1.0, 1000, 1000) < 1e-6)
  }

  test("groupedMadWinsorize: each group clips to its OWN fence") {
    // g0: 1..9 + outlier 1000 -> med 5.5, MAD 2.5, fence [-2, 13]
    // g1: 100,200,300 -> med 200, MAD 100, fence [-100, 500] (no clip)
    val rows = ((1 to 9).map(i => ("g0", i.toDouble)) :+ (("g0", 1000.0))) ++
      Seq(("g1", 100.0), ("g1", 200.0), ("g1", 300.0))
    val df = rows.zipWithIndex.map { case ((g, v), i) => (i.toLong, g, v) }
      .toDF("id", "grp", "v").repartition(3)
    val got = ProfileStats.groupedMadWinsorize(df, "grp", "v", c = 3.0)
      .collect().map(r => (r.getAs[String]("grp"), r.getAs[Double]("v")) ->
        r.getAs[Double]("winsorized")).toMap
    assert(got(("g0", 1000.0)) == 13.0)
    (1 to 9).foreach(i => assert(got(("g0", i.toDouble)) == i.toDouble))
    Seq(100.0, 200.0, 300.0).foreach(v => assert(got(("g1", v)) == v))
  }

  test("groupedMadWinsorize preserves rows of a group with no fence") {
    // g1's values are all NULL -> no quantile row for g1; its rows must
    // still appear (null winsorized), matching the ungrouped cardinality
    // contract — and g0 must clip exactly as if g1 were absent.
    val rows = Seq(("g0", Some(1.0)), ("g0", Some(2.0)), ("g0", Some(3.0)),
      ("g0", Some(1000.0)), ("g1", None), ("g1", None))
    val df = rows.zipWithIndex.map { case ((g, v), i) => (i.toLong, g, v) }
      .toDF("id", "grp", "v").repartition(3)
    val out = ProfileStats.groupedMadWinsorize(df, "grp", "v", c = 3.0)
    assert(out.count() == rows.size.toLong)
    val g1 = out.filter(col("grp") === "g1").collect()
    assert(g1.length == 2)
    g1.foreach(r => assert(r.isNullAt(r.fieldIndex("winsorized"))))
    // g0: med of (1,2,3,1000) = 2.5, MAD = med(1.5,0.5,0.5,997.5) = 1.0
    val g0 = out.filter(col("grp") === "g0").collect()
      .map(r => r.getAs[Double]("v") -> r.getAs[Double]("winsorized")).toMap
    assert(g0(1000.0) == 5.5)
    assert(g0(1.0) == 1.0 && g0(2.0) == 2.0 && g0(3.0) == 3.0)
  }

  test("madWinsorize clips to median ± c·MAD; inliers pass through") {
    // values 1..9 plus outliers ±1000: median 5 (11 values -> 6th = 6? no:
    // sorted: -1000,1,2,...,9,1000 -> median = 5), |x-5| medians to 3
    val df = (Seq(-1000.0, 1000.0) ++ (1 to 9).map(_.toDouble))
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
      .repartition(3)
    val got = ProfileStats.madWinsorize(df, "v", c = 3.0)
      .collect().map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    // fence = 5 ± 9
    assert(got(-1000.0) == -4.0 && got(1000.0) == 14.0)
    (1 to 9).foreach(i => assert(got(i.toDouble) == i.toDouble))
  }

  test("psiDrift: identical distributions stable, planted shift flags shifted, groups union") {
    // group a: identical in both versions -> psi ≈ 0 (stable)
    // group b: mass moves from the low to the high half -> shifted
    // group c: present only in the NEW version -> still emitted
    val oldV = ((1 to 100).map(i => ("a", (i % 10).toDouble)) ++
      (1 to 100).map(_ => ("b", 5.0))).toDF("g", "v")
    val newV = ((1 to 100).map(i => ("a", (i % 10).toDouble)) ++
      (1 to 100).map(_ => ("b", 95.0)) ++
      (1 to 10).map(_ => ("c", 1.0))).toDF("g", "v")
    val card = ProfileStats.psiDrift(oldV, newV, "g", "v",
        nBuckets = 10, lo = 0.0, hi = 100.0)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getString(4))).toMap
    assert(card.keySet == Set("a", "b", "c"))
    assert(card("a")._4 == "stable" && card("a")._3 < 0.01, card("a"))
    assert(card("b")._4 == "shifted" && card("b")._3 > 1.0, card("b"))
    assert(card("c")._1 == 0L && card("c")._2 == 10L) // new-only group survives
    // out-of-range values clamp to edge buckets rather than vanish
    val clamped = ProfileStats.psiDrift(
      Seq(("x", -50.0)).toDF("g", "v"), Seq(("x", 500.0)).toDF("g", "v"),
      "g", "v", nBuckets = 4, lo = 0.0, hi = 100.0).collect()
    assert(clamped.length == 1 && clamped.head.getLong(1) == 1L &&
      clamped.head.getLong(2) == 1L)
  }
}
