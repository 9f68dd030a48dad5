package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The two-pass global rank / ntile must equal Spark's own window-function
  * definitions (which ARE the ANSI definitions) on every size/bucket shape:
  * n < k, n divisible by k, and ragged n % k != 0 — and must be independent
  * of the partition count.
  */
class RankingSpec extends SparkSpec {
  import spark.implicits._

  private def df(n: Int) = {
    // non-trivial order: descending values with duplicate payloads, unique id
    (1 to n).map(i => ((i * 37) % n, i.toLong)).toDF("v", "id")
      .repartition(5)
  }

  test("globalRank equals row_number over the same total order") {
    val d = df(101)
    val got = Ranking.globalRank(d, Seq("v", "id"))
      .select("v", "id", "rank").orderBy("rank")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val want = d.withColumn("rank",
        row_number().over(Window.orderBy("v", "id")).cast("long"))
      .select("v", "id", "rank").orderBy("rank")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == want.toSeq)
  }

  test("fileOrderOrdinal equals row_number over monotonically_increasing_id, with no shuffle and no window") {
    val d = df(257)
    val got = Ranking.fileOrderOrdinal(d, "ordinal")
    // identical ordering to the single-partition-window form it replaces
    val want = d.withColumn("ordinal",
      (row_number().over(Window.orderBy(monotonically_increasing_id())) - 1)
        .cast("long"))
    assert(got.select("v", "id", "ordinal").collect().toSeq.sortBy(_.getLong(2)) ==
      want.select("v", "id", "ordinal").collect().toSeq.sortBy(_.getLong(2)))
    // contiguous 0-based
    val ords = got.select("ordinal").collect().map(_.getLong(0)).sorted
    assert(ords.toSeq == (0L until 257L))
    // plan shape: no exchange, no window on the numbering path
    got.collect()
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Window"), plan)
    // reserved-column guard
    intercept[IllegalArgumentException](
      Ranking.fileOrderOrdinal(got, "ordinal"))
    // empty input
    assert(Ranking.fileOrderOrdinal(df(5).limit(0), "ordinal").count() == 0)
  }

  test("ntileBuckets equals ntile(k) for ragged, exact and n<k shapes") {
    for ((n, k) <- Seq((101, 10), (100, 10), (7, 10), (1, 3), (64, 8))) {
      val d = df(n)
      val got = Ranking.ntileBuckets(d, Seq("v", "id"), k)
        .select("id", "bucket").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = d.withColumn("bucket",
          ntile(k).over(Window.orderBy("v", "id")).cast("long"))
        .select("id", "bucket").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"n=$n k=$k")
    }
  }

  test("ranks are independent of the partition count") {
    val d = df(53)
    val one = Ranking.globalRank(d, Seq("v", "id"), numParts = 1)
      .select("id", "rank").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val many = Ranking.globalRank(d, Seq("v", "id"), numParts = 11)
      .select("id", "rank").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one == many)
  }

  test("empty input yields empty output") {
    val d = Seq.empty[(Int, Long)].toDF("v", "id")
    assert(Ranking.ntileBuckets(d, Seq("v", "id"), 4).count() == 0L)
  }

  test("percentRank equals percent_rank(), including the n=1 edge") {
    val d = df(77)
    val got = Ranking.percentRank(d, Seq("v", "id"))
      .select("id", "pr").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = d.withColumn("pr",
        round(percent_rank().over(Window.orderBy("v", "id")), 6))
      .select("id", "pr").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == want)
    val one = Seq((5, 1L)).toDF("v", "id")
    assert(Ranking.percentRank(one, Seq("v", "id"))
      .select("pr").head.getDouble(0) == 0.0)
  }

  test("randomized differential: ntile equals the window definition on random shapes") {
    val rnd = new scala.util.Random(41)
    for (_ <- 1 to 8) {
      val n = 1 + rnd.nextInt(200)
      val k = 1 + rnd.nextInt(16)
      val rows = (1 to n).map(i => (rnd.nextInt(20), i.toLong)) // heavy ties
      val d = rows.toDF("v", "id").repartition(1 + rnd.nextInt(8))
      val got = Ranking.ntileBuckets(d, Seq("v", "id"), k)
        .select("id", "bucket").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = d.withColumn("bucket",
          ntile(k).over(Window.orderBy("v", "id")).cast("long"))
        .select("id", "bucket").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"n=$n k=$k")
    }
  }

  test("groupedPercentRank equals the partitioned window, skew included") {
    // heavily skewed groups: one group owns ~80% of rows, plus a
    // singleton group (pr must be 0.0 there, the SQL n=1 rule)
    val rows = (1 to 400).map { i =>
      val g = if (i <= 320) "big" else if (i == 400) "solo" else s"g${i % 7}"
      (g, (i * 13) % 50, i.toLong)
    }
    val d = rows.toDF("grp", "v", "id").repartition(6)
    val got = Ranking.groupedPercentRank(d, "grp", Seq("v", "id"))
      .select("id", "pr").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = d.withColumn("pr",
        round(percent_rank().over(Window.partitionBy("grp").orderBy("v", "id")), 6))
      .select("id", "pr").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == want)
  }

  test("groupedRank equals the partitioned row_number") {
    val rows = (1 to 300).map(i =>
      (s"g${i % 5}", (i * 17) % 40, i.toLong))
    val d = rows.toDF("grp", "v", "id").repartition(7)
    val got = Ranking.groupedRank(d, "grp", Seq("v", "id"))
      .select("id", "grank").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = d.withColumn("rn",
        row_number().over(Window.partitionBy("grp").orderBy("v", "id")).cast("long"))
      .select("id", "rn").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("groupedQuantiles equals per-group quantile_cont interpolation") {
    val rnd = new scala.util.Random(23)
    val rows = (1 to 500).map(i =>
      (s"g${i % 4}", rnd.nextInt(1000).toDouble, i.toLong))
    val d = rows.toDF("grp", "v", "id").repartition(6)
    val ps = Seq(0.0, 0.1, 0.5, 0.9, 1.0)
    val got = Ranking.groupedQuantiles(d, "grp", "v", ps)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    // sequential quantile_cont replay per group
    for ((g, vs0) <- rows.groupBy(_._1); p <- ps) {
      val vs = vs0.map(_._2).sorted
      val x = p * (vs.length - 1)
      val (lo, hi) = (vs(x.floor.toInt), vs(x.ceil.toInt))
      val want = math.rint((lo + (hi - lo) * (x - x.floor)) * 1e6) / 1e6
      assert(got((g, p)) == want, s"g=$g p=$p")
    }
  }

  test("rankEnsemble averages the per-signal percent ranks, keeping each") {
    val d = (1 to 50).map(i => (i.toLong, (i * 13) % 50, (i * 29) % 50))
      .toDF("id", "a", "b").repartition(4)
    val got = Ranking.rankEnsemble(d, Seq("a", "b"), "id")
    assert(got.columns.toSet ==
      Set("id", "a", "b", "pr_a", "pr_b", "quality_ensemble"))
    val rows = got.collect().map(r => (
      r.getAs[Long]("id"), r.getAs[Double]("pr_a"), r.getAs[Double]("pr_b"),
      r.getAs[Double]("quality_ensemble")))
    rows.foreach { case (id, a, b, e) =>
      assert(e == (a + b) / 2.0, s"id=$id") }
    val wantA = d.withColumn("w",
        round(percent_rank().over(Window.orderBy("a", "id")), 6))
      .select("id", "w").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { case (id, a, _, _) => assert(a == wantA(id)) }
  }

  test("rankEnsemble rejects pre-existing pr_<signal>/out columns") {
    val withPr = Seq((1L, 2, 0.0)).toDF("id", "a", "pr_a")
    intercept[IllegalArgumentException] {
      Ranking.rankEnsemble(withPr, Seq("a"), "id")
    }
    val withOut = Seq((1L, 2, 0.0)).toDF("id", "a", "quality_ensemble")
    intercept[IllegalArgumentException] {
      Ranking.rankEnsemble(withOut, Seq("a"), "id")
    }
  }

  test("groupedExclusivePrefixSum equals the sequential per-group scan at any partitioning") {
    import spark.implicits._
    // mixed sizes: g0 is a GIANT group that must span partitions; g1..g9
    // are small; values vary so a wrong carry is visible
    val rows = (0L until 3000L).map { i =>
      val g = if (i < 2400) "g0" else s"g${1 + (i % 9)}"
      (g, i, (i % 13) + 1)
    }
    val want = rows.groupBy(_._1).flatMap { case (_, rs) =>
      var run = 0L
      rs.sortBy(_._2).map { r => val b = run; run += r._3; (r._2, b) }
    }
    for (parts <- Seq(1, 3, 17)) {
      val got = Ranking.groupedExclusivePrefixSum(
          rows.toDF("g", "ord", "v"), "g", Seq("ord"), "v", "cum",
          numParts = parts)
        .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
      assert(got == want.toMap, s"parts=$parts")
    }
  }

  test("groupedExclusivePrefixSum: one group spanning EVERY partition carries exactly") {
    import spark.implicits._
    val rows = (0L until 500L).map(i => ("only", i, 2L))
    val got = Ranking.groupedExclusivePrefixSum(
        rows.toDF("g", "ord", "v"), "g", Seq("ord"), "v", "cum", numParts = 11)
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    (0L until 500L).foreach(i => assert(got(i) == i * 2L, s"ord $i"))
  }

  test("groupedExclusivePrefixSum: randomized group layouts across partitionings") {
    import spark.implicits._
    // deterministic pseudo-random layouts: group sizes from 1 to ~700,
    // several seeds, several partition counts — every (seed, parts) pair
    // must match the sequential per-group scan exactly
    for (seed <- Seq(1, 7, 23)) {
      val sizes = (0 until 40).map(g =>
        1 + (graft.functions.StableHash.fnv64(s"sz:$seed:$g").abs % 700L).toInt)
      val rows = sizes.zipWithIndex.flatMap { case (sz, g) =>
        (0 until sz).map { i =>
          val ord = (graft.functions.StableHash.fnv64(s"o:$seed:$g:$i").abs % 1000000L)
          (f"g$g%03d", ord * 1024 + i, // unique order key (i < 701 < 1024)
            (graft.functions.StableHash.fnv64(s"v:$seed:$g:$i").abs % 9L) + 1)
        }
      }
      val want = rows.groupBy(_._1).flatMap { case (g, rs) =>
        var run = 0L
        rs.sortBy(_._2).map { r => val b = run; run += r._3; ((g, r._2), b) }
      }.toMap
      for (parts <- Seq(2, 13)) {
        val got = Ranking.groupedExclusivePrefixSum(
            rows.toDF("g", "ord", "v"), "g", Seq("ord"), "v", "cum",
            numParts = parts)
          .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
        assert(got == want, s"seed=$seed parts=$parts")
      }
    }
  }

  test("groupedExclusivePrefixSum: binary group keys compare by VALUE across partitions") {
    import spark.implicits._
    // two groups whose keys are byte arrays; Array[Byte] == is reference
    // equality, so without normalization every row would look like a new
    // group and carries/resets would silently zero out
    val rows = (0L until 600L).map { i =>
      val g = if (i < 400) Array[Byte](1, 2, 3) else Array[Byte](9)
      (g, i, 3L)
    }
    val got = Ranking.groupedExclusivePrefixSum(
        rows.toDF("g", "ord", "v"), "g", Seq("ord"), "v", "cum", numParts = 7)
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    (0L until 400L).foreach(i => assert(got(i) == i * 3L, s"group-a ord $i"))
    (400L until 600L).foreach(i => assert(got(i) == (i - 400L) * 3L, s"group-b ord $i"))
  }

  test("groupedExclusivePrefixSum rejects non-atomic group key types") {
    import spark.implicits._
    val df = Seq((Seq(1L), 1L, 1L)).toDF("g", "ord", "v")
    intercept[IllegalArgumentException] {
      Ranking.groupedExclusivePrefixSum(df, "g", Seq("ord"), "v", "cum")
    }
  }

  test("groupedExclusivePrefixSum rejects an existing output column") {
    import spark.implicits._
    intercept[IllegalArgumentException] {
      Ranking.groupedExclusivePrefixSum(
        Seq(("g", 1L, 1L, 0L)).toDF("g", "ord", "v", "cum"),
        "g", Seq("ord"), "v", "cum")
    }
  }

  test("quantileNormalize: extremes map to global extremes; scales become comparable") {
    import spark.implicits._
    // group a scores in 1..100, group b in 1000..100000 — incomparable scales
    val df = ((1L to 100L).map(i => (i, "a", i)) ++
      (101L to 200L).map(i => (i, "b", (i - 100) * 1000))).toDF("id", "g", "s")
    val norm = Ranking.quantileNormalize(df, "g", "s", "id")
      .select(col("id"), col("g"), col("s"), col("norm_score"))
      .as[(Long, String, Long, Long)].collect()
    val globalMin = 1L
    val globalMax = 100000L
    // each group's best/worst hit the global extremes
    Seq("a", "b").foreach { g =>
      val grp = norm.filter(_._2 == g).sortBy(_._3)
      assert(grp.head._4 == globalMin, s"group $g min -> ${grp.head._4}")
      assert(grp.last._4 == globalMax, s"group $g max -> ${grp.last._4}")
      // within-group order preserved under normalization
      val ns = grp.map(_._4)
      assert(ns.sorted.sameElements(ns), s"group $g order broken")
    }
    // the p-th ranked doc of both groups normalizes to the SAME value
    val byRank = norm.groupBy(_._2).map { case (_, rows) =>
      rows.sortBy(_._3).map(_._4).toSeq
    }.toSeq
    assert(byRank.head == byRank(1),
      "equal within-group ranks must map to equal normalized scores")
    // output column collision fails loudly
    intercept[IllegalArgumentException] {
      Ranking.quantileNormalize(
        df.withColumn("norm_score", lit(0)), "g", "s", "id")
    }
  }
}
