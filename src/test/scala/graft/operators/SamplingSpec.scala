package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Deterministic sampling/split semantics: hash stability, quota rounding,
  * stratum routing, null-key handling, append stability, plan purity.
  */
class SamplingSpec extends SparkSpec {

  private def docs(n: Int) = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, s"s${i % 4}")).toDF("id", "stratum")
  }

  test("hashUnit is deterministic, salted, and in [0, 1e6)") {
    import spark.implicits._
    val df = (0 until 5000).map(_.toLong).toDF("id")
    val h1 = df.select(Sampling.hashUnit(col("id"), "a").as("h")).collect().map(_.getLong(0))
    val h2 = df.select(Sampling.hashUnit(col("id"), "a").as("h")).collect().map(_.getLong(0))
    val hb = df.select(Sampling.hashUnit(col("id"), "b").as("h")).collect().map(_.getLong(0))
    assert(h1.toSeq == h2.toSeq)
    assert(h1.toSeq != hb.toSeq)
    assert(h1.forall(h => h >= 0 && h < 1000000))
    // roughly uniform: mean of U[0,1e6) is 5e5 ± a few percent at n=5000
    val mean = h1.sum.toDouble / h1.length
    assert(math.abs(mean - 500000.0) < 25000.0)
  }

  test("stratified sample keeps ~fraction per stratum, exactly and stably") {
    val d = docs(4000)
    val out = Sampling.stratifiedSample(d, "stratum", "id",
      Map("s0" -> 0.5, "s1" -> 1.0, "s2" -> 0.0), default = 0.25)
    val counts = out.groupBy("stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("s1") == 1000)            // fraction 1.0 keeps everything
    assert(!counts.contains("s2"))          // fraction 0 drops everything
    assert(math.abs(counts("s0") - 500) < 60)   // ~0.5 of 1000
    assert(math.abs(counts("s3") - 250) < 60)   // default 0.25 of 1000
    // per-key decisions are stable across runs
    val again = Sampling.stratifiedSample(d, "stratum", "id",
      Map("s0" -> 0.5, "s1" -> 1.0, "s2" -> 0.0), default = 0.25)
    assert(out.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      again.select("id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("quota rounds (not truncates), matching assignSplit thresholds") {
    import spark.implicits._
    val d = Seq(42L).toDF("id").withColumn("s", lit("x"))
    val u = d.select(Sampling.hashUnit(col("id"), "strat").as("u")).collect()(0).getLong(0)
    // quota = round(u + 0.7) = u + 1 keeps the row; a truncating quota
    // (u) would drop it — the off-by-one slot the DuckDB replay disputes
    val f = (u + 0.7) / 1e6
    assert(Sampling.stratifiedSample(d, "s", "id", Map("x" -> f)).count() == 1)
  }

  test("null keys draw from the sentinel: kept at fraction 1, split assigned") {
    import spark.implicits._
    val d = Seq((java.lang.Long.valueOf(1L), "x"), (null.asInstanceOf[java.lang.Long], "x"))
      .toDF("id", "s")
    assert(Sampling.stratifiedSample(d, "s", "id", Map("x" -> 1.0)).count() == 2)
    val splits = Sampling.assignSplit(d, "id", Seq("a" -> 0.5, "b" -> 0.5))
      .collect().map(r => Option(r.get(0)) -> r.getString(2)).toMap
    // the null row's label equals the sentinel string's label — deterministic
    val sentinel = Seq(Tuple1(Sampling.NullKeySentinel)).toDF("id")
    val want = Sampling.assignSplit(sentinel, "id", Seq("a" -> 0.5, "b" -> 0.5))
      .collect()(0).getString(1)
    assert(splits(None) == want)
  }

  test("split assignment covers all rows with ~the requested weights, stable on append") {
    val d = docs(10000)
    val out = Sampling.assignSplit(d, "id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 10000)
    assert(math.abs(counts("train") - 8000) < 200)
    assert(math.abs(counts("val") - 1000) < 120)
    assert(math.abs(counts("test") - 1000) < 120)
    // growing the corpus never reassigns existing keys
    val grown = Sampling.assignSplit(docs(20000), "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val before = out.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val after = grown.filter(col("id") < 10000).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(before == after)
  }

  test("weightedSample matches the sequential E-S draw; non-positive weights excluded") {
    import spark.implicits._
    val rows = (1L to 100L).map(i => (i, (i % 7) + 1.0)) ++
      Seq((200L, 0.0), (201L, -3.0))
    val got = Sampling.weightedSample(rows.toDF("id", "w").repartition(5),
        "id", "w", n = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    // sequential reference: u from the md5-60 hash, rank by ln(u)/w desc
    val want = rows.filter(_._2 > 0).map { case (id, w) =>
      val u = (graft.functions.StableHash.md5Hash60(s"$id:wsample") + 1)
        .toDouble / math.pow(2, 60)
      (id, math.log(u) / w)
    }.sortBy { case (id, es) => (-es, id) }.take(10)
      .map { case (id, es) => (id, math.rint(es * 1e6) / 1e6) }
    assert(got.toSeq == want)
    assert(!got.exists(r => r._1 == 200L || r._1 == 201L))
    // sample size caps at the eligible row count
    assert(Sampling.weightedSample(
      rows.toDF("id", "w"), "id", "w", n = 500).count() == 100)
  }

  test("both operators are pure projection/filter: no shuffle in the plan") {
    val d = docs(100)
    val p1 = Sampling.stratifiedSample(d, "stratum", "id", Map("s0" -> 0.5))
      .queryExecution.executedPlan.toString
    val p2 = Sampling.assignSplit(d, "id", Seq("a" -> 0.5, "b" -> 0.5))
      .queryExecution.executedPlan.toString
    assert(!p1.contains("Exchange") && !p2.contains("Exchange"))
  }

  test("perGroupSample: exactly k per group, stable across runs, salted") {
    import spark.implicits._
    val d = (1 to 200).map(i => (i.toLong, s"g${i % 4}")).toDF("id", "grp")
      .repartition(6)
    val s1 = Sampling.perGroupSample(d, "grp", "id", k = 7)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("rn")))
    val s2 = Sampling.perGroupSample(d, "grp", "id", k = 7)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("rn")))
    assert(s1.toSet == s2.toSet && s1.length == 28) // 4 groups x 7
    assert(s1.map(_._2).forall(rn => rn >= 1 && rn <= 7))
    val other = Sampling.perGroupSample(d, "grp", "id", k = 7, salt = "b")
      .collect().map(_.getAs[Long]("id")).toSet
    assert(other != s1.map(_._1).toSet)
  }

  test("curriculumSchedule: monotone stages, salted within-stage shuffle") {
    import spark.implicits._
    val d = (1 to 97).map(i => (i.toLong, (i * 31 % 97).toDouble))
      .toDF("id", "difficulty").repartition(5)
    val got = Sampling.curriculumSchedule(d, "id", "difficulty", k = 4)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Double]("difficulty"),
        r.getAs[Long]("stage"), r.getAs[Long]("shuffle_key")))
    // stages partition the difficulty order: max difficulty of stage s
    // <= min of stage s+1
    val byStage = got.groupBy(_._3).view.mapValues(_.map(_._2)).toMap
    assert(byStage.keySet == Set(1L, 2L, 3L, 4L))
    for (s <- 1L to 3L)
      assert(byStage(s).max <= byStage(s + 1).min)
    // shuffle key is the documented hashUnit (deterministic, salted)
    val want = d.select(col("id"),
        Sampling.hashUnit(col("id"), "curriculum").as("k"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.foreach { case (id, _, _, k) => assert(k == want(id)) }
    // a different salt reorders within stages (epoch reshuffle)
    val other = Sampling.curriculumSchedule(d, "id", "difficulty", 4, salt = "ep2")
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("shuffle_key")))
    assert(other.toMap != got.map(t => t._1 -> t._4).toMap)
  }

  test("curriculumSchedule rejects a pre-existing shuffle_key column") {
    import spark.implicits._
    val d = Seq((1L, 0.5, 9L)).toDF("id", "difficulty", "shuffle_key")
    intercept[IllegalArgumentException] {
      Sampling.curriculumSchedule(d, "id", "difficulty", k = 2)
    }
  }

  test("budgetSelect keeps the maximal density-ordered prefix under the budget") {
    import spark.implicits._
    // densities: a=3.0, b=2.0, c=1.0, d=0.5; costs 10, 20, 30, 40
    val d = Seq((1L, 30.0, 10L), (2L, 40.0, 20L), (3L, 30.0, 30L), (4L, 20.0, 40L))
      .toDF("id", "score", "cost")
    // budget 60: a(10) + b(20) + c(30) = 60 fits; d overflows
    val got = Sampling.budgetSelect(d, "id", "score", "cost", budget = 60L)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("cum_before")).toMap
    assert(got == Map(1L -> 0L, 2L -> 10L, 3L -> 30L))
    // budget 35: a + b = 30 fits; c (cum 30 + 30 > 35) is out AND so is
    // everything after it (prefix semantics), even though nothing fits anyway
    val got35 = Sampling.budgetSelect(d, "id", "score", "cost", budget = 35L)
      .collect().map(_.getAs[Long]("id")).toSet
    assert(got35 == Set(1L, 2L))
  }

  test("budgetSelect is partition-invariant and ties break by id") {
    import spark.implicits._
    val d = (0L until 1000L).map(i => (i, 10.0, 10L)).toDF("id", "score", "cost")
    // all densities tie at 1.0: the budget keeps the lowest 50 ids
    for (parts <- Seq(1, 7)) {
      val got = Sampling.budgetSelect(d.repartition(parts), "id", "score", "cost",
        budget = 500L).collect().map(_.getAs[Long]("id")).toSet
      assert(got == (0L until 50L).toSet, s"parts=$parts")
    }
  }

  test("budgetSelect drops rows without a computable density (null/zero/negative cost)") {
    import spark.implicits._
    val d = Seq(
      (1L, Some(10.0), Some(10L)),
      (2L, None, Some(10L)),
      (3L, Some(10.0), Some(0L)),
      (4L, Some(10.0), None),
      (5L, Some(1.0), Some(-5L)))
      .toDF("id", "score", "cost")
    val got = Sampling.budgetSelect(d, "id", "score", "cost", budget = 100L)
      .collect().map(_.getAs[Long]("id")).toSet
    assert(got == Set(1L))
  }

  test("budgetSelectPerGroup runs the knapsack independently inside each group") {
    import spark.implicits._
    val d = Seq(
      ("a", 1L, 30.0, 10L), ("a", 2L, 40.0, 20L), ("a", 3L, 30.0, 30L),
      ("b", 4L, 5.0, 25L), ("b", 5L, 50.0, 10L))
      .toDF("g", "id", "score", "cost")
    val got = Sampling.budgetSelectPerGroup(d, "g", "id", "score", "cost",
        budgetPerGroup = 30L)
      .collect().map(r => r.getAs[Long]("id")).toSet
    // a: densities 3.0(c10), 2.0(c20), 1.0(c30) -> 10+20 fits; b: 5.0(c10)
    // fits, 0.2(c25) overflows 30
    assert(got == Set(1L, 2L, 5L))
  }

  test("budgetSelect: zero budget selects nothing; reserved column rejected") {
    import spark.implicits._
    val d = Seq((1L, 1.0, 1L)).toDF("id", "score", "cost")
    assert(Sampling.budgetSelect(d, "id", "score", "cost", 0L).count() == 0L)
    intercept[IllegalArgumentException] {
      Sampling.budgetSelect(
        Seq((1L, 1.0, 1L, 0L)).toDF("id", "score", "cost", "cum_before"),
        "id", "score", "cost", 10L)
    }
  }
}
