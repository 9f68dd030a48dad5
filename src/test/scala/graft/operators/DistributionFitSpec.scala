package graft.operators

import graft.SparkSpec

class DistributionFitSpec extends SparkSpec {

  private val rnd = new scala.util.Random(13)

  test("uniform sample fits as uniform (simplest model wins)") {
    val sample = Seq.fill(800)(rnd.nextDouble() * 4 - 2)
    val m = DistributionFit.fit(spark, sample)
    assert(m.isInstanceOf[DistributionFit.Uniform], m)
  }

  test("gaussian sample fits as normal") {
    val sample = Seq.fill(800)(rnd.nextGaussian() * 2 + 10)
    val m = DistributionFit.fit(spark, sample)
    assert(m.isInstanceOf[DistributionFit.Normal], m)
    val n = m.asInstanceOf[DistributionFit.Normal]
    assert(math.abs(n.mean - 10) < 0.3 && math.abs(n.stdDev - 2) < 0.3)
  }

  test("bimodal sample escalates past parametric (composite or empirical)") {
    val sample = Seq.fill(400)(rnd.nextGaussian() * 0.3 - 5) ++
      Seq.fill(400)(rnd.nextGaussian() * 0.3 + 5)
    val m = DistributionFit.fit(spark, sample)
    assert(!m.isInstanceOf[DistributionFit.Uniform] && !m.isInstanceOf[DistributionFit.Normal], m)
    // whatever the model, its CDF must track the empirical CDF
    assert(DistributionFit.ksAgainst(m, sample.sorted) < 0.10)
  }

  test("modelDiff flags kind mismatches and parameter drift") {
    val a = Map(
      0 -> (DistributionFit.Normal(0, 1): DistributionFit.Model),
      1 -> (DistributionFit.Uniform(0, 1): DistributionFit.Model))
    val b = Map(
      0 -> (DistributionFit.Normal(0.5, 1): DistributionFit.Model),
      1 -> (DistributionFit.Normal(0, 1): DistributionFit.Model))
    val rows = DistributionFit.modelDiff(a, b).orderBy("dim").collect()
    assert(rows(0).getAs[Boolean]("kind_match"))
    assert(math.abs(rows(0).getAs[Double]("max_param_drift") - 0.5) < 1e-12)
    assert(!rows(1).getAs[Boolean]("kind_match"))
  }

  test("oversized samples are stride-decimated, fit unchanged") {
    val rng = new scala.util.Random(7)
    val sample = Seq.fill(40000)(rng.nextGaussian() * 3 + 10)
    val full = DistributionFit.fit(spark, sample)
    // force the guard: cap far below the sample size
    val capped = DistributionFit.fit(spark, sample, maxSample = 2000)
    assert(full.kind == "normal" && capped.kind == "normal")
    val drift = (full.params.keySet ++ capped.params.keySet).map(k =>
      math.abs(full.params.getOrElse(k, 0.0) - capped.params.getOrElse(k, 0.0))).max
    assert(drift < 0.05, s"decimation moved the fit by $drift")
    // endpoints pinned: a uniform stays uniform with the true range
    val uni = (0 until 10000).map(_ / 9999.0)
    val u = DistributionFit.fit(spark, uni, maxSample = 100)
    assert(u == DistributionFit.Uniform(0.0, 1.0))
    intercept[IllegalArgumentException](
      DistributionFit.fit(spark, Seq(1.0), maxSample = 1))
  }

  test("empirical CDF interpolates the quantile table") {
    val e = DistributionFit.Empirical((0 to 10).map(_.toDouble))
    assert(DistributionFit.cdf(e, -1) == 0.0)
    assert(DistributionFit.cdf(e, 11) == 1.0)
    assert(math.abs(DistributionFit.cdf(e, 5.0) - 0.5) < 1e-9)
    assert(math.abs(DistributionFit.cdf(e, 2.5) - 0.25) < 1e-9)
  }
}
