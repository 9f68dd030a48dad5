package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Distribution model extraction (SURVEY.md A9/A10/A11; reference
  * `analyze profile` fitting ladder, 06_model_fitting.md:30-106):
  * parametric (simplest first, K-S gated) → composite (EM mixture) →
  * empirical (quantile table) fallback.
  *
  * The heavy lifting (moments, histograms, quantiles, K-S) runs distributed
  * via ProfileStats; the final parameter solve is driver-side per dimension
  * (a handful of doubles per dim — never the data).
  */
object DistributionFit {

  sealed trait Model { def kind: String; def params: Map[String, Double] }
  final case class Uniform(lower: Double, upper: Double) extends Model {
    val kind = "uniform"
    def params = Map("lower" -> lower, "upper" -> upper)
  }
  final case class Normal(mean: Double, stdDev: Double) extends Model {
    val kind = "normal"
    def params = Map("mean" -> mean, "std_dev" -> stdDev)
  }
  final case class Composite(weights: Seq[Double], components: Seq[Normal]) extends Model {
    val kind = "composite"
    def params = weights.zipWithIndex.map { case (w, i) => s"w$i" -> w }.toMap ++
      components.zipWithIndex.flatMap { case (c, i) =>
        Seq(s"mean$i" -> c.mean, s"std_dev$i" -> c.stdDev)
      }
  }
  final case class Empirical(quantiles: Seq[Double]) extends Model {
    val kind = "empirical"
    def params = quantiles.zipWithIndex.map { case (q, i) => s"p${i * 10}" -> q }.toMap
  }

  def cdf(m: Model, x: Double): Double = m match {
    case Uniform(a, b) =>
      if (x <= a) 0.0 else if (x >= b) 1.0 else (x - a) / (b - a)
    case Normal(mu, sd) => normalCdf((x - mu) / sd)
    case Composite(ws, cs) =>
      ws.zip(cs).map { case (w, c) => w * cdf(c, x) }.sum
    case Empirical(qs) =>
      // linear interpolation through the fixed-percentile table
      if (x <= qs.head) 0.0
      else if (x >= qs.last) 1.0
      else {
        val i = qs.lastIndexWhere(_ <= x)
        val (x0, x1) = (qs(i), qs(i + 1))
        val p0 = i.toDouble / (qs.size - 1)
        if (x1 == x0) p0 else p0 + (x - x0) / (x1 - x0) / (qs.size - 1)
      }
  }

  private def normalCdf(z: Double): Double = {
    // Abramowitz-Stegun 7.1.26 erf approximation (|err| < 1.5e-7)
    val t = 1.0 / (1.0 + 0.3275911 * math.abs(z) / math.sqrt(2.0))
    val y = 1.0 - (((((1.061405429 * t - 1.453152027) * t) + 1.421413741) * t -
      0.284496736) * t + 0.254829592) * t * math.exp(-z * z / 2.0)
    if (z >= 0) 0.5 * (1.0 + y) else 0.5 * (1.0 - y)
  }

  /** K-S statistic of a model against a sorted sample. */
  def ksAgainst(m: Model, sorted: Seq[Double]): Double = {
    val n = sorted.size
    sorted.zipWithIndex.map { case (x, i) =>
      val c = cdf(m, x)
      math.max(math.abs(c - i.toDouble / n), math.abs(c - (i + 1).toDouble / n))
    }.max
  }

  /** Parametric ladder on one dimension's sample: simplest model whose K-S
    * is under `threshold` (default 0.03 per 06_model_fitting.md:44), else
    * EM-composite (2..maxModes), else empirical quantile table.
    *
    * Driver-memory guard: the ladder is meant for a BOUNDED per-dimension
    * sample; a caller that collects a full 100TB column into `sample` gets
    * a deterministic stride-decimation down to `maxSample` points (every
    * k-th order statistic — the empirical CDF the K-S gate reads is
    * preserved to ±1/maxSample) instead of an O(n·modes·iters) driver EM.
    */
  def fit(spark: SparkSession, sample: Seq[Double], threshold: Double = 0.03,
      maxModes: Int = 4, maxSample: Int = 1000000): Model = {
    require(sample.nonEmpty, "empty sample")
    require(maxSample > 1, s"maxSample must be > 1, got $maxSample")
    val sortedAll = sample.sorted
    val sorted =
      if (sortedAll.size <= maxSample) sortedAll
      else {
        val all = sortedAll.toIndexedSeq
        val n = all.size
        // endpoints pinned so Uniform/Empirical keep the true range
        (0 until maxSample).map(i => all((i.toLong * (n - 1) / (maxSample - 1)).toInt))
      }
    val n = sorted.size
    // finite-sample floor: even a perfect model shows K-S noise ~1.36/sqrt(n)
    // (95% critical value), so the 0.03 "excellent" gate only binds when the
    // sample is big enough to support it
    val gate = math.max(threshold, 1.36 / math.sqrt(n.toDouble))
    val mean = sorted.sum / n
    val variance = sorted.map(x => (x - mean) * (x - mean)).sum / math.max(1, n - 1)
    val sd = math.sqrt(variance)

    val uniform = Uniform(sorted.head, sorted.last)
    if (ksAgainst(uniform, sorted) < gate) return uniform
    val normal = Normal(mean, sd)
    if (ksAgainst(normal, sorted) < gate) return normal

    // composite: EM Gaussian mixture, growing component count until the CDF
    // deviation validates (<0.10, 06_model_fitting.md:83-86). The fit runs
    // DRIVER-SIDE: the ladder always operates on a bounded per-dimension
    // sample (already collected), and a local EM avoids ~2s of distributed
    // ML job overhead per fit — at scale the distributed part is the
    // SAMPLING, never the 1-d EM itself.
    val idx = sorted.toIndexedSeq
    (2 to maxModes).foreach { kM =>
      val (ws, comps) = emGaussian1d(idx, kM)
      val model = Composite(ws, comps)
      if (ksAgainst(model, sorted) < 0.10) return model
    }

    Empirical((0 to 10).map(i => sorted(math.min(n - 1, i * (n - 1) / 10))))
  }

  /** Deterministic 1-d Gaussian-mixture EM: means seeded at spread sample
    * quantiles, uniform weights, pooled variance; iterate to log-likelihood
    * convergence with a variance floor against point-mass collapse. On
    * well-separated data this converges to the thresholded cluster moments
    * (same fixed point Spark ML's GaussianMixture reaches).
    */
  private[operators] def emGaussian1d(sorted: IndexedSeq[Double], k: Int,
      maxIter: Int = 200, tol: Double = 1e-10): (Seq[Double], Seq[Normal]) = {
    val n = sorted.length
    val mean = sorted.sum / n
    val globalVar = math.max(1e-12, sorted.map(x => (x - mean) * (x - mean)).sum / n)
    val varFloor = math.max(1e-12, globalVar * 1e-9)
    val w = Array.fill(k)(1.0 / k)
    val mu = Array.tabulate(k)(i => sorted(((i + 0.5) / k * (n - 1)).toInt))
    val v = Array.fill(k)(globalVar)
    val resp = Array.ofDim[Double](n, k)
    var prevLl = Double.NegativeInfinity
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      // E-step in log space for numerical safety
      var ll = 0.0
      var i = 0
      while (i < n) {
        val x = sorted(i)
        var maxLog = Double.NegativeInfinity
        var j = 0
        while (j < k) {
          val d = x - mu(j)
          resp(i)(j) = math.log(w(j)) - 0.5 * (math.log(2 * math.Pi * v(j)) + d * d / v(j))
          if (resp(i)(j) > maxLog) maxLog = resp(i)(j)
          j += 1
        }
        var sum = 0.0
        j = 0
        while (j < k) { sum += math.exp(resp(i)(j) - maxLog); j += 1 }
        val logSum = maxLog + math.log(sum)
        ll += logSum
        j = 0
        while (j < k) { resp(i)(j) = math.exp(resp(i)(j) - logSum); j += 1 }
        i += 1
      }
      // M-step
      var j = 0
      while (j < k) {
        var nj = 0.0
        var sj = 0.0
        var i2 = 0
        while (i2 < n) { nj += resp(i2)(j); sj += resp(i2)(j) * sorted(i2); i2 += 1 }
        if (nj < 1e-12) {
          // dead component: re-seed at the sample median, tiny weight
          w(j) = 1e-6; mu(j) = sorted(n / 2); v(j) = globalVar
        } else {
          w(j) = nj / n
          mu(j) = sj / nj
          var vj = 0.0
          i2 = 0
          while (i2 < n) {
            val d = sorted(i2) - mu(j)
            vj += resp(i2)(j) * d * d
            i2 += 1
          }
          v(j) = math.max(varFloor, vj / nj)
        }
        j += 1
      }
      val wSum = w.sum
      j = 0
      while (j < k) { w(j) /= wSum; j += 1 }
      converged = math.abs(ll - prevLl) < tol * math.max(1.0, math.abs(ll))
      prevLl = ll
      iter += 1
    }
    (w.toSeq, (0 until k).map(j => Normal(mu(j), math.sqrt(v(j)))))
  }

  /** A11 model-diff: per-dimension kind match + parameter drift. */
  def modelDiff(a: Map[Int, Model], b: Map[Int, Model]): DataFrame = {
    val rows = (a.keySet ++ b.keySet).toSeq.sorted.map { dim =>
      (a.get(dim), b.get(dim)) match {
        case (Some(ma), Some(mb)) =>
          val drift =
            if (ma.kind != mb.kind) Double.NaN
            else {
              val keys = ma.params.keySet ++ mb.params.keySet
              if (keys.isEmpty) 0.0
              else keys.map(k =>
                math.abs(ma.params.getOrElse(k, 0.0) - mb.params.getOrElse(k, 0.0))).max
            }
          (dim, ma.kind, mb.kind, ma.kind == mb.kind, drift)
        case (ma, mb) =>
          (dim, ma.map(_.kind).getOrElse("missing"), mb.map(_.kind).getOrElse("missing"),
            false, Double.NaN)
      }
    }
    val spark = SparkSession.active
    import spark.implicits._
    rows.toDF("dim", "kind_a", "kind_b", "kind_match", "max_param_drift")
  }
}
