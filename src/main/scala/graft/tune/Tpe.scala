package graft.tune

/** Tree-structured Parzen estimator over CATEGORICAL parameter spaces —
  * the bench-tuning optimizer (Bergstra et al. 2011; Optuna's
  * categorical-TPE defaults, Akiba et al. 2019 — public literature).
  * Re-expresses the contract of the reference's benchmark optimizer
  * (/root/reference/datatools-benchutils/.../optimizers/TpeSampler.java:
  * 28-60 semantics, 103-140 gamma/weights, 280-340 kernel construction)
  * in independent Scala: SURVEY §4 classifies this module as
  * out-of-engine tooling, so it lives under `graft.tune`, driving
  * Bench/ScaleSoak experiments rather than query plans.
  *
  * Contract (scores are MAXIMIZED):
  *  - adaptive gamma γ(n) = min(⌈0.1·n⌉, 25) picks the "good" group;
  *  - recency weights: uniform below 25 trials, then a linear ramp from
  *    1/n to 1 over the oldest n−25, full weight for the newest 25;
  *  - per parameter, each observation is a peaked categorical kernel
  *    (uniform prior_weight/nKernels fill, +1 on the observed value,
  *    row-normalized) plus one uniform prior kernel; mixture weights =
  *    normalized (trialWeights :+ priorWeight);
  *  - a suggestion draws `nCandidates` samples from the good-group
  *    mixture l(x) and keeps the non-duplicate maximizing
  *    Σ_p log l_p(x) − log g_p(x); all-duplicates falls back to random;
  *  - the first `nStartup` suggestions are random; a fully-explored
  *    space yields None.
  */
final class TpeSampler(
    space: Seq[(String, Vector[String])],
    seed: Long = 42L,
    gamma: Int => Int = TpeSampler.defaultGamma,
    weights: Int => Array[Double] = TpeSampler.defaultWeights,
    priorWeight: Double = 1.0,
    nStartup: Int = 10,
    nCandidates: Int = 24) {

  require(space.nonEmpty, "TpeSampler: empty parameter space")
  require(space.forall(_._2.nonEmpty), "TpeSampler: a parameter has no values")
  require(priorWeight > 0, s"TpeSampler: priorWeight must be positive: $priorWeight")

  final case class Trial(params: Map[String, String], score: Double)

  private val rng = new scala.util.Random(seed)
  private val history = scala.collection.mutable.ArrayBuffer.empty[Trial]

  def addTrial(params: Map[String, String], score: Double): Unit =
    history += Trial(params, score)

  def trialCount: Int = history.size

  def spaceSize: Long = space.map(_._2.size.toLong).product

  def bestTrial: Option[Trial] =
    if (history.isEmpty) None else Some(history.maxBy(_.score))

  def trialsSorted: Seq[Trial] = history.sortBy(-_.score).toSeq

  /** Next configuration to evaluate, or None once the space is explored. */
  def suggest(): Option[Map[String, String]] = {
    var attempt = 0
    while (attempt < 100) {
      val cand =
        if (history.size < nStartup) randomSample()
        else tpeSample()
      if (!isDuplicate(cand)) return Some(cand)
      attempt += 1
    }
    None
  }

  private def isDuplicate(c: Map[String, String]): Boolean =
    history.exists(_.params == c)

  private def randomSample(): Map[String, String] =
    space.map { case (name, values) =>
      name -> values(rng.nextInt(values.size))
    }.toMap

  private def tpeSample(): Map[String, String] = {
    if (history.isEmpty) return randomSample()
    // Membership in the good/rest groups is decided by SCORE, but within
    // each group trials stay in INSERTION order so the recency ramp in
    // `weights` applies chronologically (oldest ramps up, newest full) —
    // not to the score ranking.
    val sorted = history.zipWithIndex.sortBy { case (t, _) => -t.score }
    val n = sorted.size
    val nBelow = math.max(1, math.min(gamma(n), n - 1))
    val below = sorted.take(nBelow).sortBy(_._2).map(_._1)
    val above = sorted.drop(nBelow).sortBy(_._2).map(_._1)
    val belowMix = mixtureWeights(weights(below.size))
    val aboveMix = mixtureWeights(weights(above.size))
    val perParam = space.map { case (name, values) =>
      (name, values,
        kernels(below.toSeq, name, values), kernels(above.toSeq, name, values))
    }
    var best: Map[String, String] = null
    var bestRatio = Double.NegativeInfinity
    for (_ <- 0 until nCandidates) {
      var ratio = 0.0
      val cand = perParam.map { case (name, values, kBelow, kAbove) =>
        val idx = sampleMixture(kBelow, belowMix)
        ratio += logPdf(kBelow, belowMix, idx) - logPdf(kAbove, aboveMix, idx)
        name -> values(idx)
      }.toMap
      if (!isDuplicate(cand) && ratio > bestRatio) {
        bestRatio = ratio
        best = cand
      }
    }
    if (best != null) best else randomSample()
  }

  /** Kernel matrix for one categorical parameter: one row per trial plus
    * one uniform prior row; fill prior_weight/nKernels everywhere, +1 on
    * each trial's observed value, rows normalized.
    */
  private def kernels(trials: Seq[Trial], name: String,
      values: Vector[String]): Array[Array[Double]] = {
    val nK = trials.size + 1
    val fill = priorWeight / nK
    val m = Array.fill(nK, values.size)(fill)
    trials.zipWithIndex.foreach { case (t, i) =>
      val idx = values.indexOf(t.params.getOrElse(name, ""))
      if (idx >= 0) m(i)(idx) += 1.0
    }
    m.map { row =>
      val s = row.sum
      if (s > 0) row.map(_ / s) else row
    }
  }

  private def mixtureWeights(trialWeights: Array[Double]): Array[Double] = {
    val mix = trialWeights :+ priorWeight
    val s = mix.sum
    mix.map(_ / s)
  }

  private def sampleMixture(k: Array[Array[Double]], mix: Array[Double]): Int =
    sampleCategorical(k(sampleCategorical(mix)))

  private def logPdf(k: Array[Array[Double]], mix: Array[Double], idx: Int): Double = {
    var p = 0.0
    var i = 0
    while (i < k.length) { p += mix(i) * k(i)(idx); i += 1 }
    math.log(math.max(p, 1e-300))
  }

  private def sampleCategorical(probs: Array[Double]): Int = {
    val r = rng.nextDouble()
    var cum = 0.0
    var i = 0
    while (i < probs.length) {
      cum += probs(i)
      if (r <= cum) return i
      i += 1
    }
    probs.length - 1
  }
}

object TpeSampler {

  /** γ(n) = min(⌈0.1·n⌉, 25). */
  def defaultGamma(n: Int): Int = math.min(math.ceil(0.1 * n).toInt, 25)

  /** Uniform for n < 25; else the oldest n−25 ramp linearly from 1/n to
    * 1 and the newest 25 get full weight.
    */
  def defaultWeights(n: Int): Array[Double] = {
    if (n == 0) Array.empty
    else if (n < 25) Array.fill(n)(1.0)
    else {
      val ramp = n - 25
      val start = 1.0 / n
      val w = new Array[Double](n)
      if (ramp == 1) w(0) = start
      else {
        val step = (1.0 - start) / (ramp - 1)
        for (i <- 0 until ramp) w(i) = start + i * step
      }
      for (i <- ramp until n) w(i) = 1.0
      w
    }
  }

  /** Run a full optimization loop against an objective, up to `maxTrials`
    * or space exhaustion. Returns the sampler with its trial history.
    */
  def optimize(space: Seq[(String, Vector[String])],
      objective: Map[String, String] => Double, maxTrials: Int,
      seed: Long = 42L): TpeSampler = {
    val s = new TpeSampler(space, seed)
    var t = 0
    var continue = true
    while (t < maxTrials && continue) {
      s.suggest() match {
        case Some(params) => s.addTrial(params, objective(params)); t += 1
        case None => continue = false
      }
    }
    s
  }
}
