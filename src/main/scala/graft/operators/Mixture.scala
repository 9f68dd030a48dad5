package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-mixture materialization: turn per-domain repeat factors (the
  * "epochs per source" a training mix prescribes — e.g. books 2.25×, web
  * 0.5×) into an explicit (row, epoch) expansion. A factor f emits each row
  * `floor(f)` times always, plus one more epoch with probability
  * `f − floor(f)` decided by the same deterministic md5 draw
  * [[Sampling.hashUnit]] uses — so the mix is bit-reproducible in any
  * engine, stable under re-runs and appends, and independent of
  * partitioning. Extends the reference's sampling surface the same way
  * [[Sampling]] does (SURVEY §2 has draws, not mixture weights).
  *
  * Scale shape: a pure projection + per-row `sequence` explode — zero
  * shuffle; output volume is exactly the mixture size.
  */
object Mixture {

  /** Solve per-domain repeat factors that hit TARGET post-mix shares while
    * preserving total volume: `factor_d = target_d · T / T_d` where `T_d`
    * is domain d's weight (token count) and `T` the corpus total — the
    * static form of mixture-reweighting (set the shares, derive the
    * epochs). Domains absent from `targets` get factor 0 (dropped).
    * Factors are rounded to 6 so any engine replays them. One
    * domain-keyed aggregate (domains are few); the 1-row total broadcasts.
    */
  def solveFactors(df: DataFrame, domainCol: String, weightCol: String,
      targets: Map[String, Double]): DataFrame = {
    require(targets.values.forall(_ >= 0.0), "target shares must be >= 0")
    val t = df.groupBy(domainCol).agg(sum(col(weightCol)).as("tok"))
    val tot = t.agg(sum(col("tok")).as("T"))
    val share = targets.foldLeft(lit(0.0)) { case (acc, (d, s)) =>
      when(col(domainCol) === d, lit(s)).otherwise(acc)
    }
    t.crossJoin(broadcast(tot))
      .select(col(domainCol),
        round(share * col("T") / col("tok"), 6).as("factor"))
  }

  /** Uniform rebalance: every domain ends with ~T/n of the post-mix weight
    * (`factor_d = T / (n_domains · T_d)`) — the "flatten the source
    * skew" mixture a balanced-evaluation corpus uses.
    */
  def balanceFactors(df: DataFrame, domainCol: String,
      weightCol: String): DataFrame = {
    val t = df.groupBy(domainCol).agg(sum(col(weightCol)).as("tok"))
    val tot = t.agg(sum(col("tok")).as("T"), count(lit(1)).as("nd"))
    t.crossJoin(broadcast(tot))
      .select(col(domainCol),
        round(col("T") / (col("nd") * col("tok")), 6).as("factor"))
  }

  /** Temperature-scaled sampling factors: domain d's post-mix share is
    * `T_d^α / Σ_e T_e^α` (the multilingual-LM sampling rule with α = 1/τ —
    * the `(T_d/T)^α` form's totals cancel), and the volume-preserving
    * repeat factor is `share_d · T / T_d`. α = 1 keeps the corpus
    * proportions (every factor 1); α = 0 is exactly [[balanceFactors]];
    * in between it lifts the tail without flattening the head. Same
    * plan shape as the other solvers: one domain-keyed aggregate, a 1-row
    * broadcast total, results rounded to 6 so any engine replays them.
    */
  def temperatureFactors(df: DataFrame, domainCol: String, weightCol: String,
      alpha: Double): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0,
      s"temperature alpha must be in [0, 1], got $alpha")
    val t = df.groupBy(domainCol).agg(sum(col(weightCol)).as("tok"))
    val z = t.agg(sum(pow(col("tok"), alpha)).as("Z"), sum(col("tok")).as("T"))
    t.crossJoin(broadcast(z))
      .select(col(domainCol),
        round(pow(col("tok"), alpha) / col("Z"), 6).as("share"),
        round(pow(col("tok"), alpha) * col("T") / (col("Z") * col("tok")), 6)
          .as("factor"))
  }

  /** Excess-loss domain reweighting (the DoReMi update, Xie et al. 2023,
    * in its static-excess form): starting uniform over the k domains,
    * `steps` multiplicative-weights rounds of
    *
    *   w'(d) ∝ w(d) · exp(η · ε_d),   w ← (1−s)·w' + s/k
    *
    * where ε_d = max(0, L_d − R_d) is domain d's clamped excess loss
    * (L_d = mean of `lossCol`; R_d = mean of `refCol` if given — the
    * reference-model losses — else the global mean of `lossCol`), and
    * `s` is the uniform-smoothing mass that keeps every domain sampled.
    * Domains that already beat the reference (ε = 0) decay toward the
    * smoothing floor; domains with headroom gain mass.
    *
    * Scale shape: ONE domain-keyed aggregate over the corpus; the MW
    * iteration runs on the collected k-row table (bounded by the domain
    * count, like the DSIR LLR tables) in sorted-domain order so the
    * normalization sum is deterministic. Output: (domain, weight) rounded
    * to 6 — any engine replays it by unrolling the steps.
    */
  def doremiFactors(df: DataFrame, domainCol: String, lossCol: String,
      eta: Double, smoothing: Double = 0.1, steps: Int = 3,
      refCol: Option[String] = None): DataFrame = {
    require(eta >= 0.0, s"eta must be >= 0, got $eta")
    require(smoothing >= 0.0 && smoothing <= 1.0,
      s"smoothing must be in [0, 1], got $smoothing")
    require(steps >= 0, s"steps must be >= 0, got $steps")
    val spark = df.sparkSession
    // a row without a domain can't receive mixture mass — dropped
    val in = df.filter(col(domainCol).isNotNull)
    val perDomain = refCol match {
      case Some(r) =>
        in.groupBy(domainCol).agg(avg(col(lossCol)).as("L"), avg(col(r)).as("R"))
      case None =>
        val g = in.agg(avg(col(lossCol)).as("R"))
        in.groupBy(domainCol).agg(avg(col(lossCol)).as("L"))
          .crossJoin(broadcast(g))
    }
    val rows = perDomain
      .select(col(domainCol).cast("string"), greatest(col("L") - col("R"), lit(0.0)))
      .collect().map(r => r.getString(0) -> r.getDouble(1))
      .sortBy(_._1)
    require(rows.nonEmpty, "doremiFactors: no domains")
    val k = rows.length
    val excess = rows.map(_._2)
    var w = Array.fill(k)(1.0 / k)
    var t = 0
    while (t < steps) {
      val un = Array.tabulate(k)(i => w(i) * math.exp(eta * excess(i)))
      val z = un.sum // sorted-domain order: deterministic float sum
      w = Array.tabulate(k)(i => (1.0 - smoothing) * un(i) / z + smoothing / k)
      t += 1
    }
    import spark.implicits._
    rows.map(_._1).zip(w).toSeq.toDF(domainCol, "weight")
      .select(col(domainCol), round(col("weight"), 6).as("weight"))
  }

  /** Emit `(every input column, <epochCol>)` with epoch = 0..nEpochs−1 per
    * row, where nEpochs = floor(f) + (draw < round(frac(f)·1e6) ? 1 : 0)
    * and f is the row's domain factor (absent domains and null domains use
    * `default`). Rows with nEpochs = 0 are dropped. Null keys draw via the
    * [[Sampling.NullKeySentinel]] hash, like every sampling operator here.
    */
  def materialize(df: DataFrame, domainCol: String, keyCol: String,
      factors: Map[String, Double], default: Double = 1.0,
      salt: String = "mix", epochCol: String = "epoch"): DataFrame = {
    require((factors.values ++ Seq(default)).forall(_ >= 0.0),
      "mixture factors must be non-negative")
    require(!df.columns.contains(epochCol),
      s"mixture: input already has a column named $epochCol")
    val u = Sampling.hashUnit(col(keyCol), salt)
    def epochsOf(f: Double) = {
      val whole = math.floor(f).toLong
      val fracQuota = ((f - math.floor(f)) * 1e6).round
      lit(whole) + when(u < fracQuota, 1L).otherwise(0L)
    }
    val n = factors.foldLeft(epochsOf(default)) { case (acc, (d, f)) =>
      when(col(domainCol) === d, epochsOf(f)).otherwise(acc)
    }
    // temp column name chosen to not collide with user columns (the input
    // passes through unprojected, unlike the other curation operators)
    val nCol = "_graft_mix_n"
    require(!df.columns.contains(nCol), s"mixture: input column $nCol is reserved")
    df.withColumn(nCol, n)
      .filter(col(nCol) > 0)
      .withColumn(epochCol, explode(sequence(lit(0L), col(nCol) - 1)))
      .drop(nCol)
  }
}
