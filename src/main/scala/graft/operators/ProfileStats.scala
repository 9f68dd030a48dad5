package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Statistical profiling operators (SURVEY.md A6-A11): per-dimension moments,
  * histograms, exact quantiles, two-sample Kolmogorov-Smirnov. Reference
  * semantics: `analyze profile` / `analyze compare`
  * (/root/reference/docs/user_manual/verification/05_command_reference.md:34-120,
  * 06_model_fitting.md:30-106).
  *
  * Scale posture: everything is keyed by dimension, so windows/aggregations
  * partition by `dim` — per-dim work parallelizes across executors and no
  * global single-partition window ever forms.
  */
object ProfileStats {

  /** Explode a vector column into (dim, value) rows. */
  def explodeDims(df: DataFrame, vecCol: String): DataFrame =
    df.select(posexplode(col(vecCol)).as(Seq("dim", "value")))

  /** Per-dimension mean/stddev(sample)/min/max/count (A6). */
  def perDimStats(df: DataFrame, vecCol: String): DataFrame =
    explodeDims(df, vecCol)
      .groupBy("dim")
      .agg(
        avg(col("value").cast("double")).as("mean"),
        stddev(col("value").cast("double")).as("std"),
        min(col("value").cast("double")).as("min"),
        max(col("value").cast("double")).as("max"),
        count(lit(1)).as("cnt"))

  /** Fixed-width histogram over [lo, hi): bucket index + count (A7).
    * Out-of-range values are clamped into the edge buckets, mirroring the
    * reference's text-histogram edge handling.
    */
  def histogram(df: DataFrame, valueCol: Column, lo: Double, hi: Double, buckets: Int): DataFrame = {
    val w = (hi - lo) / buckets
    val raw = floor((valueCol.cast("double") - lo) / w).cast("long")
    val bucket = greatest(lit(0L), least(lit(buckets - 1L), raw))
    df.select(bucket.as("bucket")).groupBy("bucket").agg(count(lit(1)).as("cnt"))
  }

  /** Exact linear-interpolation quantiles (A7's empirical model table).
    * SMALL-SAMPLE / ORACLE FORM ONLY: the aggregation buffer holds every
    * value — at 100TB that is an executor OOM. The profile path is
    * `quantilesApprox`.
    */
  def quantiles(df: DataFrame, valueCol: Column, ps: Seq[Double]): DataFrame =
    df.agg(percentile(valueCol.cast("double"), typedLit(ps)).as("qs"))
      .select(posexplode(col("qs")).as(Seq("i", "q")))
      .select(element_at(typedLit(ps), col("i").cast("int") + 1).as("p"), col("q"))

  /** Exact quantiles via DISTRIBUTED sort + rank selection — the scale-safe
    * EXACT form (same linear-interpolation semantics as `quantiles` /
    * DuckDB quantile_cont): range-partitioned sort spreads the data across
    * the cluster, then only the O(|ps|) rank-bracketing values come back to
    * the driver. No task ever holds more than its sorted partition; nothing
    * like the single all-values aggregation buffer forms. Cost: one count +
    * one sort (two scans) — use `quantilesApprox` when a bounded rank error
    * is acceptable, this when the answer must be exact at scale.
    */
  def quantilesExactDistributed(df: DataFrame, valueCol: Column,
      ps: Seq[Double]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0), s"bad quantiles: $ps")
    // drop NULLs only — na.drop() would ALSO drop NaN, which `percentile`
    // and DuckDB quantile_cont keep (NaN sorts greater than every double in
    // both Spark's percentile buffer and Scala's TotalOrdering used by
    // sortBy below, so NaN semantics match the buffer form)
    val vals = df.select(valueCol.cast("double").as("v")).filter(col("v").isNotNull)
    val n = vals.count()
    require(n > 0, "quantilesExactDistributed: empty input")
    // quantile_cont rank math: p -> position p*(n-1), interpolate floor/ceil
    val positions = ps.map(p => p * (n - 1))
    val needed = positions.flatMap(x => Seq(x.floor.toLong, x.ceil.toLong)).toSet
    val picked: Map[Long, Double] = vals.rdd.map(_.getDouble(0))
      .sortBy(identity) // range-partitioned distributed sort
      .zipWithIndex()
      .filter { case (_, idx) => needed.contains(idx) }
      .map(_.swap)
      .collect().toMap
    val rows = ps.zip(positions).map { case (p, x) =>
      val (lo, hi) = (picked(x.floor.toLong), picked(x.ceil.toLong))
      (p, lo + (hi - lo) * (x - x.floor))
    }
    rows.toDF("p", "q")
  }

  /** Scale-safe quantiles (A7 production path): GK-sketch
    * `percentile_approx` — the aggregation state is O(accuracy), not O(n),
    * and partials merge map-side. Rank error is bounded by 1/accuracy.
    */
  def quantilesApprox(df: DataFrame, valueCol: Column, ps: Seq[Double],
      accuracy: Int = 10000): DataFrame =
    df.agg(percentile_approx(valueCol.cast("double"), typedLit(ps), lit(accuracy)).as("qs"))
      .select(posexplode(col("qs")).as(Seq("i", "q")))
      .select(element_at(typedLit(ps), col("i").cast("int") + 1).as("p"), col("q"))

  /** Per-dimension approximate quantiles over a vector column — the shape
    * the dataset profile uses (one sketch per dim, merged map-side; no
    * global all-values buffer ever forms).
    */
  def quantilesApproxByDim(df: DataFrame, vecCol: String, ps: Seq[Double],
      accuracy: Int = 10000): DataFrame =
    explodeDims(df, vecCol)
      .groupBy("dim")
      .agg(percentile_approx(col("value").cast("double"), typedLit(ps), lit(accuracy)).as("qs"))

  /** Two-sample K-S statistic D per dimension (A8). Input: (dim, value, tag)
    * with tag ∈ {1, 2}. CDFs are step functions evaluated with ties included
    * (RANGE window frame ≡ CDF at x counts all values <= x).
    */
  def ksStatistic(samples: DataFrame, dimCol: String = "dim",
      valueCol: String = "value", tagCol: String = "tag"): DataFrame = {
    val n1 = Window.partitionBy(dimCol)
    val byValue = Window.partitionBy(dimCol).orderBy(col(valueCol))
    val c1 = sum(when(col(tagCol) === 1, 1L).otherwise(0L)).over(byValue)
    val c2 = sum(when(col(tagCol) === 2, 1L).otherwise(0L)).over(byValue)
    val t1 = sum(when(col(tagCol) === 1, 1L).otherwise(0L)).over(n1)
    val t2 = sum(when(col(tagCol) === 2, 1L).otherwise(0L)).over(n1)
    samples
      .select(col(dimCol), abs(c1 / t1 - c2 / t2).as("gap"))
      .groupBy(dimCol)
      .agg(max("gap").as("d"))
  }

  /** K-S p-value approximation (asymptotic Kolmogorov distribution),
    * Q(λ) = 2 Σ (-1)^{j-1} e^{-2 j² λ²} — the reference gates fits on
    * D/alpha rather than exact p (06_model_fitting.md:30-50).
    */
  def ksPValue(d: Double, na: Long, nb: Long): Double = {
    val ne = na.toDouble * nb / (na + nb)
    val lambda = (math.sqrt(ne) + 0.12 + 0.11 / math.sqrt(ne)) * d
    var sum = 0.0
    var j = 1
    while (j <= 100) {
      sum += 2.0 * math.pow(-1, j - 1) * math.exp(-2.0 * j * j * lambda * lambda)
      j += 1
    }
    math.max(0.0, math.min(1.0, sum))
  }

  /** MAD winsorization — outlier-robust clipping of a score column before
    * it feeds thresholds or mixtures: clip to `median ± c·MAD` where MAD =
    * `median(|x − median|)` (the robust spread measure; mean/stddev clips
    * would let the outliers being removed set their own fence). Appends
    * `outCol` (clipped value, rounded to 6). Two exact-median passes
    * (each the range-partitioned distributed sort of
    * [[quantilesExactDistributed]], one double collected per pass), then
    * a pure projection — the corpus itself never shuffles.
    */
  def madWinsorize(df: DataFrame, valueCol: String, c: Double = 3.0,
      outCol: String = "winsorized"): DataFrame = {
    require(c > 0, s"fence multiplier must be positive, got $c")
    val v = col(valueCol).cast("double")
    val med = quantilesExactDistributed(df, v, Seq(0.5))
      .collect()(0).getDouble(1)
    val mad = quantilesExactDistributed(
      df.select(abs(v - med).as("_ad")), col("_ad"), Seq(0.5))
      .collect()(0).getDouble(1)
    df.withColumn(outCol,
      round(least(greatest(v, lit(med - c * mad)), lit(med + c * mad)), 6))
  }

  /** [[madWinsorize]] with PER-GROUP fences — each group (language,
    * domain, source) clips to its own `median_g ± c·MAD_g`, so a verbose
    * group's spread doesn't set another's fence. Built on
    * [[Ranking.groupedQuantiles]] (window-free grouped medians): two
    * range-shuffle passes — value medians, then absolute-deviation
    * medians — each a tiny broadcast relation joined back; the clip is a
    * pure projection. Medians arrive 6-rounded (groupedQuantiles'
    * contract), which the oracle replays identically.
    */
  def groupedMadWinsorize(df: DataFrame, groupCol: String, valueCol: String,
      c: Double = 3.0, outCol: String = "winsorized"): DataFrame = {
    require(c > 0, s"fence multiplier must be positive, got $c")
    val v = col(valueCol).cast("double")
    val med = Ranking.groupedQuantiles(
        df.select(col(groupCol), v.as("_mv")), groupCol, "_mv", Seq(0.5))
      .select(col(groupCol), col("q").as("_med"))
    val dev = df.join(broadcast(med), groupCol)
      .select(col(groupCol), abs(v - col("_med")).as("_ad"))
    val mad = Ranking.groupedQuantiles(dev, groupCol, "_ad", Seq(0.5))
      .select(col(groupCol), col("q").as("_mad"))
    // LEFT join: a group whose values are all NULL has no fence row, but
    // its rows must survive (same output-cardinality contract as the
    // ungrouped form) — they pass through with a null winsorized value
    df.join(broadcast(med), Seq(groupCol), "left")
      .join(broadcast(mad), Seq(groupCol), "left")
      .withColumn(outCol,
        when(col("_med").isNull || col("_mad").isNull, round(v, 6))
          .otherwise(
            round(least(greatest(v, col("_med") - col("_mad") * c),
              col("_med") + col("_mad") * c), 6)))
      .drop("_med", "_mad")
  }

  /** POPULATION STABILITY INDEX between two versions of a per-group score
    * distribution — the standard release-drift gate next to the K-S test
    * (A8): PSI = Σ_b (p_new − p_old)·ln(p_new/p_old) over `nBuckets`
    * fixed-width buckets on [lo, hi) (out-of-range values clamp to the
    * edge buckets; bucket masses Laplace-smoothed (n+0.5)/(N+0.5k) so
    * empty buckets stay defined). Rule-of-thumb thresholds ride along:
    * psi < 0.1 stable, 0.1–0.25 moderate, > 0.25 shifted.
    *
    * Output: one row per group present in EITHER version — (group, n_old,
    * n_new, psi, verdict). All bucket masses are exact integer counts;
    * the only fp is the per-bucket smoothing/ln tree (engine-replayable).
    *
    * Scale shape: two bucket aggregates (nBuckets × groups rows) + one
    * bounded join; corpus text never moves.
    */
  def psiDrift(oldDf: DataFrame, newDf: DataFrame, groupCol: String,
      valueCol: String, nBuckets: Int, lo: Double, hi: Double): DataFrame = {
    require(nBuckets > 0 && hi > lo,
      s"psiDrift: need nBuckets > 0 and hi > lo, got $nBuckets [$lo, $hi)")
    val w = (hi - lo) / nBuckets
    def buckets(df: DataFrame, cnt: String): DataFrame = df
      .select(col(groupCol).as("g"),
        least(greatest(floor((col(valueCol).cast("double") - lo) / w),
          lit(0L)), lit(nBuckets - 1L)).cast("long").as("b"))
      .groupBy("g", "b").agg(count(lit(1)).as(cnt))
    val o = buckets(oldDf, "n_o")
    val n = buckets(newDf, "n_n")
    val joined = o.join(n, Seq("g", "b"), "full_outer")
      .select(col("g"), coalesce(col("n_o"), lit(0L)).as("n_o"),
        coalesce(col("n_n"), lit(0L)).as("n_n"))
    val tots = joined.groupBy("g")
      .agg(sum("n_o").as("tot_o"), sum("n_n").as("tot_n"))
    joined.join(tots, "g")
      .withColumn("_po",
        (col("n_o").cast("double") + 0.5) /
          (col("tot_o").cast("double") + 0.5 * nBuckets))
      .withColumn("_pn",
        (col("n_n").cast("double") + 0.5) /
          (col("tot_n").cast("double") + 0.5 * nBuckets))
      .groupBy("g")
      .agg(max("tot_o").as("n_old"), max("tot_n").as("n_new"),
        round(sum((col("_pn") - col("_po")) * log(col("_pn") / col("_po"))),
          6).as("psi"))
      .withColumn("verdict",
        when(col("psi") < 0.1, "stable")
          .when(col("psi") <= 0.25, "moderate")
          .otherwise("shifted"))
  }
}
