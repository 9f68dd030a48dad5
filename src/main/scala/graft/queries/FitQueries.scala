package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{DistributionFit, Generators}

/** Driver-oracle coverage for the model-fitting family (A9/A10/A11) and the
  * model-based generator (F12). All sample data is Lehmer-generated — a pure
  * function of the row id with an identical ANSI-SQL form — so the oracles
  * replay the exact draw and recompute the fitted parameters from first
  * principles (method-of-moments == the fitter's estimators).
  */
object FitQueries {

  private def gauss(idExpr: String): String = Generators.lehmerGaussianSql(idExpr)

  /** Collected Lehmer-gaussian sample `z(id)*scale + shift` for id in
    * [lo, hi) — driver-side (the fit ladder consumes a sample, per the
    * reference's analyze flow; production callers sample first).
    */
  private def sample(s: org.apache.spark.sql.SparkSession, lo: Long, hi: Long,
      scale: Double, shift: Double): Seq[Double] =
    s.range(lo, hi)
      .select((Generators.lehmerGaussian(col("id") * 99991) * scale + shift).as("x"))
      .collect().map(_.getDouble(0)).toSeq

  val all: Seq[GQuery] = Seq(

    // A9 parametric ladder: gaussian sample → uniform rejected by K-S,
    // normal accepted; parameters = sample mean / n-1 stddev, which the
    // oracle recomputes over the identical SQL draw.
    GQuery(
      "q64_distribution_fit",
      s"""WITH s AS (SELECT ${gauss("i*99991")} * 2.0 + 7.0 AS x FROM range(2000) t(i))
         |SELECT 'normal' AS kind, round(avg(x), 6) AS mean,
         |       round(stddev_samp(x), 6) AS std_dev
         |FROM s""".stripMargin) { (s, _) =>
      import s.implicits._
      val m = DistributionFit.fit(s, sample(s, 0, 2000, 2.0, 7.0))
      Seq((m.kind,
        math.rint(m.params("mean") * 1e6) / 1e6,
        math.rint(m.params("std_dev") * 1e6) / 1e6))
        .toDF("kind", "mean", "std_dev")
    },

    // A11 model-diff: two normal fits on different Lehmer streams — kind
    // match + max parameter drift, recomputed by the oracle from both draws.
    GQuery(
      "q65_model_diff",
      s"""WITH a AS (SELECT ${gauss("i*99991")} * 2.0 + 7.0 AS x FROM range(2000) t(i)),
         |b AS (SELECT ${gauss("i*99991")} * 2.5 + 7.1 AS x FROM range(2000, 4000) t(i))
         |SELECT 0 AS dim, 'normal' AS kind_a, 'normal' AS kind_b,
         |       true AS kind_match,
         |       round(greatest(abs((SELECT avg(x) FROM a) - (SELECT avg(x) FROM b)),
         |                      abs((SELECT stddev_samp(x) FROM a)
         |                        - (SELECT stddev_samp(x) FROM b))), 6) AS max_param_drift
         |""".stripMargin) { (s, _) =>
      val ma = DistributionFit.fit(s, sample(s, 0, 2000, 2.0, 7.0))
      val mb = DistributionFit.fit(s, sample(s, 2000, 4000, 2.5, 7.1))
      DistributionFit.modelDiff(Map(0 -> ma), Map(0 -> mb))
        .select(col("dim"), col("kind_a"), col("kind_b"), col("kind_match"),
          round(col("max_param_drift"), 6).as("max_param_drift"))
    },

    // A10 composite fit: well-separated bimodal sample → 2-component EM
    // mixture; at 100σ separation the EM responsibilities are 0/1, so
    // component means/weights equal the per-cluster moments the oracle
    // computes by thresholding.
    GQuery(
      "q83_composite_fit",
      s"""WITH s AS (SELECT ${gauss("i*99991")} * 0.1 + (i % 2) * 10.0 AS x FROM range(2000) t(i))
         |SELECT 'composite' AS kind, 2 AS n_components, 0.5 AS w0,
         |       round((SELECT avg(x) FROM s WHERE x < 5), 2) AS mean0,
         |       round((SELECT avg(x) FROM s WHERE x >= 5), 2) AS mean1""".stripMargin) { (s, _) =>
      import s.implicits._
      val bimodal = s.range(0, 2000)
        .select((Generators.lehmerGaussian(col("id") * 99991) * 0.1
          + (col("id") % 2).cast("double") * 10.0).as("x"))
        .collect().map(_.getDouble(0)).toSeq
      DistributionFit.fit(s, bimodal) match {
        case DistributionFit.Composite(ws, comps) =>
          val sorted = ws.zip(comps).sortBy(_._2.mean)
          Seq(("composite", sorted.size.toLong,
            math.rint(sorted.head._1 * 1e3) / 1e3,
            math.rint(sorted.head._2.mean * 100) / 100,
            math.rint(sorted.last._2.mean * 100) / 100))
            .toDF("kind", "n_components", "w0", "mean0", "mean1")
        case other =>
          Seq((other.kind, -1L, -1.0, -1.0, -1.0))
            .toDF("kind", "n_components", "w0", "mean0", "mean1")
      }
    },

    // F12 generate from-model: inverse-CDF sampling of fitted uniforms with
    // an engine-neutral (Lehmer) randomness source — the oracle replays the
    // identical draw and the analytic inverse, down to the float cast.
    GQuery(
      "q66_generate_from_model",
      s"""SELECT i AS ordinal,
         |       (2.0 + ${Generators.lehmerUniformSql("(i*2)*99991")} * 3.0)::FLOAT AS v0,
         |       (-1.0 + ${Generators.lehmerUniformSql("(i*2+1)*99991")} * 2.0)::FLOAT AS v1
         |FROM range(200) t(i)""".stripMargin) { (s, _) =>
      Generators.fromModel(s, 200,
          Seq(DistributionFit.Uniform(2.0, 5.0), DistributionFit.Uniform(-1.0, 1.0)),
          uniformSource = Some((ordinal, d) =>
            Generators.lehmerUniform((ordinal * 2 + d) * 99991)))
        .select(col("ordinal"),
          element_at(col("vector"), 1).as("v0"),
          element_at(col("vector"), 2).as("v1"))
    },
  )
}
