package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Deterministic synthetic data generation (SURVEY.md F11/F12; reference
  * datagen/TestDataFiles.java:57-100 and `generate from-model`).
  *
  * The contract that shapes everything here: values must be a pure function
  * of (ordinal, dim, seed) — dataset_yaml_v1.md:143-145 requires determinism
  * by index — so no task-order-dependent RNG. Two generators:
  *
  *  - `lehmerGaussian`: engine-neutral arithmetic (Lehmer MCG + Box-Muller)
  *    expressible identically in ANSI SQL, used by the oracled query.
  *  - `gaussianVectors`: xxhash64-seeded per-(ordinal,dim) gaussians with the
  *    reference's zero/duplicate injection knobs — the production generator
  *    (80k+ vectors/sec/core target, BASELINE.md).
  */
object Generators {

  private val M = 2147483647L // 2^31 - 1
  private val A = 48271L      // Lehmer / MINSTD multiplier

  /** Column pipeline: deterministic standard gaussian from a long id Column.
    * z = sqrt(-2 ln u1) cos(2π u2) with u1,u2 from two Lehmer steps.
    */
  def lehmerGaussian(id: Column): Column = {
    val x1 = ((id + 1) * A) % M
    val x2 = (x1 * A) % M
    // x1 can be 0 when (id+1) is a multiple of M (first at id = 2^31-2):
    // clamp u1 away from log(0) — mirrored in the SQL form for parity
    val u1 = greatest(x1.cast("double") / M, lit(1.0e-12))
    val u2 = x2.cast("double") / M
    sqrt(lit(-2.0) * log(u1)) * cos(lit(2.0 * math.Pi) * u2)
  }

  /** The same recurrence as ANSI SQL, for oracle generation. */
  def lehmerGaussianSql(idExpr: String): String =
    s"sqrt(-2.0 * ln(greatest((((($idExpr + 1) * $A) % $M)::DOUBLE) / $M, 1.0e-12))) * " +
      s"cos(2.0 * pi() * ((((((($idExpr + 1) * $A) % $M) * $A) % $M)::DOUBLE) / $M))"

  /** Engine-neutral deterministic uniform in [0,1) from a long id Column —
    * one Lehmer step; same arithmetic as `lehmerUniformSql`.
    */
  def lehmerUniform(id: Column): Column =
    (((id + 1) * A) % M).cast("double") / M

  def lehmerUniformSql(idExpr: String): String =
    s"((((($idExpr + 1) * $A) % $M)::DOUBLE) / $M)"

  /** Uniform double in [0,1) from (ordinal, dim, seed) via xxhash64 — cheap,
    * stateless, deterministic under any partitioning.
    */
  private def hashUniform(ordinal: Column, dim: Column, seed: Long, stream: Int): Column =
    (pmod(xxhash64(ordinal, dim, lit(seed), lit(stream)), lit(1L << 52)).cast("double")
      / (1L << 52).toDouble)

  /** Deterministic gaussian vectors with zero/duplicate injection, mirroring
    * genVectors(count, dim, seed, variability, scale, zeroes, dups)
    * (TestDataFiles.java:57-100): component = N(0,1)·variability + ordinal·scale;
    * a deterministic fraction of ordinals become all-zero vectors or copies
    * of the previous ordinal's vector.
    */
  /** splitmix64 of the packed stream coordinates — the per-(ordinal,dim)
    * deterministic randomness source for the kernel path.
    */
  @inline private def mix(ordinal: Long, dim: Long, seed: Long, stream: Long): Long =
    graft.functions.StableHash.mix(
      graft.functions.StableHash.mix(ordinal * 0x9e3779b97f4a7c15L ^ seed) ^
        (dim * 0xc2b2ae3d27d4eb4fL + stream))

  @inline private def uniform01(h: Long): Double = (h >>> 12).toDouble / (1L << 52).toDouble

  def gaussianVectors(
      spark: SparkSession,
      count: Long,
      dim: Int,
      seed: Long = 42L,
      variability: Double = 1.0,
      scale: Double = 0.0,
      zeroesProportion: Double = 0.0,
      duplicatesProportion: Double = 0.0): DataFrame = {

    import spark.implicits._
    // typed kernel, not Column transforms: 10M+ gaussians/sec/core in a JVM
    // loop vs ~2M component-exprs/sec interpreted through higher-order
    // functions — and still a pure function of (ordinal, dim, seed)
    spark.range(0, count).as[Long].map { ordinal =>
      val zero = uniform01(mix(ordinal, -1L, seed, 3)) < zeroesProportion
      val dup = uniform01(mix(ordinal, -2L, seed, 4)) < duplicatesProportion
      val srcOrdinal = if (!zero && dup && ordinal > 0) ordinal - 1 else ordinal
      val arr =
        if (zero) new Array[Float](dim)
        else Array.tabulate(dim) { d =>
          val u1 = math.max(uniform01(mix(srcOrdinal, d.toLong, seed, 1)), 1.0 / (1L << 52))
          val u2 = uniform01(mix(srcOrdinal, d.toLong, seed, 2))
          val z = math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2)
          (z * variability + srcOrdinal.toDouble * scale).toFloat
        }
      (ordinal, arr)
    }.toDF("ordinal", "vector")
  }

  /** F12 `generate from-model`: sample each dimension from its fitted model
    * via inverse-CDF of hash uniforms (models broadcast, never collected).
    */
  def fromModel(
      spark: SparkSession,
      count: Long,
      models: Seq[DistributionFit.Model],
      seed: Long = 42L,
      uniformSource: Option[(Column, Column) => Column] = None): DataFrame = {
    val bc = spark.sparkContext.broadcast(models.toIndexedSeq)
    val inverseCdf = udf { (dim: Int, u: Double) =>
      bc.value(dim) match {
        case DistributionFit.Uniform(a, b) =>
          // analytic inverse — exact (and SQL-replayable for oracles)
          (a + u * (b - a)).toFloat
        case m =>
          // bisection on the model CDF — exact enough for synthesis (1e-9)
          var lo = -1e9; var hi = 1e9
          (0 until 60).foreach { _ =>
            val mid = (lo + hi) / 2
            if (DistributionFit.cdf(m, mid) < u) lo = mid else hi = mid
          }
          ((lo + hi) / 2).toFloat
      }
    }
    // default randomness = xxhash64 stream; an engine-neutral source (e.g.
    // lehmerUniform over ordinal*dims+dim) lets a SQL oracle replay the draw
    val uni = uniformSource.getOrElse(
      (ordinal: Column, d: Column) => hashUniform(ordinal, d, seed, 5))
    val base = spark.range(0, count).toDF("ordinal")
    base.select(
      col("ordinal"),
      transform(sequence(lit(0), lit(models.size - 1)),
        d => inverseCdf(d, uni(col("ordinal"), d))).as("vector"))
  }
}
