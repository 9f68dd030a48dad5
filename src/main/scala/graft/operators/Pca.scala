package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-space second-order statistics and PCA — the dimensionality
  * reduction / whitening stage ahead of ANN indexing (PCA-then-IVF is the
  * standard recipe for high-dim corpora) and the feature-scaling stage
  * ahead of clustering.
  *
  * Scale shape: the d×d covariance accumulates in ONE `treeAggregate` over
  * the vectors — per-task state is the d×d sum-of-outer-products plus the
  * d-vector of sums (for d=256 that is 0.5 MB of doubles), and only that
  * state crosses the wire per partition; the corpus never shuffles. The
  * eigensolve then runs on the DRIVER over the d×d matrix (cyclic Jacobi —
  * deterministic, no library randomness), which is exact and cheap for the
  * d ≤ a few thousand any embedding column has. Projection is a map-side
  * matmul against the broadcast component matrix — zero shuffle again.
  *
  * Sign convention: each eigenvector is flipped so its
  * largest-absolute-value entry is positive (ties to the lowest index).
  * Reproducibility across partitionings: the treeAggregate's double
  * summation order is partition-dependent, so the raw covariance carries
  * ULP noise; the eigensolve (and the projection) therefore runs on the
  * covariance ROUNDED to 6 decimals — the same quantization
  * `covariance()`/`standardize()` emit — pinning one matrix (hence one
  * deterministic Jacobi result) for every partitioning of the same data.
  */
object Pca {

  /** Mean vector and population covariance accumulated in one pass.
    * Returns (mean, cov) as driver-side arrays (cov row-major d×d).
    */
  private def momentsOf(df: DataFrame, vecCol: String): (Array[Double], Array[Double], Long) = {
    val spark = df.sparkSession
    import spark.implicits._
    val vecs = df.select(col(vecCol).cast("array<float>")).as[Array[Float]].rdd
    val d = vecs.first().length
    val (sums, prods, n) = vecs.treeAggregate(
      (new Array[Double](d), new Array[Double](d * d), 0L))(
      seqOp = { case ((s, p, c), v) =>
        var i = 0
        while (i < d) {
          val xi = v(i).toDouble
          s(i) += xi
          var j = 0
          val row = i * d
          while (j < d) { p(row + j) += xi * v(j); j += 1 }
          i += 1
        }
        (s, p, c + 1)
      },
      combOp = { case ((s1, p1, c1), (s2, p2, c2)) =>
        var i = 0
        while (i < d) { s1(i) += s2(i); i += 1 }
        i = 0
        while (i < d * d) { p1(i) += p2(i); i += 1 }
        (s1, p1, c1 + c2)
      })
    require(n > 0, "covariance of an empty relation")
    val mean = sums.map(_ / n)
    val cov = new Array[Double](d * d)
    var i = 0
    while (i < d) {
      var j = 0
      while (j < d) { cov(i * d + j) = prods(i * d + j) / n - mean(i) * mean(j); j += 1 }
      i += 1
    }
    (mean, cov, n)
  }

  /** Covariance quantized to 6 decimals — the partitioning-independent
    * matrix the eigensolve runs on (see the reproducibility note above).
    */
  private def rounded6(a: Array[Double]): Array[Double] =
    a.map(x => math.rint(x * 1e6) / 1e6)

  /** Population covariance matrix as (i, j, cov) rows, rounded to 6 —
    * engine-replayable (`covar_pop` in any SQL dialect).
    */
  def covariance(df: DataFrame, vecCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val (_, cov, _) = momentsOf(df, vecCol)
    val d = math.sqrt(cov.length.toDouble).toInt
    val rows = for (i <- 0 until d; j <- 0 until d)
      yield (i.toLong, j.toLong, math.rint(cov(i * d + j) * 1e6) / 1e6)
    rows.toDF("i", "j", "cov")
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric row-major d×d matrix.
    * Returns (eigenvalues desc, eigenvectors as rows, matching order).
    */
  private[operators] def jacobi(a0: Array[Double], d: Int,
      sweeps: Int = 64, tol: Double = 1e-12): (Array[Double], Array[Array[Double]]) = {
    val a = a0.clone()
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    def off(): Double = {
      var s = 0.0
      var i = 0
      while (i < d) { var j = i + 1; while (j < d) { s += 2 * a(i * d + j) * a(i * d + j); j += 1 }; i += 1 }
      s
    }
    var sweep = 0
    while (sweep < sweeps && off() > tol) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p * d + q)
          if (math.abs(apq) > 1e-300) {
            val app = a(p * d + p); val aqq = a(q * d + q)
            val theta = (aqq - app) / (2 * apq)
            val t = math.signum(theta) match {
              case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1))
              case s_ => s_ / (math.abs(theta) + math.sqrt(theta * theta + 1))
            }
            val c = 1.0 / math.sqrt(t * t + 1)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = a(k * d + p); val akq = a(k * d + q)
              a(k * d + p) = c * akp - s * akq
              a(k * d + q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p * d + k); val aqk = a(q * d + k)
              a(p * d + k) = c * apk - s * aqk
              a(q * d + k) = s * apk + c * aqk
              k += 1
            }
            k = 0
            while (k < d) {
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    // columns of v are eigenvectors; order by eigenvalue desc, fix signs
    val order = (0 until d).sortBy(i => -a(i * d + i))
    val vals = order.map(i => a(i * d + i)).toArray
    val vecs = order.map { ci =>
      val e = Array.tabulate(d)(r => v(r)(ci))
      val m = e.indices.maxBy(i => (math.abs(e(i)), -i))
      if (e(m) < 0) e.map(-_) else e
    }.toArray
    (vals, vecs)
  }

  /** Top-k principal components of the embedding column: one covariance
    * pass + driver Jacobi. Returns (component, idx, weight, eigenvalue).
    */
  def principalComponents(df: DataFrame, vecCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val (_, cov, _) = momentsOf(df, vecCol)
    val d = math.sqrt(cov.length.toDouble).toInt
    require(k > 0 && k <= d, s"k must be in [1, $d], got $k")
    val (vals, vecs) = jacobi(rounded6(cov), d)
    val rows = for (c <- 0 until k; i <- 0 until d)
      yield (c.toLong, i.toLong, vecs(c)(i), vals(c))
    rows.toDF("component", "idx", "weight", "eigenvalue")
  }

  /** Project every vector onto the top-k mean-centered principal axes —
    * map-side matmul against the broadcast (k×d) component matrix.
    * Output: (id, proj array<double> length k).
    */
  def project(df: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val (mean, cov, _) = momentsOf(df, vecCol)
    val d = mean.length
    require(k > 0 && k <= d, s"k must be in [1, $d], got $k")
    val (_, vecs) = jacobi(rounded6(cov), d)
    val comps = vecs.take(k)
    val bcM = spark.sparkContext.broadcast(rounded6(mean))
    val bcC = spark.sparkContext.broadcast(comps)
    df.select(col(idCol).cast("long"), col(vecCol).cast("array<float>"))
      .as[(Long, Array[Float])]
      .map { case (id, x) =>
        val m = bcM.value; val cs = bcC.value
        val out = new Array[Double](cs.length)
        var c = 0
        while (c < cs.length) {
          var s = 0.0; var i = 0
          val e = cs(c)
          while (i < e.length) { s += (x(i) - m(i)) * e(i); i += 1 }
          out(c) = s; c += 1
        }
        (id, out)
      }
      .toDF(idCol, "proj")
  }

  /** Johnson–Lindenstrauss random projection to `k` dimensions against a
    * deterministic ±1/√k sign matrix (Achlioptas 2003's database-friendly
    * form), signs derived from the engine-neutral md5-60 hash of
    * `salt:outDim:inDim` — no RNG state, so the projection reproduces in
    * any engine, across partitionings and appends. The k×d matrix builds
    * on the driver (k·d doubles) and broadcasts; the pass is a map-side
    * matmul, zero shuffle. Output exploded as (id, idx, proj rounded 6),
    * the dimensionality-reduction front end for LSH / clustering when d
    * is too wide to bucket directly.
    */
  def randomProject(df: DataFrame, idCol: String, vecCol: String, k: Int,
      salt: String = "rp"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(k > 0, s"k must be positive, got $k")
    val d = df.select(size(col(vecCol)).as("d")).head().getInt(0)
    val scale = 1.0 / math.sqrt(k.toDouble)
    val m = Array.tabulate(k, d) { (i, j) =>
      (if (graft.functions.StableHash.md5Hash60(s"$salt:$i:$j") % 2 == 0) scale
       else -scale)
    }
    val bc = spark.sparkContext.broadcast(m)
    df.select(col(idCol).cast("long"), col(vecCol).cast("array<float>"))
      .as[(Long, Array[Float])]
      .flatMap { case (id, x) =>
        val cs = bc.value
        Iterator.tabulate(cs.length) { i =>
          val row = cs(i)
          var s = 0.0; var j = 0
          while (j < x.length) { s += x(j) * row(j); j += 1 }
          (id, i.toLong, s)
        }
      }
      .toDF(idCol, "idx", "p")
      .select(col(idCol), col("idx"), round(col("p"), 6).as("proj"))
  }

  /** Per-dimension z-score standardization (sample stddev), exploded as
    * (id, idx, z) rounded to 6 — feature scaling ahead of clustering /
    * LSH. Stats collect to the driver (2d doubles); the transform is a
    * map-side projection. Zero-variance dims yield null (as SQL division
    * by zero does).
    */
  def standardize(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val (mean, cov, n) = momentsOf(df, vecCol)
    require(n > 1, "standardize needs at least 2 rows for sample stddev")
    val d = mean.length
    // sample variance from population covariance diagonal: var_s = var_p * n/(n-1)
    val std = Array.tabulate(d)(i => math.sqrt(cov(i * d + i) * n / (n - 1.0)))
    val mLit = array(mean.map(lit): _*)
    val sLit = array(std.map(lit): _*)
    df.select(col(idCol), posexplode(col(vecCol)).as(Seq("idx", "x")))
      .select(col(idCol), col("idx").cast("long").as("idx"),
        round((col("x").cast("double") - element_at(mLit, col("idx").cast("int") + 1)) /
          when(element_at(sLit, col("idx").cast("int") + 1) === 0.0, lit(null))
            .otherwise(element_at(sLit, col("idx").cast("int") + 1)), 6).as("z"))
  }
}
