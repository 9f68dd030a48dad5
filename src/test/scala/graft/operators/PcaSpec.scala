package graft.operators

import graft.SparkSpec

/** PCA invariants: the one-pass covariance equals a sequential reference,
  * Jacobi recovers a planted spectrum, the top component aligns with a
  * planted anisotropic direction, projection preserves what a rotation
  * must preserve (norms at k=d, per-component variance = eigenvalue,
  * cross-component covariance 0), and everything is partition-stable.
  */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(13)
  private val d = 6
  // anisotropic cloud: heavy variance along a planted unit direction u
  private val u: Array[Double] = {
    val raw = Array.fill(d)(rnd.nextGaussian())
    val n = math.sqrt(raw.map(x => x * x).sum)
    raw.map(_ / n)
  }
  private val pts: Seq[(Long, Array[Float])] = (0L until 400L).map { i =>
    val t = rnd.nextGaussian() * 5.0
    (i, Array.tabulate(d)(j => (t * u(j) + rnd.nextGaussian() * 0.3).toFloat))
  }
  private def df = pts.toDF("vec_id", "embedding").repartition(7)

  test("covariance equals the sequential definition") {
    val n = pts.size
    val mean = Array.tabulate(d)(j => pts.map(_._2(j).toDouble).sum / n)
    def cov(i: Int, j: Int): Double =
      pts.map(p => (p._2(i) - mean(i)) * (p._2(j) - mean(j))).sum / n
    val got = Pca.covariance(df, "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.size == d * d)
    for (i <- 0 until d; j <- 0 until d)
      assert(math.abs(got((i.toLong, j.toLong)) - cov(i, j)) < 2e-6, s"($i,$j)")
  }

  test("jacobi recovers a planted diagonal spectrum under rotation") {
    // A = R diag(9,4,1) R^T for a fixed Givens-product rotation R
    val dd = 3
    val diag = Array(9.0, 4.0, 1.0)
    val angles = Seq((0, 1, 0.7), (1, 2, -0.4), (0, 2, 1.1))
    var r = Array.tabulate(dd, dd)((i, j) => if (i == j) 1.0 else 0.0)
    angles.foreach { case (p, q, th) =>
      val g = Array.tabulate(dd, dd)((i, j) => if (i == j) 1.0 else 0.0)
      g(p)(p) = math.cos(th); g(q)(q) = math.cos(th)
      g(p)(q) = -math.sin(th); g(q)(p) = math.sin(th)
      r = Array.tabulate(dd, dd)((i, j) => (0 until dd).map(k => g(i)(k) * r(k)(j)).sum)
    }
    val a = Array.tabulate(dd, dd)((i, j) =>
      (0 until dd).map(k => r(i)(k) * diag(k) * r(j)(k)).sum)
    val flat = Array.tabulate(dd * dd)(x => a(x / dd)(x % dd))
    val (vals, vecs) = Pca.jacobi(flat, dd)
    assert(vals.zip(diag).forall { case (g, w) => math.abs(g - w) < 1e-9 })
    // eigenvectors: A v = lambda v
    vals.zip(vecs).foreach { case (l, v) =>
      val av = Array.tabulate(dd)(i => (0 until dd).map(j => a(i)(j) * v(j)).sum)
      assert(av.zip(v).forall { case (x, y) => math.abs(x - l * y) < 1e-8 })
    }
  }

  test("top principal component aligns with the planted direction") {
    val top = Pca.principalComponents(df, "embedding", k = 1)
      .orderBy("idx").collect().map(_.getDouble(2))
    val cos = top.zip(u).map { case (a, b) => a * b }.sum
    assert(math.abs(cos) > 0.99, s"cos=$cos")
  }

  test("projection: variance per component = eigenvalue; components uncorrelated; k=d preserves norms") {
    val k = 3
    val eig = Pca.principalComponents(df, "embedding", k)
      .select("component", "eigenvalue").distinct()
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val proj = Pca.project(df, "vec_id", "embedding", k)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val n = proj.size
    for (c <- 0 until k) {
      val xs = proj.values.map(_(c)).toSeq
      val mu = xs.sum / n
      assert(math.abs(mu) < 1e-6) // centered
      val v = xs.map(x => (x - mu) * (x - mu)).sum / n
      assert(math.abs(v - eig(c.toLong)) / eig(c.toLong) < 1e-6, s"component $c")
    }
    for (c1 <- 0 until k; c2 <- c1 + 1 until k) {
      val cv = proj.values.map(p => p(c1) * p(c2)).sum / n
      assert(math.abs(cv) < 1e-6, s"($c1,$c2) correlated: $cv")
    }
    // full-rank projection is a rotation of the centered data
    val mean = Array.tabulate(d)(j => pts.map(_._2(j).toDouble).sum / pts.size)
    val full = Pca.project(df, "vec_id", "embedding", d)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    pts.take(20).foreach { case (id, x) =>
      val cn = math.sqrt(x.indices.map(i => math.pow(x(i) - mean(i), 2)).sum)
      val pn = math.sqrt(full(id).map(v => v * v).sum)
      // 1e-6-quantized covariance/mean (the determinism contract) perturbs
      // the rotation by O(1e-6) relative — norms agree to that order
      assert(math.abs(cn - pn) < 1e-5, s"id=$id: |x-mean|=$cn proj=$pn")
    }
  }

  test("covariance is independent of the partition count") {
    val one = Pca.covariance(df.repartition(1), "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val many = Pca.covariance(df.repartition(13), "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(one == many) // round-6 output absorbs ULP reorder noise
  }

  test("randomProject equals the sequential ±1/√k matmul and ignores partitioning") {
    val k = 3
    val scale = 1.0 / math.sqrt(k.toDouble)
    def sign(i: Int, j: Int) =
      if (graft.functions.StableHash.md5Hash60(s"rp:$i:$j") % 2 == 0) scale else -scale
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = (for {
      (id, x) <- pts
      i <- 0 until k
    } yield (id, i.toLong) -> r6((0 until d).map(j => x(j) * sign(i, j)).sum)).toMap
    val got = Pca.randomProject(df, "vec_id", "embedding", k)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.size == pts.size * k)
    // ULP tolerance: the kernel sums j-ascending like the replay, so exact
    assert(got == expected)
    val got31 = Pca.randomProject(df.repartition(31), "vec_id", "embedding", k)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got31 == got)
    intercept[IllegalArgumentException] {
      Pca.randomProject(df, "vec_id", "embedding", 0)
    }
  }

  test("standardize yields mean ~0 / sample std ~1 per dim") {
    val z = Pca.standardize(df, "vec_id", "embedding")
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val n = pts.size
    z.values.foreach { xs =>
      val mu = xs.sum / n
      val sd = math.sqrt(xs.map(x => (x - mu) * (x - mu)).sum / (n - 1))
      assert(math.abs(mu) < 1e-5)
      assert(math.abs(sd - 1.0) < 1e-4)
    }
  }
}
