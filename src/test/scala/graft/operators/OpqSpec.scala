package graft.operators

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Learned-path OPQ contracts (the oracled deterministic twin is
  * q274–q276): the Procrustes-learned rotation must be orthogonal, the
  * alternation objective must descend per iteration, and on
  * cross-subspace-correlated data the learned pair must beat plain PQ on
  * both quantization error and ADC recall. Plus the deterministic
  * [[Opq.householderRotation]] / [[Opq.meanDirection]] algebra and the
  * zero-shuffle discipline of [[Opq.rotate]].
  */
class OpqSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 16
  private val m = 4
  private val ksub = 8

  // Latent space is PERFECTLY product-quantizable: each 4-dim subspace
  // independently picks one of 8 cube-corner centers (8^4 = 4096 distinct
  // latent points — exactly PQ's independence assumption). A dense
  // Householder reflection then mixes every latent coordinate into every
  // subspace, so plain PQ's 8 codewords per subspace face projections of
  // 4096 distinct values — the correlated regime OPQ exists for. OPQ can
  // win only by (approximately) unmixing first.
  private val mixDir: Array[Float] = Array.tabulate(dim)(j => (j + 1).toFloat)
  private val mix: Array[Array[Float]] = Opq.householderRotation(mixDir)

  private def matVec(r: Array[Array[Float]], v: Array[Float]): Array[Float] =
    Array.tabulate(r.length) { i =>
      var s = 0.0
      var j = 0
      while (j < v.length) { s += r(i)(j).toDouble * v(j).toDouble; j += 1 }
      s.toFloat
    }

  private def latent(i: Long): Array[Float] = {
    val dsub = dim / m
    Array.tabulate(dim) { j =>
      val s = j / dsub
      val c = ((graft.functions.StableHash.fnv64(s"opq-cl:$i:$s") >>> 8) % 8).toInt
      val center = if (j % dsub < 3) 4f * (((c >> (j % dsub)) & 1) * 2 - 1) else 0f
      val jit = ((graft.functions.StableHash.fnv64(s"opq:$i:$j") >>> 12).toDouble /
        (1L << 52) * 2 - 1).toFloat
      center + 0.25f * jit
    }
  }

  private lazy val base = (0L until 256L)
    .map(i => (i, matVec(mix, latent(i)).toSeq))
    .toDF("vec_id", "embedding")

  private def assertOrthogonal(r: Array[Array[Float]], tol: Double, what: String): Unit = {
    val d = r.length
    for (i <- 0 until d; j <- 0 until d) {
      var s = 0.0
      var k = 0
      while (k < d) { s += r(k)(i).toDouble * r(k)(j).toDouble; k += 1 }
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(s - want) < tol,
        s"$what: (RtR)($i,$j) = $s, want $want (tol $tol)")
    }
  }

  test("householderRotation is orthogonal and maps dir onto e1") {
    assertOrthogonal(mix, 1e-5, "householder")
    val image = matVec(mix, mixDir)
    val norm = math.sqrt(mixDir.map(x => x.toDouble * x).sum)
    assert(math.abs(image(0) - norm) < 1e-3, s"H·dir first coord ${image(0)} != |dir| $norm")
    for (j <- 1 until dim)
      assert(math.abs(image(j)) < 1e-3, s"H·dir coord $j = ${image(j)}, want 0")
    // degenerate dirs fall back to the identity
    for (dir <- Seq(Array.fill(dim)(0f), Array.tabulate(dim)(j => if (j == 0) 3f else 0f))) {
      val h = Opq.householderRotation(dir)
      for (i <- 0 until dim; j <- 0 until dim)
        assert(h(i)(j) == (if (i == j) 1f else 0f), s"identity fallback broke at ($i,$j)")
    }
  }

  test("meanDirection equals the per-dimension average") {
    val got = Opq.meanDirection(base)
    val want = base.select(col("embedding").cast("array<float>")).as[Array[Float]]
      .collect().transpose.map(cs => (cs.map(_.toDouble).sum / cs.length).toFloat)
    assert(got.length == dim)
    for (j <- 0 until dim)
      assert(math.abs(got(j) - want(j)) < 1e-5, s"dim $j: ${got(j)} != ${want(j)}")
  }

  test("trainRotation returns an orthogonal R (RtR = I)") {
    val (r, _, _) = Opq.trainRotation(base, m, ksub, iters = 2)
    assertOrthogonal(r, 1e-3, "learned R")
  }

  test("alternation objective descends per iteration on correlated data") {
    val (_, _, errs) = Opq.trainRotation(base, m, ksub, iters = 4)
    assert(errs.length == 4)
    for (i <- 1 until errs.length)
      assert(errs(i) <= errs(i - 1) * 1.02,
        s"iteration $i error ${errs(i)} rose above ${errs(i - 1)}: $errs")
    assert(errs.last < errs.head * 0.9,
      s"alternation must materially cut error on mixed data: $errs")
  }

  test("learned OPQ beats plain PQ on quantization error (correlated data)") {
    val identity = Array.tabulate(dim, dim)((i, j) => if (i == j) 1f else 0f)
    val plainCbs = Pq.trainCodebooks(base, m, ksub)
    val pqErr = Opq.quantizationError(base, identity, plainCbs)
    val (r, opqCbs, _) = Opq.trainRotation(base, m, ksub, iters = 4)
    val opqErr = Opq.quantizationError(base, r, opqCbs)
    assert(opqErr < pqErr, s"OPQ error $opqErr must beat plain PQ $pqErr")
  }

  test("learned OPQ ADC recall >= plain PQ recall vs exact KNN") {
    val queries = base.filter(col("vec_id") < 20)
    val exact = Knn.knn(queries, base, k = 10, excludeSelf = true)
      .select(col("query_id"), col("neighbor_id"))
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    def recallOf(hits: Map[Long, Set[Long]]): Double = {
      val rs = exact.map { case (q, t) => (hits.getOrElse(q, Set.empty) & t).size.toDouble / t.size }
      rs.sum / rs.size
    }
    val plainCbs = Pq.trainCodebooks(base, m, ksub)
    val plainHits = Pq.adcSearch(queries, Pq.encode(base, plainCbs), plainCbs,
        k = 10, excludeSelf = true)
      .select(col("query_id"), col("neighbor_id"))
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val (r, opqCbs, _) = Opq.trainRotation(base, m, ksub, iters = 4)
    val opqHits = Opq.adcSearch(queries, Pq.encode(Opq.rotate(base, r), opqCbs),
        opqCbs, r, k = 10, excludeSelf = true)
      .select(col("query_id"), col("neighbor_id"))
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val (pqR, opqR) = (recallOf(plainHits), recallOf(opqHits))
    assert(opqR >= pqR, s"OPQ recall $opqR must be >= plain PQ recall $pqR")
  }

  test("rotate executes with ZERO shuffle exchanges (pure map job)") {
    val rotated = Opq.rotate(base, mix)
    rotated.collect()
    assert(shuffleCount(finalPlan(rotated)) == 0,
      s"rotate must be map-side:\n${rotated.queryExecution.executedPlan}")
  }

  private def finalPlan(df: org.apache.spark.sql.DataFrame): SparkPlan =
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }

  private def shuffleCount(plan: SparkPlan): Int =
    plan.collect { case _: ShuffleExchangeExec => 1 }.sum +
      plan.toString.linesIterator
        .count(l => l.contains("ShuffleQueryStage") && !l.contains("Reused"))
}
