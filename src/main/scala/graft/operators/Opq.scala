package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Optimized Product Quantization (OPQ): learn an orthogonal rotation R so
  * that PQ codebooks trained on R·x have lower quantization error than on
  * raw x — the standard fix for PQ's independent-subspace assumption when
  * dimensions are correlated. Follows Ge, He, Ke, Sun, "Optimized Product
  * Quantization" (CVPR 2013, non-parametric alternation) — public
  * literature; the reference engine has no OPQ (its contract stops at
  * exact KNN ground truth, `Knn.scala`; the ADC read-path contract this
  * extends is `Pq.adcSearch`, cf. /root/reference/datatools-vectordata
  * ivec/fvec KNN semantics).
  *
  * Spark shape:
  *  - the rotation is a d×d float matrix (d = embedding dim, e.g. 64 →
  *    16 KiB) — broadcast; [[rotate]] is a map-side typed kernel, zero
  *    shuffle, same discipline as `Pq.encode`;
  *  - learning alternates (train codebooks on rotated data) ↔ (solve the
  *    orthogonal Procrustes problem R = U·Vᵀ from the d×d cross-covariance
  *    M = Σ x̂ᵢxᵢᵀ between reconstructions and inputs). M is aggregated
  *    distributively (one treeAggregate of d² doubles per iteration); only
  *    the d×d SVD runs on the driver — constant work independent of corpus
  *    size, so the loop holds at 100 TB exactly as `Pq.trainCodebooks`
  *    does (and accepts the same `sampleFraction`).
  *  - search = rotate the queries with the SAME R, then the unchanged
  *    `Pq.adcSearch` over codes of the rotated corpus: R is an isometry,
  *    so ADC distances in rotated space approximate true distances in the
  *    original space.
  *
  * Oracle strategy: the learned R (KMeans + SVD) is not ANSI-replayable,
  * so the DuckDB-oracled queries (q274/q275/q276) use the DETERMINISTIC
  * [[householderRotation]] — the reflection mapping the corpus mean
  * direction onto e₁, computable in SQL from per-dim averages — to replay
  * rotation application, rotated-space encode/ADC, and the recall card
  * end-to-end. The learned path's properties (RᵀR = I, quantization error
  * ≤ plain PQ, recall ≥ plain PQ on correlated data) are machine-checked
  * in `OpqSpec` with the oracled deterministic path as the contract twin.
  */
object Opq {

  /** Deterministic orthogonal transform for oracle replay: the Householder
    * reflection H = I − 2uuᵀ with u = normalize(normalize(dir) − e₁) — H
    * maps the `dir` direction onto e₁. With `dir` a designated corpus row
    * (the repo's oracle-friendly-quantizer convention, cf.
    * `Pq.subsetCodebooks`) every arithmetic step is a fixed-order sum over
    * 64 floats, so DuckDB replays H entry by entry. Falls back to the
    * identity when dir is (numerically) zero or already along e₁ (‖u‖ ≈ 0),
    * keeping the map total. For production use pass [[meanDirection]] —
    * the corpus mean, the first moment the parametric-OPQ literature
    * centers on.
    */
  def householderRotation(dir: Array[Float]): Array[Array[Float]] = {
    val dim = dir.length
    var mNorm2 = 0.0
    var i = 0
    while (i < dim) { mNorm2 += dir(i).toDouble * dir(i).toDouble; i += 1 }
    val mNorm = math.sqrt(mNorm2)
    val u = new Array[Double](dim)
    if (mNorm > 0) {
      i = 0
      while (i < dim) { u(i) = dir(i).toDouble / mNorm - (if (i == 0) 1.0 else 0.0); i += 1 }
    }
    var uNorm2 = 0.0
    i = 0
    while (i < dim) { uNorm2 += u(i) * u(i); i += 1 }
    val uNorm = math.sqrt(uNorm2)
    val r = Array.ofDim[Float](dim, dim)
    i = 0
    while (i < dim) {
      var j = 0
      while (j < dim) {
        val id = if (i == j) 1.0 else 0.0
        r(i)(j) =
          if (uNorm < 1e-12) id.toFloat
          else (id - 2.0 * (u(i) / uNorm) * (u(j) / uNorm)).toFloat
        j += 1
      }
      i += 1
    }
    r
  }

  /** Corpus mean vector (float, one treeAggregate of d doubles) — the
    * production `dir` for [[householderRotation]].
    */
  def meanDirection(base: DataFrame, vecCol: String = "embedding"): Array[Float] = {
    val spark = base.sparkSession
    import spark.implicits._
    val (sums, n) = base.select(col(vecCol).cast("array<float>")).as[Array[Float]]
      .rdd.treeAggregate((null: Array[Double], 0L))(
        seqOp = { case ((acc0, cnt), v) =>
          val acc = if (acc0 == null) new Array[Double](v.length) else acc0
          var i = 0
          while (i < v.length) { acc(i) += v(i).toDouble; i += 1 }
          (acc, cnt + 1)
        },
        combOp = {
          case ((null, n1), (b, n2)) => (b, n1 + n2)
          case ((a, n1), (null, n2)) => (a, n1 + n2)
          case ((a, n1), (b, n2)) =>
            var i = 0
            while (i < a.length) { a(i) += b(i); i += 1 }
            (a, n1 + n2)
        })
    require(n > 0, "meanDirection: empty base")
    sums.map(s => (s / n).toFloat)
  }

  /** Apply rotation R to the vector column: out = R·x, computed in double
    * and emitted as float (the storage dtype). Map-side typed kernel over
    * the broadcast matrix — zero shuffle. Output: (id LONG, vecCol
    * ARRAY<FLOAT>), the input shape `Pq.encode`/`Pq.subsetCodebooks`
    * consume directly.
    */
  def rotate(df: DataFrame, r: Array[Array[Float]],
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(r)
    df.select(col(idCol).cast("long"), col(vecCol).cast("array<float>"))
      .as[(Long, Array[Float])]
      .map { case (id, v) =>
        val m = bc.value
        require(v.length == m.length, s"vector dim ${v.length} != rotation dim ${m.length}")
        val out = new Array[Float](m.length)
        var i = 0
        while (i < m.length) {
          val row = m(i)
          var s = 0.0
          var j = 0
          while (j < row.length) { s += row(j).toDouble * v(j).toDouble; j += 1 }
          out(i) = s.toFloat
          i += 1
        }
        (id, out)
      }
      .toDF(idCol, vecCol)
  }

  /** Learned OPQ rotation (non-parametric alternation): starting from the
    * identity, repeat `iters` times — train per-subspace codebooks on the
    * rotated corpus, encode + reconstruct, accumulate the d×d
    * cross-covariance M = Σ x̂ᵢxᵢᵀ distributively, and set R to the
    * orthogonal Procrustes solution U·Vᵀ of M's SVD. Returns the final
    * rotation, the codebooks trained ON THE FINAL ROTATION (ready for
    * `Pq.encode(rotate(base, r), cbs)`), and the per-iteration mean
    * quantization error (‖R·x − x̂‖², the alternation's objective) for the
    * convergence card.
    *
    * Driver footprint per iteration: one d² treeAggregate + one d×d SVD +
    * `Pq.trainCodebooks`'s KMeans — all corpus-size-independent driver
    * state. `sampleFraction` flows to codebook training exactly as in
    * `Pq.trainCodebooks`.
    */
  def trainRotation(base: DataFrame, m: Int, ksub: Int, iters: Int = 5,
      vecCol: String = "embedding", idCol: String = "vec_id", seed: Long = 42L,
      sampleFraction: Double = Double.NaN): (Array[Array[Float]], DataFrame, Seq[Double]) = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val spark = base.sparkSession
    import spark.implicits._
    val slim = base.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<float>").as("v")).cache()
    try {
      val dim = slim.select("v").as[Array[Float]].head().length
      require(dim % m == 0, s"dim $dim not divisible by m=$m")
      var r: Array[Array[Float]] = Array.tabulate(dim, dim)((i, j) => if (i == j) 1f else 0f)
      var codebooks: DataFrame = null
      val errs = scala.collection.mutable.ArrayBuffer[Double]()
      for (it <- 0 until iters) {
        val rotated = rotate(slim, r, "id", "v")
        codebooks = Pq.trainCodebooks(rotated, m, ksub, vecCol = "v",
          seed = seed + it, sampleFraction = sampleFraction)
        // reconstruction x̂ per row (broadcast codebooks, map-side), then the
        // d×d cross-covariance with the ORIGINAL x and the scalar error —
        // one treeAggregate of (d² + 2) doubles
        val cb = codebooks
          .select(col("subspace").cast("int"), col("code").cast("int"),
            col("centroid").cast("array<float>"))
          .as[(Int, Int, Array[Float])].collect()
        val books = Array.ofDim[Array[Float]](m, ksub)
        cb.foreach { case (s, c, v) => books(s)(c) = v }
        val bb = spark.sparkContext.broadcast(books)
        val br = spark.sparkContext.broadcast(r)
        val dsub = dim / m
        val (mm, errSum, n) = slim.select("v").as[Array[Float]].rdd
          .treeAggregate((new Array[Double](dim * dim), 0.0, 0L))(
            seqOp = { case ((acc, e, cnt), x) =>
              // y = R x; x̂_rot = nearest codeword per subspace of y
              val rm = br.value
              val y = new Array[Double](dim)
              var i = 0
              while (i < dim) {
                val row = rm(i)
                var s = 0.0
                var j = 0
                while (j < dim) { s += row(j).toDouble * x(j).toDouble; j += 1 }
                y(i) = s
                i += 1
              }
              val xhat = new Array[Double](dim)
              var err = 0.0
              var s = 0
              while (s < m) {
                var best = 0
                var bestD = Double.MaxValue
                var c = 0
                while (c < ksub) {
                  val cw = bb.value(s)(c)
                  var d = 0.0
                  var j = 0
                  while (j < dsub) {
                    val t = y(s * dsub + j) - cw(j).toDouble
                    d += t * t
                    j += 1
                  }
                  if (d < bestD) { bestD = d; best = c }
                  c += 1
                }
                val cw = bb.value(s)(best)
                var j = 0
                while (j < dsub) { xhat(s * dsub + j) = cw(j).toDouble; j += 1 }
                err += bestD
                s += 1
              }
              // M += x̂ xᵀ  (x̂ in ROTATED space vs x in ORIGINAL space:
              // Procrustes then solves min_R ‖R x − x̂‖²)
              i = 0
              while (i < dim) {
                val xi = xhat(i)
                var j = 0
                while (j < dim) { acc(i * dim + j) += xi * x(j).toDouble; j += 1 }
                i += 1
              }
              (acc, e + err, cnt + 1)
            },
            combOp = { case ((a, e1, n1), (b, e2, n2)) =>
              var i = 0
              while (i < a.length) { a(i) += b(i); i += 1 }
              (a, e1 + e2, n1 + n2)
            })
        require(n > 0, "trainRotation: empty base")
        errs += errSum / n
        // R = U Vᵀ from SVD(M) — the orthogonal Procrustes solution
        val bm = breeze.linalg.DenseMatrix.tabulate(dim, dim)((i, j) => mm(i * dim + j))
        val svd = breeze.linalg.svd(bm)
        val ruv = svd.U * svd.Vt
        r = Array.tabulate(dim, dim)((i, j) => ruv(i, j).toFloat)
      }
      // codebooks were trained on the PREVIOUS R; retrain on the final one
      // so (r, codebooks) is a consistent servable pair
      val finalCbs = Pq.trainCodebooks(rotate(slim, r, "id", "v"), m, ksub,
        vecCol = "v", seed = seed + iters, sampleFraction = sampleFraction)
      (r, finalCbs, errs.toSeq)
    } finally slim.unpersist()
  }

  /** Mean PQ quantization error ‖R·x − x̂‖² of (rotation, codebooks) over
    * the corpus — the number the OPQ-vs-PQ comparison card reports (plain
    * PQ = identity rotation). One map-side pass, one scalar aggregate.
    */
  def quantizationError(base: DataFrame, r: Array[Array[Float]],
      codebooks: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding"): Double = {
    val spark = base.sparkSession
    import spark.implicits._
    val rotated = rotate(base, r, idCol, vecCol)
    val cb = codebooks
      .select(col("subspace").cast("int"), col("code").cast("int"),
        col("centroid").cast("array<float>"))
      .as[(Int, Int, Array[Float])].collect()
    val m = cb.map(_._1).max + 1
    val ksub = cb.map(_._2).max + 1
    val books = Array.ofDim[Array[Float]](m, ksub)
    cb.foreach { case (s, c, v) => books(s)(c) = v }
    val bb = spark.sparkContext.broadcast(books)
    rotated.select(col(vecCol)).as[Array[Float]]
      .map { y =>
        val dsub = y.length / bb.value.length
        var err = 0.0
        var s = 0
        while (s < bb.value.length) {
          var bestD = Double.MaxValue
          var c = 0
          while (c < bb.value(s).length) {
            val cw = bb.value(s)(c)
            var d = 0.0
            var j = 0
            while (j < dsub) {
              val t = y(s * dsub + j).toDouble - cw(j).toDouble
              d += t * t
              j += 1
            }
            if (d < bestD) bestD = d
            c += 1
          }
          err += bestD
          s += 1
        }
        err
      }
      .agg(avg(col("value"))).as[Double].head()
  }

  /** OPQ ADC top-k: rotate the queries with the index's R, then the
    * unchanged [[Pq.adcSearch]] over codes of the rotated corpus. Same
    * output contract and plan shape (broadcast LUTs + bounded heaps).
    */
  def adcSearch(queries: DataFrame, codes: DataFrame, codebooks: DataFrame,
      r: Array[Array[Float]], k: Int, idCol: String = "vec_id",
      vecCol: String = "embedding", excludeSelf: Boolean = false): DataFrame =
    Pq.adcSearch(rotate(queries, r, idCol, vecCol), codes, codebooks, k,
      idCol, vecCol, excludeSelf)
}
