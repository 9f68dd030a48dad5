package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Product quantization: encode determinism/shape, ADC vs a from-scratch
  * Scala replay, exact-reconstruction limit, and trained-codebook recall on
  * clustered data.
  */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 16
  private val m = 4
  private val dsub = dim / m
  private val ksub = 4

  /** Deterministic pseudo-random vector: component j of row i. */
  private def vec(i: Long, noise: Double = 1.0): Array[Float] =
    Array.tabulate(dim) { j =>
      val h = graft.functions.StableHash.fnv64(s"$i:$j")
      (((h >>> 12).toDouble / (1L << 52).toDouble * 2 - 1) * noise).toFloat
    }

  private lazy val base = (0L until 64L).map(i => (i, vec(i).toSeq)).toDF("vec_id", "embedding")
  private lazy val cbs = Pq.subsetCodebooks(base.filter(col("vec_id") < ksub), m)

  test("subsetCodebooks: dense m x ksub layout with dsub-length centroids") {
    val rows = cbs.collect()
    assert(rows.length == m * ksub)
    assert(rows.forall(_.getSeq[Float](2).length == dsub))
  }

  test("encode: codes in range, deterministic, argmin verified against replay") {
    val books = cbs.as[(Int, Int, Array[Float])].collect()
      .groupBy(_._1).map { case (s, rs) => s -> rs.sortBy(_._2).map(_._3) }
    val codes = Pq.encode(base, cbs).as[(Long, Array[Int])].collect().toMap
    assert(codes.size == 64)
    for ((id, cs) <- codes) {
      assert(cs.length == m)
      val v = vec(id)
      for (s <- 0 until m) {
        val dists = books(s).map { cw =>
          (0 until dsub).map(j => math.pow(v(s * dsub + j) - cw(j), 2)).sum
        }
        assert(cs(s) == dists.indexOf(dists.min), s"row $id subspace $s")
      }
    }
  }

  test("encode of a codebook-source row reconstructs itself: ADC dist 0 to own code") {
    // row 0 IS codeword 0 of every subspace → its ADC distance to query row 0
    // must be exactly 0, and it must rank first
    val codes = Pq.encode(base, cbs)
    val top = Pq.adcSearch(base.filter(col("vec_id") === 0), codes, cbs, k = 1)
      .collect().head
    assert(top.getAs[Long]("neighbor_id") == 0L)
    assert(top.getAs[Double]("adc_dist") == 0.0)
  }

  test("adcSearch matches a from-scratch LUT replay, ranks by (dist, id)") {
    val queries = base.filter(col("vec_id") >= 60)
    val codes = Pq.encode(base, cbs).cache()
    val got = Pq.adcSearch(queries, codes, cbs, k = 5)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("adc_dist")))
      .toSet

    val books = cbs.as[(Int, Int, Array[Float])].collect()
      .groupBy(_._1).map { case (s, rs) => s -> rs.sortBy(_._2).map(_._3) }
    val codeMap = codes.as[(Long, Array[Int])].collect().toMap
    val expect = (60L until 64L).flatMap { qid =>
      val qv = vec(qid)
      val dists = codeMap.toSeq.map { case (id, cs) =>
        val d = (0 until m).map { s =>
          val cw = books(s)(cs(s))
          (0 until dsub).map(j => math.pow(qv(s * dsub + j).toDouble - cw(j), 2)).sum
        }.sum
        (id, math.sqrt(d))
      }
      dists.sortBy { case (id, d) => (d, id) }.take(5).zipWithIndex.map {
        case ((id, d), i) => (qid, (i + 1).toLong, id, d)
      }
    }.toSet
    assert(got == expect)
  }

  test("adcSearchChunked equals single-pass adcSearch for any chunking") {
    val queries = base.filter(col("vec_id") >= 48)
    val codes = Pq.encode(base, cbs).cache()
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("adc_dist"))).toSet
    val whole = canon(Pq.adcSearch(queries, codes, cbs, k = 5))
    assert(canon(Pq.adcSearchChunked(queries, codes, cbs, k = 5, nChunks = 3)) == whole)
    assert(canon(Pq.adcSearchChunked(queries, codes, cbs, k = 5, nChunks = 7)) == whole)
  }

  test("ivfPqSearchChunked equals single-pass ivfPqSearch for any chunking") {
    val centroids = base.filter(col("vec_id") >= 8 && col("vec_id") < 12)
    val index = Pq.ivfPqIndex(base, centroids, cbs)
    val queries = base.filter(col("vec_id") >= 48)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("adc_dist"))).toSet
    val whole = canon(Pq.ivfPqSearch(queries, index, centroids, cbs, k = 5, nProbe = 2))
    assert(canon(Pq.ivfPqSearchChunked(queries, index, centroids, cbs,
      k = 5, nProbe = 2, nChunks = 3)) == whole)
  }

  test("excludeSelf drops the query row from its own neighbor list") {
    val codes = Pq.encode(base, cbs)
    val rows = Pq.adcSearch(base.filter(col("vec_id") === 0), codes, cbs, k = 3,
      excludeSelf = true).collect()
    assert(rows.forall(_.getAs[Long]("neighbor_id") != 0L))
  }

  test("trained codebooks on clustered data: shortlist recall@5 in top-20 >= 0.9") {
    // 8 well-separated cluster centers, 16 points each, noise << separation.
    // With ksub=8 codewords per subspace the codewords land on the cluster
    // centers and WITHIN-cluster ranking ties away (by design — PQ is a
    // shortlist generator); the production metric is survival of the exact
    // top-k into the ADC shortlist, which must be ~1 here because a whole
    // 16-point cluster fits into a 20-deep shortlist.
    val pts = (0L until 128L).map { i =>
      val c = (i % 8).toInt
      val centre = vec(1000L + c, noise = 10.0)
      val n = vec(i, noise = 0.3)
      (i, centre.zip(n).map { case (a, b) => a + b }.toSeq)
    }.toDF("vec_id", "embedding")
    val trained = Pq.trainCodebooks(pts, m, ksub = 8)
    val queries = pts.filter(col("vec_id") < 16)
    val recall = Pq.adcRecall(spark, queries, pts, trained, k = 5, shortlist = 20)
      .collect().head.getDouble(0)
    assert(recall >= 0.9, s"ADC shortlist recall $recall")
    // compression: m one-byte-range codes vs dim floats
    assert(m < dim * 4 / 2)
  }

  test("ivfPqIndex + ivfPqSearch match a from-scratch residual-ADC replay") {
    val centroids = base.filter(col("vec_id") >= 8 && col("vec_id") < 12)
    val index = Pq.ivfPqIndex(base, centroids, cbs)
    val queries = base.filter(col("vec_id") >= 60)
    val nProbe = 2
    val got = Pq.ivfPqSearch(queries, index, centroids, cbs, k = 3, nProbe = nProbe)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("adc_dist")))
      .toSet

    // replay from first principles
    val cents = (8L until 12L).map(i => i -> vec(i)).toArray
    val books = cbs.as[(Int, Int, Array[Float])].collect()
      .groupBy(_._1).map { case (s, rs) => s -> rs.sortBy(_._2).map(_._3) }
    def l2sq(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def assignCell(v: Array[Float]): Long =
      cents.map { case (id, c) =>
        (l2sq(v.map(_.toDouble), c.map(_.toDouble)), id)
      }.minBy(p => (p._1, p._2))._2
    def residCodes(v: Array[Float]): (Long, Array[Int]) = {
      val cell = assignCell(v)
      val cv = cents.toMap.apply(cell)
      val r = v.indices.map(j => (v(j).toDouble - cv(j).toDouble).toFloat).toArray
      val codes = (0 until m).map { s =>
        books(s).zipWithIndex.map { case (cw, c) =>
          (l2sq(r.slice(s * dsub, (s + 1) * dsub).map(_.toDouble), cw.map(_.toDouble)), c)
        }.minBy(p => (p._1, p._2))._2
      }.toArray
      (cell, codes)
    }
    val allCodes = (0L until 64L).map(i => i -> residCodes(vec(i))).toMap
    val expect = (60L until 64L).flatMap { qid =>
      val qv = vec(qid)
      val probed = cents.map { case (id, c) =>
        (l2sq(qv.map(_.toDouble), c.map(_.toDouble)), id)
      }.sortBy(p => (p._1, p._2)).take(nProbe).map(_._2).toSet
      val cands = allCodes.toSeq.collect { case (id, (cell, codes)) if probed(cell) =>
        val cv = cents.toMap.apply(cell)
        val d = (0 until m).map { s =>
          val cw = books(s)(codes(s))
          (0 until dsub).map { i =>
            val t = qv(s * dsub + i).toDouble - cv(s * dsub + i).toDouble - cw(i).toDouble
            t * t
          }.sum
        }.sum
        (id, math.sqrt(d))
      }
      cands.sortBy { case (id, d) => (d, id) }.take(3).zipWithIndex.map {
        case ((id, d), i) => (qid, (i + 1).toLong, id, d)
      }
    }.toSet
    // compare ids/ranks exactly, distances to 1e-9 (summation order differs)
    assert(got.map(t => (t._1, t._2, t._3)) == expect.map(t => (t._1, t._2, t._3)))
    val gd = got.toSeq.sortBy(t => (t._1, t._2)).map(_._4)
    val ed = expect.toSeq.sortBy(t => (t._1, t._2)).map(_._4)
    gd.zip(ed).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
  }

  test("ivfPqSearch probing all cells beats few-probe recall on clustered data") {
    val pts = (0L until 128L).map { i =>
      val c = (i % 8).toInt
      val centre = vec(1000L + c, noise = 10.0)
      val n = vec(i, noise = 0.3)
      (i, centre.zip(n).map { case (a, b) => a + b }.toSeq)
    }.toDF("vec_id", "embedding")
    val centroids = pts.filter(col("vec_id") < 8) // one per cluster family
    val trained = Pq.trainCodebooks(pts, m, ksub = 8)
    val index = Pq.ivfPqIndex(pts, centroids, trained).cache()
    val queries = pts.filter(col("vec_id") >= 120)
    val exact = Knn.knn(queries, pts, k = 5, metric = "EUCLIDEAN")
      .select(col("query_id"), col("neighbor_id"))
    def hits(nProbe: Int): Long =
      Pq.ivfPqSearch(queries, index, centroids, trained, k = 20, nProbe = nProbe)
        .select(col("query_id"), col("neighbor_id"))
        .join(exact, Seq("query_id", "neighbor_id")).count()
    val all = hits(8)
    assert(all >= 32, s"full-probe shortlist hits $all / 40") // >= 0.8 recall
    assert(all >= hits(1), "more probes can only widen the candidate set")
  }

  test("refine over a full shortlist equals exact brute-force KNN") {
    val queries = base.filter(col("vec_id") < 4)
    val codes = Pq.encode(base, cbs)
    // shortlist = the whole corpus: refine must reduce to exact KNN
    val full = Pq.adcSearch(queries, codes, cbs, k = 64)
    val refined = Pq.refine(queries, full, base, k = 5)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Number](2).longValue))
    val brute = Knn.knn(
        queries.select(col("vec_id"), col("embedding")), base, k = 5,
        metric = "EUCLIDEAN")
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Number](2).longValue))
    assert(refined.toSeq == brute.toSeq)
    // a narrow shortlist strictly bounds the candidate pool
    val short = Pq.adcSearch(queries, codes, cbs, k = 8)
    val narrow = Pq.refine(queries, short, base, k = 5).collect()
    assert(narrow.length == 20) // 4 queries x 5
    val pool = short.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    narrow.foreach(r => assert(pool.contains((r.getLong(0), r.getLong(1)))))
  }

  test("maintained IVF-PQ codes table (build -> append -> delete) equals a rebuild") {
    val cents = base.filter(col("vec_id") < 4)
    val old = Pq.ivfPqIndex(base.filter(col("vec_id") < 48), cents, cbs)
    val maintained = Pq.ivfPqDelete(
      Pq.ivfPqAppend(old, base.filter(col("vec_id") >= 48), cents, cbs),
      base.filter(col("vec_id") % 7 === 0))
    val rebuilt = Pq.ivfPqIndex(base.filter(col("vec_id") % 7 =!= 0), cents, cbs)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        r.getSeq[Int](2).toList)).toSet
    assert(rows(maintained) == rows(rebuilt))
    assert(rows(maintained).size == 64 - 64 / 7 - 1) // 10 ids are %7==0
  }

  test("codebook validation rejects sparse layouts and bad dims") {
    val sparse = cbs.filter(!(col("subspace") === 0 && col("code") === 0))
    intercept[IllegalArgumentException](Pq.encode(base, sparse).collect())
    val wrongDim = base.select(col("vec_id"), slice(col("embedding"), 1, 15).as("embedding"))
    intercept[Exception](Pq.encode(wrongDim, cbs).collect())
    // duplicate (subspace, code) + hole has the RIGHT row count — must still
    // be rejected (a null slot would otherwise NPE inside executor kernels)
    val dupPlusHole = sparse.union(cbs.filter(col("subspace") === 0 && col("code") === 1))
    val e = intercept[IllegalArgumentException](Pq.encode(base, dupPlusHole).collect())
    assert(e.getMessage.contains("duplicate codebook entry"))
  }
}
