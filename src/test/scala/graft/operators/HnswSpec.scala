package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Graph-ANN contracts (the jump-hash discipline: the recall-carrying
  * twin is exact KNN): beam search over the per-cell NSW graphs must
  * reach recall@10 >= 0.9 on the clustered fixture while evaluating
  * < 10% of the exhaustive distance computations; the bundle round-trips
  * bit-identically; results only ever come from probed cells; degenerate
  * cells (singletons) serve.
  */
class HnswSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 32
  private val nClusters = 32
  private val nBase = 4000L

  // 32 well-separated one-hot clusters scaled 4.0, deterministic jitter
  // 0.3 — a query's true top-10 lives inside its own cluster, so the
  // coarse router carries no recall loss and the measurement isolates
  // the BEAM's recall
  private def vec(i: Long): Array[Float] = {
    val c = (i % nClusters).toInt
    Array.tabulate(dim) { j =>
      val center = if (j == c) 4f else 0f
      val jit = ((graft.functions.StableHash.fnv64(s"hnsw:$i:$j") >>> 12).toDouble /
        (1L << 52) * 2 - 1).toFloat
      center + 0.3f * jit
    }
  }

  private lazy val base = (0L until nBase).map(i => (i, vec(i).toSeq))
    .toDF("vec_id", "embedding")
  private lazy val centroids = (0 until nClusters)
    .map(c => (c.toLong, Array.tabulate(dim)(j => if (j == c) 4f else 0f).toSeq))
    .toDF("vec_id", "embedding")
  private lazy val queries = base.filter(col("vec_id") % 100 === 7) // 40 spread queries

  test("recall@10 >= 0.9 at < 10% of the exhaustive distance evaluations") {
    val index = Hnsw.hnswIndex(base, centroids, m = 8, efConstruction = 32)
      .cache()
    assert(index.count() == nBase)
    val counter = spark.sparkContext.longAccumulator("hnsw-dist-evals")
    val got = Hnsw.hnswSearch(queries, index, centroids, k = 10, nProbe = 2,
        ef = 32, excludeSelf = true, counter = Some(counter))
      .select(col("query_id"), col("neighbor_id"))
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val truth = Knn.knn(queries, base, k = 10, excludeSelf = true)
      .select(col("query_id"), col("neighbor_id"))
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val nQ = truth.size
    val recalls = truth.map { case (q, t) =>
      (got.getOrElse(q, Set.empty) & t).size.toDouble / t.size
    }
    val recall = recalls.sum / nQ
    assert(recall >= 0.9, s"recall@10 $recall < 0.9 over $nQ queries")
    val frac = counter.value.toDouble / (nQ.toDouble * nBase)
    assert(frac < 0.10,
      s"beam evaluated ${counter.value} distances = ${frac * 100}%% of exhaustive")
    index.unpersist()
  }

  test("results only come from probed cells; ranking is (dist, id)") {
    val index = Hnsw.hnswIndex(base, centroids, m = 6, efConstruction = 24).cache()
    val res = Hnsw.hnswSearch(queries, index, centroids, k = 5, nProbe = 2,
      ef = 16).collect()
    val cellOf = index.select(col("id"), col("cell"))
      .as[(Long, Long)].collect().toMap
    val probed = queries.select(col("vec_id"), col("embedding")).collect().map { r =>
      r.getLong(0) -> Ann.probedCells(
        queries.filter(col("vec_id") === r.getLong(0)), centroids, 2).toSet
    }.toMap
    res.foreach { r =>
      val (q, n) = (r.getLong(0), r.getLong(1))
      assert(probed(q).contains(cellOf(n)),
        s"neighbor $n of query $q came from unprobed cell ${cellOf(n)}")
    }
    // ranks are dense 1..k per query, ascending (dist, id)
    res.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      val byRank = rows.sortBy(_.getInt(2))
      assert(byRank.map(_.getInt(2)).toSeq == (1 to byRank.length).toSeq)
      val pairs = byRank.map(r => (r.getDouble(3), r.getLong(1))).toSeq
      assert(pairs == pairs.sorted, s"query $q results not (dist, id)-ordered: $pairs")
    }
    index.unpersist()
  }

  test("bundle round-trip: served results equal in-memory search exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-hnsw").toString
    val index = Hnsw.hnswIndex(base, centroids, m = 6, efConstruction = 24)
    Hnsw.writeBundle(index, centroids, dir)
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select(col("query_id"), col("neighbor_id"), col("rank").cast("long"),
        round(col("dist"), 9).as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val direct = key(Hnsw.hnswSearch(queries, index, centroids, k = 8,
      nProbe = 2, ef = 24))
    val served = key(Hnsw.searchBundle(queries, dir, k = 8, nProbe = 2, ef = 24))
    assert(direct == served,
      s"bundle served ${served.size} rows != direct ${direct.size}")
    assert(direct.nonEmpty)
    // the bundle is cell-partitioned on disk (partition pruning posture)
    val cellDirs = new java.io.File(s"$dir/cells").listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("cell="))
    assert(cellDirs == nClusters, s"expected $nClusters cell= dirs, got $cellDirs")
  }

  test("filtered beam: pre-filter semantics, saturated == filtered exhaustive") {
    import graft.predicates._
    import graft.predicates.Comparand.IntVal
    // metadata: label = id % 8; predicate keeps labels 0..3 (half the data)
    val metaBase = base.withColumn("label", pmod(col("vec_id"), lit(8)))
    val index = Hnsw.hnswIndexWithMeta(metaBase, centroids, m = 6,
      efConstruction = 24, metaCols = Seq("label")).cache()
    val blob = PNodeCodec.encodeFramed(
      PredicateNode.namedTyped("label", OpType.IN,
        IntVal(0), IntVal(1), IntVal(2), IntVal(3)),
      PNodeCodec.Mode.NamedTyped)
    val q = queries.withColumn("predicate",
      udf(() => blob).apply())
    // SATURATED: equals the filtered EXHAUSTIVE scan over the same
    // probed cells (Ann.ivfSearchFiltered — cell assignment and probe
    // selection are spec-pinned identical), under ANY predicate/cluster
    // aliasing — the theorem the q305 oracle also replays
    val got = Hnsw.hnswSearchFiltered(q, index, centroids, k = 10,
        nProbe = 2, ef = 1 << 20, excludeSelf = true)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val ivfIdx = Ann.ivfIndexWithMeta(metaBase, centroids, metaCols = Seq("label"))
    val truth = Ann.ivfSearchFiltered(q, ivfIdx, centroids, k = 10,
        nProbe = 2, metadataCols = Seq("label"), excludeSelf = true)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == truth, s"saturated filtered beam != filtered exhaustive: " +
      s"${(got diff truth).take(5)} vs ${(truth diff got).take(5)}")
    // every neighbor satisfies the predicate — pre-filter, not discard
    val labels = metaBase.select(col("vec_id"), col("label"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.foreach { case (_, n, _) => assert(labels(n) < 4, s"ineligible $n returned") }
    // a predicate naming a missing column fails loudly
    val badBlob = PNodeCodec.encodeFramed(
      PredicateNode.namedTyped("nope", OpType.GE, IntVal(0)),
      PNodeCodec.Mode.NamedTyped)
    val bad = queries.withColumn("predicate", udf(() => badBlob).apply())
    val e = intercept[Exception](
      Hnsw.hnswSearchFiltered(bad, index, centroids, k = 2, nProbe = 1,
        ef = 4).collect())
    assert(e.getMessage != null)
    index.unpersist()
  }

  test("append/delete maintenance equals the from-scratch build exactly") {
    val first = base.filter(col("vec_id") < 3000)
    val slice = base.filter(col("vec_id") >= 3000)
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select(col("cell"), col("id"), col("nbrs"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Seq[Long]](2).sorted.mkString(","))).toSet
    val appended = Hnsw.hnswAppend(
      Hnsw.hnswIndex(first, centroids, m = 6, efConstruction = 24),
      slice, centroids, m = 6, efConstruction = 24)
    val scratch = Hnsw.hnswIndex(base, centroids, m = 6, efConstruction = 24)
    assert(canon(appended) == canon(scratch), "append != from-scratch union")
    val removed = base.filter(col("vec_id") >= 3000).select(col("vec_id"))
    val deleted = Hnsw.hnswDelete(scratch, removed, m = 6, efConstruction = 24)
    val scratchFirst = Hnsw.hnswIndex(first, centroids, m = 6, efConstruction = 24)
    assert(canon(deleted) == canon(scratchFirst), "delete != from-scratch survivor build")
    // no-op delete passes through untouched
    val noop = Hnsw.hnswDelete(scratch,
      spark.range(1).select((col("id") + 1000000).as("vec_id")),
      m = 6, efConstruction = 24)
    assert(canon(noop) == canon(scratch))
  }

  test("bundle append/delete rewrite only affected cell partitions, from-scratch parity") {
    val dir = java.nio.file.Files.createTempDirectory("graft-hnsw-m").toString
    val first = base.filter(col("vec_id") < 3000)
    val slice = base.filter(col("vec_id") >= 3000) // clusters touch all cells...
    Hnsw.writeBundle(
      Hnsw.hnswIndex(first, centroids, m = 6, efConstruction = 24),
      centroids, dir)
    // record per-partition file timestamps, then append a slice touching
    // only SOME cells (clusters 0..7)
    val narrowSlice = slice.filter(pmod(col("vec_id"), lit(nClusters.toLong)) < 8)
    def partFiles(): Map[String, Long] =
      new java.io.File(s"$dir/cells").listFiles().filter(_.isDirectory)
        .map(d => d.getName ->
          Option(d.listFiles()).map(_.map(_.lastModified()).max).getOrElse(0L))
        .toMap
    val before = partFiles()
    Thread.sleep(1100) // lastModified granularity
    Hnsw.appendToBundle(narrowSlice, dir, m = 6, efConstruction = 24)
    val after = partFiles()
    val touched = (0 until 8).map(c => s"cell=$c").toSet
    after.foreach { case (cell, ts) =>
      if (touched.contains(cell)) assert(ts > before(cell), s"$cell not rewritten")
      else assert(ts == before(cell), s"untouched $cell was rewritten")
    }
    // the bundle now equals the from-scratch build over the union
    val expect = Hnsw.hnswIndex(first.unionByName(narrowSlice), centroids,
      m = 6, efConstruction = 24)
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select(col("cell").cast("long"), col("id"), col("nbrs"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Seq[Long]](2).sorted.mkString(","))).toSet
    assert(canon(spark.read.parquet(s"$dir/cells")) == canon(expect))
    // delete the slice back out: bundle returns to the first-build state
    Hnsw.deleteFromBundle(narrowSlice.select("vec_id"), dir, m = 6,
      efConstruction = 24)
    val expectFirst = Hnsw.hnswIndex(first, centroids, m = 6, efConstruction = 24)
    assert(canon(spark.read.parquet(s"$dir/cells")) == canon(expectFirst))
  }

  test("efRecallCurve: recall rises to 1.0 with ef, effort rises with it") {
    val index = Hnsw.hnswIndex(base, centroids, m = 6, efConstruction = 24)
    val curve = Hnsw.efRecallCurve(queries, index, centroids, k = 10,
        nProbe = 2, efs = Seq(10, 32, 4096), excludeSelf = true)
      .orderBy("ef").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
    assert(curve.map(_._1).toSeq == Seq(10, 32, 4096))
    // recall is monotone in ef and saturates at exactly 1.0 (ef = 4096 >=
    // every cell, where the beam provably equals the saturated truth)
    assert(curve(0)._2 <= curve(1)._2 + 1e-12 && curve(1)._2 <= curve(2)._2 + 1e-12,
      s"recall not monotone: ${curve.toSeq}")
    assert(curve(2)._2 == 1.0, s"saturated point must hit 1.0: ${curve.toSeq}")
    // effort (distance-eval fraction) strictly grows with ef
    assert(curve(0)._3 < curve(1)._3 && curve(1)._3 < curve(2)._3,
      s"effort not increasing: ${curve.toSeq}")
  }

  test("degenerate cells: singletons and near-empty cells still serve") {
    // 3 points, 3 cells: every cell is a singleton graph
    val tiny = Seq((0L, Seq.fill(dim)(0f)), (1L, (4f +: Seq.fill(dim - 1)(0f))),
      (2L, (0f +: 4f +: Seq.fill(dim - 2)(0f)))).toDF("vec_id", "embedding")
    val cents = tiny
    val idx = Hnsw.hnswIndex(tiny, cents, m = 2, efConstruction = 4)
    assert(idx.count() == 3)
    val r = Hnsw.hnswSearch(tiny.filter(col("vec_id") === 0L), idx, cents,
        k = 2, nProbe = 3, ef = 4, excludeSelf = true)
      .select("neighbor_id").as[Long].collect().toSet
    assert(r == Set(1L, 2L), r.toString)
    // invalid parameters fail loudly
    val e = intercept[IllegalArgumentException](
      Hnsw.hnswSearch(tiny, idx, cents, k = 8, nProbe = 1, ef = 4))
    assert(e.getMessage.contains("ef >= k"))
  }
}
