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
