package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.DistanceKernels

/** Deterministic distributed k-means (Lloyd's) over an embedding column —
  * the clustering primitive behind cluster-balanced subsampling and
  * SemDeDup-style cluster-then-dedup curation. `Ann.trainCentroids` is the
  * sampled Spark-ML production path for IVF quantizers; THIS is the
  * engine-replayable form: init and every iteration are fully determined by
  * the data (init = k lowest-id points, lowest-cell tie-break, centroids
  * rounded to 6 decimals), so results are independent of partitioning and
  * reproducible by any engine.
  *
  * Scale shape: each Lloyd iteration is ONE `treeAggregate` over the
  * points — per-task state is the k×d running sums + k counts (the same
  * bounded state the broadcast centroid array already occupies), and only
  * k×(d+1) doubles per partition cross the wire. No corpus shuffle, no
  * exploded (point, centroid) pair stream (the declarative crossJoin form
  * exchanges k rows per point, vector payload included — the anti-pattern
  * `Ann.ivfIndex` already measured at 322 s vs seconds for 1M×256).
  * The input is cached for multi-iteration runs (each iteration re-reads
  * it) and unpersisted on exit.
  *
  * Rounding centroids to 6 decimals per iteration makes the fixpoint
  * partition-stable: double summation order varies with partitioning at
  * the ULP level, and unrounded ULP noise would otherwise propagate into
  * assignment flips for near-equidistant points.
  */
object Clustering {

  /** Run `iters` Lloyd iterations from the deterministic k-lowest-id init.
    * Returns (cell, centroid, n_points): cell = 0..k-1 in ascending
    * init-id order, n_points = the cell's size in the LAST assignment pass
    * (an empty cell keeps its previous centroid and reports 0).
    */
  def lloyd(points: DataFrame, k: Int, iters: Int,
      metric: String = "EUCLIDEAN", idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val spark = points.sparkSession
    import spark.implicits._
    val pts = points
      .select(col(idCol).cast("long"), col(vecCol).cast("array<float>"))
      .as[(Long, Array[Float])]
    var cents: Array[Array[Float]] = pts
      .orderBy(col(idCol).cast("long")).limit(k) // TakeOrdered: no global sort
      .collect().map(_._2)
    require(cents.length == k,
      s"lloyd: need at least k=$k points, found ${cents.length}")
    val d = cents.head.length
    val mid = DistanceKernels.metricId(metric)
    val vecs = pts.rdd.map(_._2)
    if (iters > 1) vecs.persist(StorageLevel.MEMORY_AND_DISK)
    var counts: Array[Long] = null
    try {
      for (_ <- 0 until iters) {
        val bc = spark.sparkContext.broadcast(cents)
        val (sums, cnts) = vecs.treeAggregate(
          (new Array[Double](k * d), new Array[Long](k)))(
          seqOp = { case ((s, c), v) =>
            val cs = bc.value
            var best = 0; var bestD = Double.MaxValue; var i = 0
            while (i < cs.length) { // ascending scan + strict < = lowest-cell ties
              val dd = DistanceKernels.computeArrays(v, cs(i), mid)
              if (dd < bestD) { bestD = dd; best = i }
              i += 1
            }
            var j = 0
            while (j < d) { s(best * d + j) += v(j); j += 1 }
            c(best) += 1
            (s, c)
          },
          combOp = { case ((s1, c1), (s2, c2)) =>
            var i = 0
            while (i < s1.length) { s1(i) += s2(i); i += 1 }
            i = 0
            while (i < c1.length) { c1(i) += c2(i); i += 1 }
            (s1, c1)
          })
        cents = Array.tabulate(k) { ci =>
          if (cnts(ci) == 0L) cents(ci)
          else Array.tabulate(d) { j =>
            (math.rint(sums(ci * d + j) / cnts(ci) * 1e6) / 1e6).toFloat
          }
        }
        counts = cnts
        bc.destroy()
      }
    } finally if (iters > 1) vecs.unpersist(blocking = false)
    cents.zipWithIndex.map { case (c, i) => (i.toLong, c, counts(i)) }
      .toSeq.toDF("cell", "centroid", "n_points")
  }

  /** Assign every point to its nearest centroid: (id, vec, cell) — the
    * broadcast map-side argmin (`Ann.ivfIndex`), shared tie rule.
    */
  def assign(points: DataFrame, centroids: DataFrame,
      metric: String = "EUCLIDEAN", idCol: String = "vec_id",
      vecCol: String = "embedding", centIdCol: String = "cell",
      centVecCol: String = "centroid"): DataFrame =
    Ann.ivfIndex(points,
      centroids.select(col(centIdCol).as(idCol), col(centVecCol).as(vecCol)),
      metric, idCol, vecCol)

  /** Prototypicality scores: each point's distance to its OWN nearest
    * centroid — (id, cell, proto), proto rounded to 6 decimals (the
    * cross-engine contract shared with lloyd's centroids). Same zero-shuffle
    * broadcast argmin as [[assign]], but the winning distance is kept — the
    * "how typical of its cluster is this example" signal SSL-prototype
    * pruning ranks on.
    */
  def protoScores(points: DataFrame, centroids: DataFrame,
      metric: String = "COSINE", idCol: String = "vec_id",
      vecCol: String = "embedding", centIdCol: String = "cell",
      centVecCol: String = "centroid"): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    val cents: Array[(Long, Array[Float])] = centroids
      .select(col(centIdCol).cast("long"), col(centVecCol).cast("array<float>"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    require(cents.nonEmpty, "protoScores: empty centroid set")
    val bc = spark.sparkContext.broadcast(cents)
    val mid = DistanceKernels.metricId(metric)
    points.select(col(idCol).cast("long"), col(vecCol).cast("array<float>"))
      .as[(Long, Array[Float])]
      .map { case (id, vec) =>
        val cs = bc.value
        var bestCell = -1L; var bestD = Double.MaxValue; var i = 0
        while (i < cs.length) { // ascending scan + strict < = lowest-cell ties
          val dd = DistanceKernels.computeArrays(vec, cs(i)._2, mid)
          if (dd < bestD) { bestD = dd; bestCell = cs(i)._1 }
          i += 1
        }
        (id, bestCell, math.rint(bestD * 1e6) / 1e6)
      }
      .toDF(idCol, centIdCol, "proto")
  }

  /** D4-style prototypicality pruning (the SSL-prototypes step of Tirumala
    * et al. 2023, arXiv:2308.12284): per cluster, DROP the
    * `ceil(dropFrac * |cell|)` points closest to the centroid — the most
    * prototypical examples carry the least marginal information once the
    * cluster is represented — and keep the diverse remainder as
    * (id, cell, proto).
    *
    * Scale shape: scoring is the zero-shuffle broadcast argmin above; the
    * prune itself is ONE cell-keyed window exchange carrying only
    * (id, cell, proto) scalars — the vector column never crosses a shuffle.
    * Per-cell rank + count share the single Exchange+Sort. Cell sizes are
    * ~n/k rows, so the per-cell sort is bounded by the cluster granularity
    * the caller picked (at 100 TB, k is tens of thousands of cells).
    * Deterministic: ranks order by (round-6 proto, id), so the kept set is
    * partition- and engine-independent.
    */
  def prototypicalityPrune(points: DataFrame, centroids: DataFrame,
      dropFrac: Double, metric: String = "COSINE", idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(dropFrac >= 0.0 && dropFrac < 1.0,
      s"dropFrac must be in [0, 1), got $dropFrac")
    require(idCol != "_rnk" && idCol != "_cnt",
      s"idCol collides with a reserved rank column: $idCol")
    val scored = protoScores(points, centroids, metric, idCol, vecCol)
    import org.apache.spark.sql.expressions.Window
    val cellW = Window.partitionBy("cell")
    scored
      .withColumn("_rnk",
        row_number().over(cellW.orderBy(col("proto"), col(idCol))))
      .withColumn("_cnt", count(lit(1)).over(cellW))
      .filter(col("_rnk") > ceil(col("_cnt") * lit(dropFrac)))
      .drop("_rnk", "_cnt")
  }

  /** Cluster-balanced subsample: the `perCell` LOWEST-id members of every
    * cell — the diversity-sampling step after clustering (take a bounded,
    * deterministic representative set per cluster instead of frequency-
    * weighted random rows). Per-cell state is a bounded heap of `perCell`
    * ids (map-side combined TopK aggregate), NOT a per-cell window sort —
    * with k cells over a 100TB corpus a `Window.partitionBy(cell)` sorts
    * n/k rows per cell; the heap keeps `perCell` ids.
    */
  def clusterSample(assigned: DataFrame, perCell: Int,
      idCol: String = "id", cellCol: String = "cell"): DataFrame = {
    require(perCell > 0, s"perCell must be positive, got $perCell")
    // ids ≤ 2^53 are exact in double (vec ids are; require to keep it honest)
    assigned
      .groupBy(col(cellCol))
      .agg(graft.functions.TopKPairs.topKPairs(
        col(idCol).cast("double"), col(idCol).cast("long"), perCell).as("topk"))
      .select(col(cellCol), explode(col("topk")).as("pair"))
      .select(col(cellCol), col("pair.id").as(idCol))
  }
}
