package graft.operators

import graft.SparkSpec
import graft.functions.DistanceKernels

/** Lloyd's must equal a sequential reference implementing the same
  * deterministic contract (k-lowest-id init, lowest-cell ties, round-6
  * means, empty cells keep their centroid), converge (inertia
  * non-increasing), and be partition-count independent.
  */
class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(7)
  // three planted blobs around (0,0), (5,5), (-5,5)
  private val blobs: Seq[(Long, Array[Float])] = {
    val centers = Seq(Array(0f, 0f), Array(5f, 5f), Array(-5f, 5f))
    (0L until 90L).map { i =>
      val c = centers((i % 3).toInt)
      (i, c.map(x => x + rnd.nextGaussian().toFloat * 0.4f))
    }
  }
  private def df = blobs.toDF("vec_id", "embedding").repartition(7)

  /** Sequential Lloyd's with the exact operator contract. */
  private def reference(pts: Seq[(Long, Array[Float])], k: Int,
      iters: Int): (Array[Array[Float]], Array[Long]) = {
    var cents = pts.sortBy(_._1).take(k).map(_._2).toArray
    val d = cents.head.length
    var counts = new Array[Long](k)
    for (_ <- 0 until iters) {
      val sums = Array.fill(k)(new Array[Double](d))
      counts = new Array[Long](k)
      pts.foreach { case (_, v) =>
        var best = 0; var bestD = Double.MaxValue
        for (i <- 0 until k) {
          val dd = DistanceKernels.computeArrays(v, cents(i),
            DistanceKernels.EUCLIDEAN)
          if (dd < bestD) { bestD = dd; best = i }
        }
        for (j <- 0 until d) sums(best)(j) += v(j)
        counts(best) += 1
      }
      cents = Array.tabulate(k) { i =>
        if (counts(i) == 0L) cents(i)
        else Array.tabulate(d)(j =>
          (math.rint(sums(i)(j) / counts(i) * 1e6) / 1e6).toFloat)
      }
    }
    (cents, counts)
  }

  test("lloyd equals the sequential reference after 5 iterations") {
    val got = Clustering.lloyd(df, k = 3, iters = 5)
      .collect().map(r => (r.getLong(0),
        r.getSeq[Float](1).toArray, r.getLong(2)))
      .sortBy(_._1)
    val (wantC, wantN) = reference(blobs, 3, 5)
    assert(got.map(_._3).toSeq == wantN.toSeq)
    got.zip(wantC).foreach { case ((_, gc, _), wc) =>
      assert(gc.toSeq == wc.toSeq)
    }
    // three tight blobs: each cell holds exactly its blob
    assert(got.map(_._3).toSet == Set(30L))
  }

  test("inertia is non-increasing across iterations") {
    def inertia(iters: Int): Double = {
      val cents = Clustering.lloyd(df, k = 3, iters = iters)
        .collect().map(r => r.getSeq[Float](1).toArray)
      blobs.map { case (_, v) =>
        cents.map(c => math.pow(DistanceKernels.computeArrays(v, c,
          DistanceKernels.EUCLIDEAN), 2)).min
      }.sum
    }
    val seq = (1 to 4).map(inertia)
    assert(seq.sliding(2).forall(p => p(1) <= p(0) + 1e-9), seq.toString)
  }

  test("lloyd is independent of the partition count") {
    val one = Clustering.lloyd(df.repartition(1), k = 3, iters = 3)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1), r.getLong(2))).sortBy(_._1).toSeq
    val many = Clustering.lloyd(df.repartition(13), k = 3, iters = 3)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1), r.getLong(2))).sortBy(_._1).toSeq
    assert(one == many)
  }

  test("an empty cell keeps its previous centroid") {
    // ids 0 and 1 are coincident, so init cells 0 and 1 start at the same
    // point; every tie breaks to the LOWER cell, so cell 1 captures nothing
    // and must keep its init centroid with n_points = 0.
    val pts = Seq(
      (0L, Array(0f, 0f)), (1L, Array(0f, 0f)), (2L, Array(5f, 5f)),
      (3L, Array(0.1f, 0f)), (4L, Array(5.1f, 5f)))
    val d1 = pts.toDF("vec_id", "embedding")
    val after1 = Clustering.lloyd(d1, k = 3, iters = 1)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getLong(2)))
      .sortBy(_._1)
    assert(after1(1)._3 == 0L) // cell 1 is empty after the first pass…
    assert(after1(1)._2.toSeq == Seq(0f, 0f)) // …and kept its init centroid
    // the kept centroid stays live: iteration 2 can re-capture points
    // (here it wins the coincident pair back from cell 0's drifted mean) —
    // parity with the reference proves the whole dance
    val got = Clustering.lloyd(d1, k = 3, iters = 2)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getLong(2)))
      .sortBy(_._1)
    val (wantC, wantN) = reference(pts, 3, 2)
    assert(got.map(_._3).toSeq == wantN.toSeq)
    got.zip(wantC).foreach { case ((_, gc, _), wc) => assert(gc.toSeq == wc.toSeq) }
  }

  test("clusterSample keeps the perCell lowest ids per cell") {
    val init = df.orderBy("vec_id").limit(3)
      .select((org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("vec_id")) - 1)
        .cast("long").as("cell"),
        org.apache.spark.sql.functions.col("embedding").as("centroid"))
    val assigned = Clustering.assign(df, init)
    val got = Clustering.clusterSample(assigned, perCell = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val want = assigned.collect().map(r => r.getLong(2) -> r.getLong(0))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.take(4).toSet).toMap
    assert(got == want)
    assert(got.values.forall(_.size <= 4))
  }

  test("prototypicalityPrune drops the ceil-fraction closest per cell") {
    val cents = Clustering.lloyd(df, k = 3, iters = 2)
    val kept = Clustering.prototypicalityPrune(df, cents, dropFrac = 0.3,
        metric = "EUCLIDEAN")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // sequential reference: round-6 distance to own (argmin) centroid,
    // per-cell sort by (proto, id), drop the first ceil(0.3 * n)
    val cs = cents.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      .sortBy(_._1).map(_._2)
    val scored = blobs.map { case (id, v) =>
      var best = 0; var bestD = Double.MaxValue
      for (i <- cs.indices) {
        val dd = DistanceKernels.computeArrays(v, cs(i), DistanceKernels.EUCLIDEAN)
        if (dd < bestD) { bestD = dd; best = i }
      }
      (id, best.toLong, math.rint(bestD * 1e6) / 1e6)
    }
    val want = scored.groupBy(_._2).flatMap { case (_, members) =>
      val sorted = members.sortBy(m => (m._3, m._1))
      sorted.drop(math.ceil(sorted.size * 0.3).toInt)
    }.toSet
    assert(kept.toSet == want)
    assert(kept.length < blobs.size) // something was actually dropped
    // dropFrac = 0 keeps every point
    assert(Clustering.prototypicalityPrune(df, cents, dropFrac = 0.0,
      metric = "EUCLIDEAN").count() == blobs.size)
    // reserved rank column guard
    intercept[IllegalArgumentException] {
      Clustering.prototypicalityPrune(df, cents, 0.3, idCol = "_rnk")
    }
  }
}
