package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Scale-correctness suite (the reference's LargeDataTestSuite discipline):
  * the bounded-heap KNN must produce EXACT results when the base relation is
  * orders of magnitude larger than anything the small-SF queries touch, and
  * partial aggregation must keep the shuffle at heap-size, not pair-count.
  */
class LargeScaleKnnSpec extends SparkSpec {

  test("exact KNN over a 200k-vector generated base matches brute force on sampled queries") {
    val base = Generators.gaussianVectors(spark, 200000, 32, seed = 99)
      .select(col("ordinal").as("vec_id"), col("vector").as("embedding"))
      .repartition(16)
      .cache()
    base.count()

    val queries = base.filter(col("vec_id") < 5)
    val got = Knn.knn(queries, base, k = 10, metric = "EUCLIDEAN", excludeSelf = true)
      .select("query_id", "neighbor_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap

    // driver-side brute force over the same data
    val all = base.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val qs = all.filter(_._1 < 5)
    qs.foreach { case (qid, qv) =>
      val expected = all.iterator
        .filter(_._1 != qid)
        .map { case (id, v) =>
          var s = 0.0; var i = 0
          while (i < v.length) { val d = qv(i).toDouble - v(i).toDouble; s += d * d; i += 1 }
          (math.sqrt(s), id)
        }
        .toSeq.sorted.take(10).map(_._2)
      assert(got(qid) == expected, s"query $qid")
    }

    // the aggregate output is heap-bounded: k entries per query, exactly
    assert(got.values.forall(_.size == 10))
  }

  test("knnChunked equals single-broadcast knn for any chunking") {
    val base = Generators.gaussianVectors(spark, 5000, 16, seed = 7)
      .select(col("ordinal").as("vec_id"), col("vector").as("embedding"))
    val queries = base.filter(col("vec_id") < 40)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val whole = canon(Knn.knn(queries, base, k = 5))
    assert(canon(Knn.knnChunked(queries, base, k = 5, nChunks = 3)) == whole)
    assert(canon(Knn.knnChunked(queries, base, k = 5, nChunks = 7)) == whole)
  }

  test("auto dispatch picks the regime from the query budget, results identical") {
    val base = Generators.gaussianVectors(spark, 5000, 16, seed = 7)
      .select(col("ordinal").as("vec_id"), col("vector").as("embedding"))
    val queries = base.filter(col("vec_id") < 40)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val whole = canon(Knn.knn(queries, base, k = 5))
    // 40 queries x 16 dims fits any sane budget -> broadcast
    val (s1, d1) = Knn.autoPlan(queries, base, k = 5)
    assert(s1 == "broadcast" && canon(d1) == whole)
    // starve the budget to one query-row -> chunked (few chunks)
    val rowBytes = 16L * 4 + 64
    val (s2, d2) = Knn.autoPlan(queries, base, k = 5,
      broadcastBudgetBytes = rowBytes * 20, maxBaseScans = 4)
    assert(s2 == "chunked" && canon(d2) == whole)
    // starve it past maxBaseScans -> partitioned
    val (s3, d3) = Knn.autoPlan(queries, base, k = 5,
      broadcastBudgetBytes = rowBytes * 2, maxBaseScans = 4)
    assert(s3 == "partitioned" && canon(d3) == whole)
    // the partitioned regime raised the sort-based-fallback cliff for the session
    assert(spark.conf.get(
      "spark.sql.objectHashAggregate.sortBased.fallbackThreshold").toInt >= 65536)
  }

  test("knnPartitioned equals single-broadcast knn for any grid") {
    val base = Generators.gaussianVectors(spark, 5000, 16, seed = 7)
      .select(col("ordinal").as("vec_id"), col("vector").as("embedding"))
    val queries = base.filter(col("vec_id") < 40)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val whole = canon(Knn.knn(queries, base, k = 5))
    assert(canon(Knn.knnPartitioned(queries, base, k = 5, nQBlocks = 1, nBBlocks = 1)) == whole)
    assert(canon(Knn.knnPartitioned(queries, base, k = 5, nQBlocks = 3, nBBlocks = 2)) == whole)
    assert(canon(Knn.knnPartitioned(queries, base, k = 5, nQBlocks = 4, nBBlocks = 7)) == whole)
  }

  test("knnPartitioned at 100k base x 2k queries equals the broadcast plan") {
    // a query set past broadcast comfort with every grid block non-trivial;
    // equality proves the grid loses/duplicates no pair. (The 200k x 10k
    // form runs in ScaleSoak — full-size partitioned plan, exactness
    // checked on a sampled-query broadcast rerun — to keep the unit suite
    // fast on local[4].)
    val base = Generators.gaussianVectors(spark, 100000, 16, seed = 21)
      .select(col("ordinal").as("vec_id"), col("vector").as("embedding"))
      .repartition(16)
      .cache()
    base.count()
    val queries = base.filter(col("vec_id") < 2000)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    try {
      val whole = canon(Knn.knn(queries, base, k = 3, metric = "EUCLIDEAN"))
      val blocked = canon(Knn.knnPartitioned(queries, base, k = 3,
        nQBlocks = 8, nBBlocks = 4, metric = "EUCLIDEAN"))
      assert(blocked == whole)
      assert(whole.size == 2000 * 3)
    } finally base.unpersist()
  }

  test("generated corpus survives the full profile->fit->synthesize loop") {
    val dims = 4
    val stats = ProfileStats.perDimStats(
      Generators.gaussianVectors(spark, 20000, dims, seed = 5), "vector").collect()
    assert(stats.length == dims)
    stats.foreach { r =>
      assert(math.abs(r.getAs[Double]("mean")) < 0.05)
      assert(math.abs(r.getAs[Double]("std") - 1.0) < 0.05)
    }
  }
}
