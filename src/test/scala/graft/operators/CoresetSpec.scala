package graft.operators

import graft.SparkSpec

/** k-center greedy: sequential-reference parity, non-increasing radii,
  * seed/tie determinism, and the fewer-than-k stop.
  */
class CoresetSpec extends SparkSpec {
  import spark.implicits._

  private def r6(x: Double) = java.math.BigDecimal.valueOf(x)
    .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  private def l2(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0
    for (i <- a.indices) {
      val d = a(i).toDouble - b(i).toDouble; s += d * d
    }
    math.sqrt(s)
  }

  private val pts: Seq[(Long, Array[Float])] = (0L until 40L).map { i =>
    (i, Array.tabulate(6)(d => math.sin(i * 13 + d * 5).toFloat))
  }

  test("matches a sequential greedy reference (rounded argmax, id ties)") {
    val k = 6
    var rest = pts.drop(1).toList
    var centers = List(pts.head)
    var mind = rest.map(p => p._1 -> r6(l2(p._2, pts.head._2))).toMap
    val want = Seq((1, 0L, 0.0)) ++ (2 to k).map { r =>
      val (bid, bd) = rest.map(p => (p._1, mind(p._1)))
        .maxBy { case (id, d) => (d, -id.toDouble) }
      val bvec = rest.find(_._1 == bid).get._2
      rest = rest.filterNot(_._1 == bid)
      centers ::= (bid, bvec)
      mind = rest.map(p =>
        p._1 -> math.min(mind(p._1), r6(l2(p._2, bvec)))).toMap
      (r, bid, bd)
    }
    val got = Coreset.kCenterGreedy(pts.toDF("vec_id", "embedding"),
        "vec_id", "embedding", k)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
      .sortBy(_._1)
    assert(got == want)
  }

  test("coverage radii are non-increasing after the seed") {
    val ds = Coreset.kCenterGreedy(pts.toDF("vec_id", "embedding"),
        "vec_id", "embedding", k = 8)
      .collect().sortBy(_.getInt(0)).map(_.getDouble(2))
    ds.drop(1).sliding(2).foreach { w =>
      if (w.length == 2) assert(w(0) >= w(1), s"radii increased: ${ds.toSeq}")
    }
  }

  test("kCenterPerGroup matches the global greedy run per group") {
    import spark.implicits._
    val grouped = pts.map { case (i, v) => (i % 3, i, v) }
      .toDF("grp", "vec_id", "embedding")
    val k = 4
    val got = Coreset.kCenterPerGroup(grouped, "grp", "vec_id", "embedding", k)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val want = (0L until 3L).flatMap { g =>
      Coreset.kCenterGreedy(
        grouped.filter(org.apache.spark.sql.functions.col("grp") === g),
        "vec_id", "embedding", k)
        .collect().map(r => (g, r.getInt(0), r.getLong(1), r.getDouble(2)))
    }.toSet
    assert(got == want)
  }

  test("kCenterPerGroup rejects a group past maxGroupSize") {
    import spark.implicits._
    val big = (0L until 30L).map(i => (1L, i, Array(1f, i.toFloat)))
      .toDF("grp", "vec_id", "embedding")
    val e = intercept[org.apache.spark.SparkException] {
      Coreset.kCenterPerGroup(big, "grp", "vec_id", "embedding", k = 2,
        maxGroupSize = 10).collect()
    }
    assert(e.getMessage.contains("maxGroupSize") ||
      (e.getCause != null && e.getCause.getMessage.contains("maxGroupSize")))
  }

  test("k larger than the input stops at n distinct picks, seeded at the lowest id") {
    val small = pts.take(3)
    val got = Coreset.kCenterGreedy(small.toDF("vec_id", "embedding"),
        "vec_id", "embedding", k = 10)
      .collect().sortBy(_.getInt(0))
    assert(got.length == 3)
    assert(got(0).getLong(1) == 0L && got(0).getDouble(2) == 0.0)
    assert(got.map(_.getLong(1)).distinct.length == 3)
  }
}
