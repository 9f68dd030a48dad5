package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Count-Min sketch: the one-sided error guarantee, exactness on a
  * collision-free grid, partition-independence of the build, and the
  * no-false-negative property of heavyHitters.
  */
class CmsSpec extends SparkSpec {

  private lazy val docs =
    graft.Tables.documents(spark, "/root/testdata/sf0.001").cache()

  private lazy val toks = docs
    .select(explode(split(lower(col("text")), " ")).as("term"))
    .filter(col("term") =!= "").cache()

  private lazy val exact: Map[String, Long] =
    toks.groupBy("term").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("estimates are >= true counts (one-sided error), even on a tiny grid") {
    val grid = Cms.build(toks, "term", depth = 3, width = 8)
    val est = Cms.estimates(toks, grid, depth = 3, termCol = "term").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    for ((t, e) <- est) assert(e >= exact(t), s"term '$t': est $e < true ${exact(t)}")
  }

  test("a collision-free grid estimates exactly") {
    // 2^16 buckets x 4 rows for ~31 terms: min over rows collision-free
    val grid = Cms.build(toks, "term", depth = 4, width = 1 << 16)
    val est = Cms.estimates(toks, grid, depth = 4, termCol = "term").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est == exact)
  }

  test("build is partition-independent (Long addition, no order dependence)") {
    val a = Cms.build(toks.repartition(7), "term", depth = 3, width = 32)
    val b = Cms.build(toks.coalesce(1), "term", depth = 3, width = 32)
    assert(a.toSeq == b.toSeq)
  }

  test("heavyHitters never misses a true heavy hitter") {
    val threshold = 200L
    val trueHh = exact.filter(_._2 >= threshold).keySet
    val got = Cms.heavyHitters(docs, "text", depth = 3, width = 16,
      threshold = threshold).collect().map(_.getString(0)).toSet
    assert(trueHh.subsetOf(got),
      s"missed true heavy hitters: ${trueHh.diff(got)}")
  }

  test("grid total per row equals the token count (every occurrence lands once per row)") {
    val n = toks.count()
    val depth = 3; val width = 16
    val grid = Cms.build(toks, "term", depth, width)
    for (j <- 0 until depth) {
      val rowSum = (0 until width).map(p => grid(j * width + p)).sum
      assert(rowSum == n, s"row $j sums to $rowSum, expected $n")
    }
  }
}
