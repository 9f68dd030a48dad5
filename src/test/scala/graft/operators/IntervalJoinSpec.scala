package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bucketed point-in-interval join vs the naive BETWEEN cross filter: the
  * discretization must lose nothing and duplicate nothing, for any bucket
  * width, including boundary points (half-open [s, e)), bucket-straddling
  * intervals, empty intervals, and equality-key routing.
  */
class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def naive(points: Seq[(Long, Long)], ivs: Seq[(Long, Long, Long, Long)]) =
    (for {
      (u, p) <- points
      (id, iu, s, e) <- ivs
      if u == iu && p >= s && p < e
    } yield (id, u, p)).sorted

  test("equals the naive range join for many bucket widths, no dupes") {
    val rnd = new scala.util.Random(7)
    val points = (1 to 400).map(_ => (rnd.nextInt(3).toLong, rnd.nextInt(1000).toLong))
    val ivs = (1 to 60).map { i =>
      val s = rnd.nextInt(1000).toLong
      (i.toLong, rnd.nextInt(3).toLong, s, s + rnd.nextInt(120).toLong)
    }
    val pdf = points.toDF("user_id", "p").repartition(4)
    val idf = ivs.toDF("iid", "user_id", "s", "e").repartition(3)
    val want = naive(points, ivs)
    for (w <- Seq(1L, 7L, 64L, 1000L, 100000L)) {
      val got = IntervalJoin.pointInInterval(pdf, idf, "p", "s", "e",
          Seq("user_id"), bucketWidth = w)
        .select("iid", "user_id", "p").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
      assert(got == want, s"bucketWidth=$w")
    }
  }

  test("half-open boundaries: start included, end excluded; empty intervals dropped") {
    val pdf = Seq((0L, 10L), (0L, 19L), (0L, 20L)).toDF("k", "p")
    val idf = Seq((1L, 0L, 10L, 20L), (2L, 0L, 15L, 15L)).toDF("iid", "k", "s", "e")
    val got = IntervalJoin.pointInInterval(pdf, idf, "p", "s", "e", Seq("k"), 8L)
      .select("iid", "p").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L), (1L, 19L)))
  }

  test("the plan is an equi-join (SortMerge/Hash), not a nested loop") {
    val pdf = spark.range(1000).select(lit(0L).as("k"), col("id").as("p"))
    val idf = spark.range(50).select(col("id").as("iid"), lit(0L).as("k"),
      (col("id") * 100).as("s"), (col("id") * 100 + 40).as("e"))
    val plan = IntervalJoin.pointInInterval(pdf, idf, "p", "s", "e",
      Seq("k"), 100L).queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), plan)
  }
}
