package graft.operators

import graft.SparkSpec

/** RRF: hand-computed fusion scores, single-list membership, tie-breaks,
  * and the c parameter.
  */
class FusionSpec extends SparkSpec {
  import spark.implicits._

  private def ranking(rows: (Long, Long, Long)*) =
    rows.toDF("query_id", "neighbor_id", "rank")

  test("fusion score is the sum of reciprocal ranks across lists") {
    val a = ranking((1L, 10L, 1L), (1L, 11L, 2L))
    val b = ranking((1L, 11L, 1L), (1L, 12L, 2L))
    val got = Fusion.rrf(Seq(a, b), k = 3, c = 60)
      .collect().map(r => r.getLong(1) -> (r.getInt(2), r.getDouble(3))).toMap
    // 11: 1/62 + 1/61 = 0.032522; 10: 1/61 = 0.016393; 12: 1/62 = 0.016129
    assert(got(11L)._1 == 1 && math.abs(got(11L)._2 - 0.032522) < 1e-6)
    assert(got(10L)._1 == 2 && math.abs(got(10L)._2 - 0.016393) < 1e-6)
    assert(got(12L)._1 == 3 && math.abs(got(12L)._2 - 0.016129) < 1e-6)
  }

  test("equal fused scores break ties by ascending id") {
    val a = ranking((1L, 20L, 1L), (1L, 10L, 2L))
    val b = ranking((1L, 10L, 1L), (1L, 20L, 2L))
    val got = Fusion.rrf(Seq(a, b), k = 2).collect()
      .sortBy(_.getInt(2)).map(_.getLong(1))
    assert(got.toSeq == Seq(10L, 20L))
  }

  test("a candidate repeated WITHIN one list scores its best rank once") {
    val malformed = ranking((1L, 10L, 1L), (1L, 10L, 5L))
    val clean = ranking((1L, 10L, 1L))
    val gm = Fusion.rrf(Seq(malformed), k = 1).collect()(0).getDouble(3)
    val gc = Fusion.rrf(Seq(clean), k = 1).collect()(0).getDouble(3)
    assert(gm == gc)
  }

  test("smaller c weights top ranks more aggressively") {
    val a = ranking((1L, 10L, 1L))
    val s60 = Fusion.rrf(Seq(a), k = 1, c = 60).collect()(0).getDouble(3)
    val s0 = Fusion.rrf(Seq(a), k = 1, c = 0).collect()(0).getDouble(3)
    assert(s60 == 0.016393 && s0 == 1.0)
  }
}
