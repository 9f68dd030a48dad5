package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** Funnel + transition-matrix contracts on hand-built event logs where
  * every conversion is computable by eye: strict ordering, greedy-earliest
  * times, the gap bound, and transition probabilities summing to 1.
  */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)

  private def log(rows: (Long, Long, String, Int)*) =
    rows.map { case (id, u, et, m) => (id, u, et, ts(m)) }
      .toDF("event_id", "user_id", "event_type", "ts")

  test("strict order: step counts only events after the previous conversion") {
    val events = log(
      (0L, 1L, "view", 0), (1L, 1L, "click", 5), (2L, 1L, "buy", 9),   // converts all
      (3L, 2L, "click", 1), (4L, 2L, "view", 2), (5L, 2L, "buy", 3),   // click BEFORE view
      (6L, 3L, "view", 0), (7L, 3L, "click", 1))                       // no buy
    val f = Funnel.funnel(events, Seq("view", "click", "buy"))
      .orderBy("step").collect()
    assert(f.map(_.getLong(2)).toSeq == Seq(3L, 2L, 1L), f.mkString(","))
    // user 2's click at t1 precedes their view at t2 — must not count
    assert(f(1).getDouble(3) == math.rint(2.0 / 3 * 1e6) / 1e6 ||
      math.abs(f(1).getDouble(3) - 0.666667) < 1e-9)
  }

  test("greedy-earliest conversion time bounds the next step") {
    // user has view@0, click@2, view@5, click@1 is invalid; the EARLIEST
    // view (t=0) admits click@2 even though a later view@5 would too
    val events = log(
      (0L, 1L, "view", 0), (1L, 1L, "view", 5), (2L, 1L, "click", 2))
    val f = Funnel.funnel(events, Seq("view", "click")).orderBy("step").collect()
    assert(f.map(_.getLong(2)).toSeq == Seq(1L, 1L))
  }

  test("maxGapSeconds drops conversions outside the window") {
    val events = log(
      (0L, 1L, "view", 0), (1L, 1L, "click", 2),    // 120 s gap — inside
      (2L, 2L, "view", 0), (3L, 2L, "click", 30))   // 1800 s gap — outside
    val tight = Funnel.funnel(events, Seq("view", "click"),
      maxGapSeconds = Some(300L)).orderBy("step").collect()
    assert(tight.map(_.getLong(2)).toSeq == Seq(2L, 1L))
    val loose = Funnel.funnel(events, Seq("view", "click"),
      maxGapSeconds = Some(3600L)).orderBy("step").collect()
    assert(loose.map(_.getLong(2)).toSeq == Seq(2L, 2L))
  }

  test("transition matrix: per-from probabilities sum to 1; ties break by event_id") {
    val events = log(
      (0L, 1L, "a", 0), (1L, 1L, "b", 1), (2L, 1L, "a", 2),
      (3L, 2L, "a", 0), (4L, 2L, "a", 0))  // same ts: order by event_id → a->a
    val m = Funnel.transitionMatrix(events).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(m(("a", "b"))._1 == 1L && m(("b", "a"))._1 == 1L && m(("a", "a"))._1 == 1L)
    val fromA = m.filter(_._1._1 == "a").values.map(_._2).sum
    assert(math.abs(fromA - 1.0) < 1e-9, s"P(.|a) sums to $fromA")
  }
}
