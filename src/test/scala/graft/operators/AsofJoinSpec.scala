package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** As-of join semantics: boundary (<=), ties (greatest tie id), null key /
  * time rules, payload emission, collision guard, hot-key linearity.
  */
class AsofJoinSpec extends SparkSpec {

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private def leftDf(rows: (String, Long)*) = {
    import spark.implicits._
    rows.map { case (k, t) => (k, ts(t)) }.toDF("k", "t")
  }

  private def rightDf(rows: (String, Long, Long, Double)*) = {
    import spark.implicits._
    rows.map { case (k, t, id, v) => (k, ts(t), id, v) }.toDF("k", "t", "id", "v")
  }

  private def run(l: org.apache.spark.sql.DataFrame, r: org.apache.spark.sql.DataFrame) =
    AsofJoin.asof(l, r, keyCol = "k", timeCol = "t", tieCol = "id",
        payloadCols = Seq("id", "v"))
      .select("k", "t", "asof_id", "asof_v")

  test("most recent right row at-or-before each left time, per key") {
    val l = leftDf(("a", 5L), ("a", 25L), ("b", 10L), ("c", 10L))
    val r = rightDf(("a", 3L, 1L, 0.1), ("a", 10L, 2L, 0.2), ("a", 20L, 3L, 0.3),
      ("b", 10L, 4L, 0.4), ("b", 11L, 5L, 0.5))
    val got = run(l, r).collect().map(x =>
      (x.getString(0), x.getTimestamp(1).getTime / 1000, Option(x.get(2)), Option(x.get(3))))
      .toSet
    assert(got == Set(
      ("a", 5L, Some(1L), Some(0.1)),   // strictly-before match
      ("a", 25L, Some(3L), Some(0.3)),  // latest of several
      ("b", 10L, Some(4L), Some(0.4)),  // boundary: right AT left time qualifies
      ("c", 10L, None, None)))          // no right rows for the key
  }

  test("ties on (key, time) resolve to the greatest tie id") {
    val l = leftDf(("a", 10L))
    val r = rightDf(("a", 10L, 7L, 0.7), ("a", 10L, 9L, 0.9), ("a", 10L, 8L, 0.8))
    val got = run(l, r).collect()(0)
    assert(got.getLong(2) == 9L && got.getDouble(3) == 0.9)
  }

  test("null right keys/times never qualify; null left key/time gets null asof") {
    import spark.implicits._
    val l = Seq(("a", Option(10L)), (null, Option(10L)), ("a", None))
      .map { case (k, t) => (k, t.map(ts).orNull) }.toDF("k", "t")
    val r = Seq((null, Option(1L), 1L, 0.1), ("a", None, 2L, 0.2), ("a", Option(4L), 3L, 0.3))
      .map { case (k, t, id, v) => (k, t.map(ts).orNull, id, v) }.toDF("k", "t", "id", "v")
    val got = run(l, r).collect()
      .map(x => (Option(x.getString(0)), Option(x.getTimestamp(1)).map(_.getTime / 1000),
        Option(x.get(2)))).toSet
    assert(got == Set(
      (Some("a"), Some(10L), Some(3L)), // only the non-null right row matches
      (None, Some(10L), None),          // null left key: no match
      (Some("a"), None, None)))         // null left time: no match
  }

  test("left rows always survive (row count preserved) and columns ride through") {
    val l = leftDf(("a", 1L), ("a", 2L), ("z", 3L)).withColumn("extra", lit("x"))
    val r = rightDf(("a", 1L, 1L, 0.5))
    val out = AsofJoin.asof(l, r, "k", "t", "id", Seq("v"))
    assert(out.count() == 3)
    assert(out.columns.toSeq == Seq("k", "t", "extra", "asof_v"))
  }

  test("only requested payload columns are emitted (tie col not implied)") {
    val out = AsofJoin.asof(leftDf(("a", 5L)), rightDf(("a", 1L, 1L, 0.1)),
      "k", "t", "id", Seq("v"))
    assert(out.columns.toSeq == Seq("k", "t", "asof_v"))
  }

  test("output-name collision with a left column is rejected up front") {
    val l = leftDf(("a", 5L)).withColumn("asof_v", lit(1))
    val e = intercept[IllegalArgumentException] {
      AsofJoin.asof(l, rightDf(("a", 1L, 1L, 0.1)), "k", "t", "id", Seq("v"))
    }
    assert(e.getMessage.contains("asof_v"))
  }

  test("hot key: one skewed key with many rows on both sides stays correct") {
    import spark.implicits._
    val l = (0 until 2000).map(i => ("hot", ts(i * 2L))).toDF("k", "t")
    val r = (0 until 2000).map(i => ("hot", ts(i * 2L + 1), i.toLong, i.toDouble))
      .toDF("k", "t", "id", "v")
    val got = run(l, r).collect()
    assert(got.length == 2000)
    got.foreach { x =>
      val t = x.getTimestamp(1).getTime / 1000
      if (t == 0L) assert(x.isNullAt(2)) // nothing precedes the first left row
      else assert(x.getLong(2) == (t - 1) / 2) // latest right at 2i+1 <= t
    }
  }
}
