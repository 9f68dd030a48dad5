package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.AsofJoin
import graft.streaming.StreamAsof.Tagged

/** The streaming as-of join must equal the batch AsofJoin for every query
  * point the watermark has sealed, independent of micro-batch boundaries —
  * provided arrival disorder stays inside the watermark delay (the standard
  * stateful-streaming contract; later rows are dropped upstream of the
  * function).
  */
class StreamAsofSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  // rights (side 0) and lefts (side 1) across two keys, with boundary-time
  // and pre-first-right queries; tie ids unique
  private val rights = Seq(
    Tagged(0, 1L, ts(10), 100L, 1.0),
    Tagged(0, 1L, ts(20), 101L, 2.0),
    Tagged(0, 1L, ts(20), 102L, 3.0), // same timestamp: greatest tie wins
    Tagged(0, 2L, ts(15), 103L, 4.0))
  private val lefts = Seq(
    Tagged(1, 1L, ts(5), 200L, 0.0),  // before any right -> null match
    Tagged(1, 1L, ts(20), 201L, 0.0), // boundary: right AT 20 qualifies, tie 102
    Tagged(1, 1L, ts(25), 202L, 0.0),
    Tagged(1, 2L, ts(30), 203L, 0.0))
  // far-future rights: advance the watermark past every round-1 query
  private val flush = Seq(
    Tagged(0, 1L, ts(600), 900L, 9.0), Tagged(0, 2L, ts(600), 901L, 9.0))
  // round 2 runs AFTER the watermark passed round 1, so the key-1 right
  // buffer must have pruned to its carried row — these queries prove the
  // carried row still matches
  private val round2 = Seq(
    Tagged(1, 1L, ts(605), 300L, 0.0), // matches the 900 flush row
    Tagged(0, 1L, ts(610), 910L, 10.0),
    Tagged(1, 1L, ts(615), 301L, 0.0)) // matches 910
  private val flush2 = Seq(
    Tagged(0, 1L, ts(1200), 999L, 0.0), Tagged(0, 2L, ts(1200), 998L, 0.0))

  private val everything = rights ++ lefts ++ flush ++ round2 ++ flush2

  private def batchExpected: Set[(Long, Long, Option[Long], Option[Double])] = {
    val l = everything.filter(_.side == 1).map(e => (e.key, e.t, e.tie)).toDF("key", "t", "tie")
    val r = everything.filter(_.side == 0).map(e => (e.key, e.t, e.tie, e.value))
      .toDF("key", "t", "tie", "value")
    AsofJoin.asof(l, r, "key", "t", "tie", Seq("tie", "value"))
      .collect().map(x => (x.getLong(0), x.getLong(2),
        Option(x.get(3)).map(_.asInstanceOf[Long]),
        Option(x.get(4)).map(_.asInstanceOf[Double]))).toSet
  }

  private def collectTable(name: String): Set[(Long, Long, Option[Long], Option[Double])] =
    spark.table(name).collect()
      .map(r => (r.getLong(0), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Double]))).toSet

  test("batch-mode StreamAsof.asof equals AsofJoin.asof exactly") {
    val got = StreamAsof.asof(everything.toDS()).collect()
      .map(m => (m.key, m.tie, m.asof_tie, m.asof_value)).toSet
    assert(got == batchExpected)
    // the semantics the set compare proves piecewise:
    assert(got.contains((1L, 200L, None, None)))              // pre-first-right
    assert(got.contains((1L, 201L, Some(102L), Some(3.0))))   // boundary + tie
    assert(got.contains((1L, 202L, Some(102L), Some(3.0))))
    assert(got.contains((2L, 203L, Some(103L), Some(4.0))))
    assert(got.contains((1L, 300L, Some(900L), Some(9.0))))   // carried row
    assert(got.contains((1L, 301L, Some(910L), Some(10.0))))
  }

  test("streamed matches equal batch, queries arriving before their states") {
    val mem = MemoryStream[Tagged](spark)
    // 2h watermark covers the 25-minute round-1 disorder (lefts reach ts 30
    // before the rights at ts 10-20 arrive)
    val q = StreamAsof.asof(mem.toDS().withWatermark("t", "2 hours"))
    val query = q.writeStream.format("memory").queryName("sasof")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(lefts: _*)
      query.processAllAvailable()
      mem.addData(rights: _*)
      query.processAllAvailable()
      mem.addData(flush: _*)
      query.processAllAvailable()
      mem.addData(round2: _*)
      query.processAllAvailable()
      mem.addData(flush2: _*)
      query.processAllAvailable()
    } finally query.stop()
    val streamed = collectTable("sasof")
    assert(streamed == batchExpected, s"streamed=$streamed\nbatch=$batchExpected")
  }

  test("micro-batch boundaries do not change results (one row per batch)") {
    val mem = MemoryStream[Tagged](spark)
    val q = StreamAsof.asof(mem.toDS().withWatermark("t", "2 hours"))
    val query = q.writeStream.format("memory").queryName("sasof1")
      .outputMode(OutputMode.Append()).start()
    try {
      everything.foreach { e =>
        mem.addData(e)
        query.processAllAvailable()
      }
    } finally query.stop()
    assert(collectTable("sasof1") == batchExpected)
  }
}
