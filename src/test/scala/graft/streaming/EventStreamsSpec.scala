package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.streaming.EventStreams.Event

/** Differential tests: the streaming path must produce exactly the batch
  * path's results once the watermark closes all windows.
  */
class EventStreamsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  private val eventSeq: Seq[Event] = Seq(
    Event(0, ts(5), 1, "click", 1.0),
    Event(1, ts(12), 1, "click", 2.0),
    Event(2, ts(75), 1, "buy", 3.0),   // >30min gap -> new session, next hour
    Event(3, ts(80), 2, "click", 4.0),
    Event(4, ts(200), 1, "click", 5.0), // far future event closes watermarks
    Event(5, ts(290), 9, "flush", 0.0))

  test("stream-stream preceding-events join equals batch exactly (multi-batch)") {
    // errors at 12/75/80; clicks inside and outside the 5-min windows
    val rows = Seq(
      Event(10, ts(8), 1, "click", 1.0),   // 4 min before error 11 -> match
      Event(11, ts(12), 1, "error", 0.0),
      Event(12, ts(12), 1, "click", 2.0),  // same minute -> match
      Event(13, ts(40), 1, "click", 3.0),  // 35 min before error 14 -> NO
      Event(14, ts(75), 1, "error", 0.0),
      Event(15, ts(74), 3, "click", 4.0),  // in-window time, OTHER user -> NO
      Event(16, ts(76), 2, "error", 0.0),
      Event(17, ts(73), 2, "click", 5.0),  // 3 min before error 16 -> match
      Event(18, ts(300), 9, "flush", 0.0))
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val errors = (df: org.apache.spark.sql.DataFrame) =>
      df.filter(col("event_type") === "error")
    val clicks = (df: org.apache.spark.sql.DataFrame) =>
      df.filter(col("event_type") === "click")
    val batchDf = rows.toDF()
    val want = canon(EventStreams.precedingEventsJoin(
      errors(batchDf), clicks(batchDf), windowMinutes = 5))
    assert(want == Set((1L, 11L, 10L, 1.0), (1L, 11L, 12L, 2.0),
      (2L, 16L, 17L, 5.0)))

    // multi-batch file stream: three files, maxFilesPerTrigger=1
    val dir = java.nio.file.Files.createTempDirectory("ss-join").toString
    rows.grouped(3).zipWithIndex.foreach { case (g, i) =>
      g.toDF().write.mode("overwrite").parquet(s"$dir/f$i")
    }
    def stream() = spark.readStream.schema(batchDf.schema)
      .option("maxFilesPerTrigger", "1").option("recursiveFileLookup", "true")
      .parquet(dir)
    // the watermark must exceed the stream's max DISORDER: click 17
    // (ts 73) arrives in the batch after one carrying ts 75 — a 1-minute
    // watermark would discard it as late and silently lose the match
    val joined = EventStreams.precedingEventsJoin(
      errors(stream()), clicks(stream()), windowMinutes = 5,
      watermark = "10 minutes")
    val q = joined.writeStream.format("memory").queryName("ssj")
      .outputMode(OutputMode.Append()).start()
    try { q.processAllAvailable() } finally q.stop()
    assert(canon(spark.table("ssj")) == want,
      "inner-join matches must emit eagerly; none may be lost to eviction")
  }

  test("left-outer stream-stream join: null rows held until watermark eviction, then equal batch") {
    // error 14 has no in-window click (13 is 35 min early) -> null row;
    // error 19 sits beyond the phase-1 watermark -> its null row is HELD;
    // 90/92 + 91/93 are watermark-advancing sentinels on BOTH sides (the
    // global watermark is the min over both inputs, and each side's
    // watermark node only sees its own filtered rows)
    val base = Seq(
      Event(10, ts(8), 1, "click", 1.0),
      Event(11, ts(12), 1, "error", 0.0),
      Event(12, ts(12), 1, "click", 2.0),
      Event(13, ts(40), 1, "click", 3.0),
      Event(14, ts(75), 1, "error", 0.0),
      Event(17, ts(73), 2, "click", 5.0),
      Event(16, ts(76), 2, "error", 0.0),
      Event(19, ts(295), 4, "error", 0.0),
      Event(90, ts(300), 8, "error", 0.0),
      Event(91, ts(300), 9, "click", 9.0))
    val tail = Seq(
      Event(92, ts(400), 8, "error", 0.0),
      Event(93, ts(400), 9, "click", 9.0))
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSet
    def errors(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("event_type") === "error")
    def clicks(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("event_type") === "click")
    val allDf = (base ++ tail).toDF()
    val want = canon(EventStreams.precedingEventsJoin(
      errors(allDf), clicks(allDf), windowMinutes = 5, joinType = "left_outer"))
    val nullRow = (id: Long, uid: Long) => (uid, id, None, None)
    assert(want == Set((1L, 11L, Some(10L), Some(1.0)), (1L, 11L, Some(12L), Some(2.0)),
      (2L, 16L, Some(17L), Some(5.0)),
      nullRow(14L, 1L), nullRow(19L, 4L), nullRow(90L, 8L), nullRow(92L, 8L)))

    val mem = MemoryStream[Event](spark)
    val joined = EventStreams.precedingEventsJoin(
      errors(mem.toDF()), clicks(mem.toDF()), windowMinutes = 5,
      watermark = "10 minutes", joinType = "left_outer")
    val q = joined.writeStream.format("memory").queryName("ssjo")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(base: _*)
      q.processAllAvailable()
      // watermark = 300 - 10 = 290: matches emitted eagerly, 14's null row
      // evicted (75 < 290), but 19 (295) and 90 (300) are still protected —
      // a premature null row here would be WRONG (a click could still come)
      assert(canon(spark.table("ssjo")) ==
        want - nullRow(19L, 4L) - nullRow(90L, 8L) - nullRow(92L, 8L),
        "unmatched rows at/after the watermark must be held, not null-padded")
      mem.addData(tail: _*)
      q.processAllAvailable()
      // watermark = 390: 19 and 90 evict and emit their null rows; the 400
      // sentinel error itself stays held — stream == batch minus exactly
      // the held frontier
      assert(canon(spark.table("ssjo")) == want - nullRow(92L, 8L),
        "watermark advance must flush exactly the evicted unmatched rows")
    } finally q.stop()
  }

  test("firstEventDedup: stream equals batch, then READMITS a beyond-watermark straggler") {
    val base = Seq(
      Event(1, ts(10), 1, "click", 1.0),
      Event(2, ts(12), 1, "click", 2.0), // in-window duplicate — dropped
      Event(3, ts(15), 1, "view", 3.0),
      Event(5, ts(40), 9, "page", 9.0))  // advances the watermark to 30
    // event time 35 is ABOVE the watermark (30) but its key's dedup state
    // expired at firstSeen(10) + delay(10) = 20 < 30 — the duplicate is
    // readmitted. Bounded state is exactly this trade.
    val straggler = Seq(Event(4, ts(35), 1, "click", 4.0))

    val batchIds = EventStreams.firstEventDedup((base ++ straggler).toDF(),
        watermark = "10 minutes")
      .select("event_id").as[Long].collect().toSet
    assert(batchIds == Set(1L, 3L, 5L), "batch keeps the least (ts, id) per key")

    val mem = MemoryStream[Event](spark)
    val deduped = EventStreams.firstEventDedup(mem.toDF(), watermark = "10 minutes")
    val q = deduped.writeStream.format("memory").queryName("dedup_first")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(base: _*)
      q.processAllAvailable()
      assert(spark.table("dedup_first").select("event_id").as[Long].collect().toSet
        == Set(1L, 3L, 5L), "stream == batch when arrival respects event order")
      mem.addData(straggler: _*)
      q.processAllAvailable()
      assert(spark.table("dedup_first").select("event_id").as[Long].collect().toSet
        == Set(1L, 3L, 5L, 4L),
        "a duplicate arriving after its key's state evicted must be readmitted")
    } finally q.stop()
  }

  test("streaming hourlyRollup equals batch hourlyRollup") {
    val mem = MemoryStream[Event](spark)
    mem.addData(eventSeq: _*)
    val q = EventStreams.hourlyRollup(mem.toDF(), watermark = "1 minute")
    val query = q.writeStream.format("memory").queryName("hr").outputMode(OutputMode.Append()).start()
    try { query.processAllAvailable() } finally query.stop()
    val streamed = spark.table("hr").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val batch = EventStreams.hourlyRollup(eventSeq.toDF()).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    // append mode emits only watermark-closed windows; those must match batch
    assert(streamed.nonEmpty && streamed.subsetOf(batch))
    // every window strictly before the max event time must have been emitted
    val closed = batch.filter(_._1 < "2024-01-01 04:00:00")
    assert(closed.subsetOf(streamed))
  }

  test("streaming sessionize equals batch sessionizeBatch for closed sessions") {
    val mem = MemoryStream[Event](spark)
    mem.addData(eventSeq: _*)
    val sessions = EventStreams.sessionize(
      mem.toDF().withWatermark("ts", "1 minute").as[Event], gapMinutes = 30)
    val query = sessions.writeStream.format("memory").queryName("sess")
      .outputMode(OutputMode.Append()).start()
    try { query.processAllAvailable() } finally query.stop()
    val streamed = spark.table("sess").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getTimestamp(2).toString, r.getInt(3)))
      .toSet
    val batch = EventStreams.sessionizeBatch(eventSeq.toDF(), gapMinutes = 30).collect()
      .map(r => (r.getLong(0), r.getTimestamp(2).toString, r.getTimestamp(3).toString,
        r.getLong(4).toInt)).toSet
    assert(streamed.subsetOf(batch), s"streamed=$streamed\nbatch=$batch")
    // user 1's first two sessions and user 2's session are closed by the flush
    assert(streamed.exists(s => s._1 == 1L && s._4 == 2)) // 2-event session
    assert(streamed.exists(s => s._1 == 2L && s._4 == 1))
  }

  test("sessionize is µs-exact: same-ms/different-µs events, stream == batch") {
    // two events exactly ONE MICROSECOND past the 30-min gap: a ms-grained
    // compare (the pre-r14 bug) merges them into one session; µs math
    // splits them. Bounds must carry micros through to the output.
    def tsUs(minute: Int, us: Int): Timestamp = {
      val t = ts(minute)
      t.setNanos(us * 1000)
      t
    }
    val rows = Seq(
      Event(0, tsUs(5, 500), 1, "click", 1.0),
      Event(1, tsUs(35, 501), 1, "click", 2.0), // gap = 30min + 1µs -> split
      Event(2, tsUs(35, 400), 2, "click", 3.0),
      Event(3, tsUs(65, 400), 2, "click", 4.0), // gap = exactly 30min -> merge
      Event(4, ts(400), 9, "flush", 0.0))       // closes all watermarks
    val batch = EventStreams.sessionizeBatch(rows.toDF(), gapMinutes = 30).collect()
      .map(r => (r.getLong(0), r.getTimestamp(2).toString, r.getTimestamp(3).toString,
        r.getLong(4).toInt)).toSet
    // user 1 split (two 1-event sessions), user 2 merged (one 2-event session)
    assert(batch.count(s => s._1 == 1L && s._4 == 1) == 2, s"batch=$batch")
    assert(batch.exists(s => s._1 == 2L && s._4 == 2), s"batch=$batch")
    // µs survive into the session bounds
    assert(batch.exists(s => s._2.endsWith("00:05:00.0005")), s"batch=$batch")

    val mem = MemoryStream[Event](spark)
    mem.addData(rows: _*)
    val sessions = EventStreams.sessionize(
      mem.toDF().withWatermark("ts", "1 minute").as[Event], gapMinutes = 30)
    val query = sessions.writeStream.format("memory").queryName("sess_us")
      .outputMode(OutputMode.Append()).start()
    try { query.processAllAvailable() } finally query.stop()
    val streamed = spark.table("sess_us").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getTimestamp(2).toString,
        r.getInt(3))).toSet
    assert(streamed.subsetOf(batch), s"streamed=$streamed\nbatch=$batch")
    assert(streamed.count(s => s._1 == 1L && s._4 == 1) == 2,
      s"stream must split the 30min+1µs gap: $streamed")
    assert(streamed.exists(s => s._1 == 2L && s._4 == 2),
      s"stream must merge the exactly-30min gap: $streamed")
  }

  test("file-source streaming over the events table equals batch (T5)") {
    val dir = "/root/testdata/sf0.001"
    val batchEvents = graft.Tables.events(spark, dir)
    // file-source stream: ns timestamps forbid direct parquet streaming, so
    // stage a µs-normalized copy (what any ingest job would produce)
    val staged = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      s"ev-stream-${System.nanoTime()}").toString
    batchEvents.write.parquet(staged)
    val stagedBatch = spark.read.parquet(staged)
    val stream = EventStreams.readEventsStream(spark, staged, stagedBatch)
    val q = EventStreams.hourlyRollup(stream)
    val query = q.writeStream.format("memory").queryName("hr_file")
      .outputMode(OutputMode.Complete()).start()
    try { query.processAllAvailable() } finally query.stop()
    val streamed = spark.table("hr_file").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val batch = EventStreams.hourlyRollup(batchEvents).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(streamed == batch)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(staged))
  }

  test("progress reporter ticks at the record cadence (T4)") {
    val ticks = new java.util.concurrent.atomic.AtomicInteger(0)
    val rep = new ProgressReporter(spark, everyRecords = 1000, everyMillis = 60000)(
      _ => ticks.incrementAndGet())
    try {
      graft.Tables.events(spark, "/root/testdata/sf0.001").count()
      // listener bus is async — poll briefly for delivery
      val deadline = System.currentTimeMillis() + 10000
      while (rep.totalRecords < 1000 && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(rep.totalRecords >= 1000)
      assert(ticks.get() >= 1)
    } finally rep.close()
  }

  test("batch sessionization splits on the gap boundary exactly") {
    val df = Seq(
      Event(0, ts(0), 7, "a", 1.0),
      Event(1, ts(30), 7, "a", 1.0),  // exactly 30min gap -> same session
      Event(2, ts(61), 7, "a", 1.0)   // 31min -> new session
    ).toDF()
    val sessions = EventStreams.sessionizeBatch(df).orderBy("session_no").collect()
    assert(sessions.length == 2)
    assert(sessions(0).getAs[Long]("n_events") == 2)
    assert(sessions(1).getAs[Long]("n_events") == 1)
  }

  test("streamingFunnel: multi-batch stream equals the batch greedy-earliest walk") {
    // user 1 converts all three steps; user 2's click precedes its view
    // (never converts step 2); user 3 stalls after view
    val funnelEvents: Seq[Event] = Seq(
      Event(0, ts(1), 1, "view", 0.0), Event(1, ts(5), 1, "click", 0.0),
      Event(2, ts(9), 1, "buy", 0.0),
      Event(3, ts(2), 2, "click", 0.0), Event(4, ts(4), 2, "view", 0.0),
      Event(5, ts(3), 3, "view", 0.0), Event(6, ts(7), 3, "view", 0.0))
    val steps = Seq("view", "click", "buy")

    // batch path (single group pass)
    val batch = EventStreams.streamingFunnel(funnelEvents.toDS(), steps)
      .collect().map(c => (c.user_id, c.step, c.event_type, c.conv_ts.toString)).toSet
    assert(batch == Set(
      (1L, 1, "view", ts(1).toString), (1L, 2, "click", ts(5).toString),
      (1L, 3, "buy", ts(9).toString),
      (2L, 1, "view", ts(4).toString),
      (3L, 1, "view", ts(3).toString)), batch.toString)
    // agreement with Funnel.funnel step counts
    val counts = graft.operators.Funnel.funnel(funnelEvents.toDF(), steps)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(counts == Map(1 -> 3L, 2 -> 1L, 3 -> 1L), counts.toString)

    // multi-micro-batch stream with per-user ordered arrival: state must
    // carry the step index ACROSS batches (user 1's click and buy arrive
    // in later batches)
    val mem = MemoryStream[Event](spark)
    val conv = EventStreams.streamingFunnel(mem.toDS(), steps)
    val query = conv.writeStream.format("memory").queryName("funl")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(Event(0, ts(1), 1, "view", 0.0), Event(3, ts(2), 2, "click", 0.0))
      query.processAllAvailable()
      mem.addData(Event(1, ts(5), 1, "click", 0.0), Event(4, ts(4), 2, "view", 0.0),
        Event(5, ts(3), 3, "view", 0.0))
      query.processAllAvailable()
      mem.addData(Event(2, ts(9), 1, "buy", 0.0), Event(6, ts(7), 3, "view", 0.0))
      query.processAllAvailable()
    } finally query.stop()
    val streamed = spark.table("funl").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getTimestamp(3).toString))
      .toSet
    assert(streamed == batch, s"streamed=$streamed")
  }
}
