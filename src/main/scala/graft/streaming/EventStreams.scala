package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Structured Streaming over the events table shape (SURVEY.md §2.8: the
  * reference's streaming is chunk-prebuffering, T1-T5 — re-expressed here as
  * progressive ingest; event-time semantics are the engine's extension for
  * the streaming `events` table).
  *
  * Each transform is written against a plain DataFrame so the SAME code
  * serves batch and streaming (`readStream` or `read`); batch equality with
  * the oracled q15 query is what the spec tests pin.
  */
object EventStreams {

  /** File-source stream over an events parquet directory — progressive
    * ingest (maxFilesPerTrigger = the reference's chunked arrival).
    */
  def readEventsStream(spark: SparkSession, dir: String, schemaFrom: DataFrame): DataFrame =
    spark.readStream
      .schema(schemaFrom.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir)

  /** Tumbling-window rollup: per (hour, event_type) counts/sums with a
    * watermark bounding state. Works on batch and streaming frames alike.
    */
  def hourlyRollup(events: DataFrame, watermark: String = "2 hours"): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark("ts", watermark) else events
    src.groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("total_value"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:00:00").as("hour"),
        col("event_type"), col("cnt"), col("total_value"))
  }

  /** Sliding-window event rate: 30-minute windows every 10 minutes. */
  def slidingRate(events: DataFrame, watermark: String = "2 hours"): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark("ts", watermark) else events
    src.groupBy(window(col("ts"), "30 minutes", "10 minutes").as("w"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("window_start"), col("cnt"))
  }

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)
  // STATE-SCHEMA NOTE: startUs/lastUs are event-time MICROseconds (full
  // Spark timestamp precision). Pre-r14 checkpoints stored milliseconds
  // under the same (Long, Long, Int, Double) encoder shape, so a stream
  // restarted from an old checkpoint would silently reinterpret ms as µs
  // (1000× too small) — restart sessionize streams from FRESH checkpoints
  // after upgrading.
  final case class SessionState(startUs: Long, lastUs: Long, n: Int, total: Double)
  final case class Session(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Int, total_value: Double)

  /** Spark timestamps carry microseconds; `getTime` alone truncates to ms.
    * Every stream/batch parity contract in this file compares at FULL
    * precision through these two (the q329 lesson: a ms-truncated compare
    * orders same-ms/different-µs events differently in stream vs batch).
    */
  private def micros(ts: Timestamp): Long =
    ts.getTime * 1000 + (ts.getNanos / 1000) % 1000
  private def tsFromMicros(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000))
    t.setNanos((Math.floorMod(us, 1000000L) * 1000).toInt)
    t
  }

  /** Gap-based sessionization (30-min inactivity) via
    * flatMapGroupsWithState — the custom-state path (X4-adjacent). Emits a
    * session when the gap closes it or the state times out. Ordering,
    * gap math and session bounds are all at MICROsecond precision —
    * exactly [[sessionizeBatch]]'s semantics (EventStreamsSpec pins
    * stream == batch on same-millisecond/different-microsecond events).
    */
  def sessionize(events: Dataset[Event], gapMinutes: Int = 30): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60 * 1000000L
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          val sorted = rows.toSeq.sortBy(e => (micros(e.ts), e.event_id))
          var cur = state.getOption
          val out = scala.collection.mutable.ArrayBuffer.empty[Session]
          def emit(st: SessionState): Unit =
            out += Session(userId, tsFromMicros(st.startUs),
              tsFromMicros(st.lastUs), st.n, st.total)
          sorted.foreach { e =>
            val t = micros(e.ts)
            cur match {
              case Some(st) if t - st.lastUs <= gapUs =>
                cur = Some(st.copy(lastUs = t, n = st.n + 1, total = st.total + e.value))
              case Some(st) =>
                emit(st)
                cur = Some(SessionState(t, t, 1, e.value))
              case None =>
                cur = Some(SessionState(t, t, 1, e.value))
            }
          }
          if (state.hasTimedOut) {
            cur.foreach(emit)
            state.remove()
          } else {
            cur.foreach { st =>
              state.update(st)
              // timeout is wall-watermark driven and ms-grained — round UP
              // so a timeout never fires before the µs-exact gap closes
              state.setTimeoutTimestamp(Math.floorDiv(st.lastUs + gapUs + 999, 1000))
            }
          }
          out.iterator
      }
  }

  /** Batch-mode sessionization with identical semantics (lag-gap windows) —
    * the oracled counterpart used by q17 and the differential test for
    * `sessionize`.
    */
  def sessionizeBatch(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    // gap math at MICROsecond precision — the timestamp's full resolution,
    // and [[sessionize]]'s exact semantics (a ms-grained compare would
    // merge two events straddling the gap by <1 ms)
    val gapUs = gapMinutes * 60 * 1000000L
    val marked = events.select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > gapUs, 1L).otherwise(0L))
      .withColumn("session_no", sum("new_session").over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
    marked.groupBy("user_id", "session_no")
      .agg(
        min("ts").as("session_start"), max("ts").as("session_end"),
        count(lit(1)).as("n_events"), round(sum("value"), 2).as("total_value"))
  }

  /** Per-key sliding-window ANOMALY flags: each event's value z-scored
    * against its own trailing window (the `window` preceding events of the
    * same user, exclusive of self). All window accumulations run over
    * integer CENTS (`round(value·100)`), so the frame sums are bit-exact
    * in any engine and only the final mean/variance divisions and the
    * sqrt are floating point (single correctly-rounded IEEE ops) —
    * engine-replayable to 6 decimals without fp-summation-order risk.
    * Rows with fewer than `minPrev` preceding events emit no z (null) —
    * the warm-up rule. The window is KEYED (one user per frame chain), so
    * no single-partition global window exists in the plan.
    */
  def slidingZScore(events: DataFrame, window: Int = 20, minPrev: Int = 5,
      zThreshold: Double = 3.0): DataFrame = {
    require(window >= minPrev && minPrev >= 2,
      s"need window >= minPrev >= 2, got window=$window minPrev=$minPrev")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(-window, -1)
    val cents = round(col("value") * 100).cast("long")
    val withSums = events
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      .withColumn("_x", cents)
      .withColumn("_n", count(col("_x")).over(w))
      .withColumn("_s1", sum(col("_x")).over(w))
      .withColumn("_s2", sum(col("_x") * col("_x")).over(w))
    // var in cents²: (s2 − s1²/n)/(n−1); z is scale-free so cents cancel
    val mean = col("_s1").cast("double") / col("_n")
    val variance = (col("_s2").cast("double") -
      col("_s1").cast("double") * col("_s1") / col("_n")) / (col("_n") - 1)
    val z = (col("_x").cast("double") - mean) / sqrt(variance)
    withSums
      .withColumn("z", when(col("_n") >= minPrev && variance > 0,
        round(z, 6)).otherwise(lit(null).cast("double")))
      .withColumn("anomaly",
        coalesce(abs(col("z")) > zThreshold, lit(false)))
      .drop("_x", "_n", "_s1", "_s2")
  }

  /** Watermarked STREAM-STREAM inner join: for every left event, the
    * right-side events of the same user in the `windowMinutes` BEFORE it
    * ("what preceded this error") — the one Structured Streaming join
    * class the engine had not yet exercised (q17/q128 use custom state;
    * this is the built-in symmetric-hash stream-stream join). The SAME
    * code serves batch frames (`withWatermark` is a no-op there); on
    * streams the watermark plus the two-sided time bound are exactly what
    * lets Spark EVICT join state — without them a stream-stream join's
    * state grows forever. Inner-join matches emit eagerly (the watermark
    * gates eviction, not output), so a run-to-completion stream equals
    * the batch join row-for-row (EventStreamsSpec pins it).
    *
    * `joinType = "left_outer"` keeps UNMATCHED left events — the
    * training-pipeline side every filter needs ("errors with no
    * preceding click" is a feature, not a dropped row). Outer semantics
    * change the emission rule: a null-padded row can only emit once the
    * watermark proves no matching right event can still arrive (i.e.
    * passes the left event's time), so on a live stream the unmatched
    * tail is HELD until the watermark advances past it — and the
    * watermark advances only from event times that flow through the
    * watermark nodes, which sit AFTER the caller's filters.
    * EventStreamsSpec pins both halves: held-until-eviction, then
    * equality with the batch left join once later events push the
    * watermark across.
    */
  def precedingEventsJoin(left: DataFrame, right: DataFrame,
      windowMinutes: Int, watermark: String = "10 minutes",
      joinType: String = "inner"): DataFrame = {
    require(windowMinutes > 0, s"windowMinutes must be positive: $windowMinutes")
    require(joinType == "inner" || joinType == "left_outer",
      s"joinType must be inner or left_outer: $joinType")
    val l = left.select(col("user_id"), col("ts").as("e_ts"),
        col("event_id").as("e_id"))
      .withWatermark("e_ts", watermark)
    val r = right.select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("c_id"), col("value"))
      .withWatermark("c_ts", watermark)
    l.join(r, col("user_id") === col("c_user") &&
        col("c_ts") >= col("e_ts") - expr(s"INTERVAL $windowMinutes MINUTES") &&
        col("c_ts") <= col("e_ts"), joinType)
      .select(col("user_id"), col("e_id"), col("c_id"), col("value"))
  }

  /** First-occurrence dedup per (user_id, event_type) — the streaming
    * ingest-dedup class (`dropDuplicatesWithinWatermark`), the event-log
    * analogue of the corpus dedup family (`Dedup.exactGroups` keeps one
    * doc per content key; this keeps one event per behavioral key).
    * Relation to [[StreamDedup.firstSeen]] (the content-fingerprint
    * form): same streaming primitive, but THIS operator's batch twin is
    * DETERMINISTIC — least (ts, event_id) per key — where `firstSeen`'s
    * batch fallback (`dropDuplicates`) keeps an arbitrary row; that
    * determinism is what makes q284 oracle-able and what the
    * straggler-readmission spec pins.
    *
    * Batch form (and the q284 oracle): the row with the least (ts,
    * event_id) per key — a KEYED window, never a global one. Streaming
    * form: `dropDuplicatesWithinWatermark`, which keeps the first
    * ARRIVAL and holds per-key state only until the watermark passes the
    * first row's event time plus the delay — the property that makes
    * dedup state BOUNDED at 100 TB (plain `dropDuplicates` on a stream
    * retains every key forever). The two agree exactly when arrival
    * order respects (ts, event_id) within each key and no duplicate
    * arrives after its key's state evicted; a straggler duplicate beyond
    * the watermark is readmitted — that eviction trade is the operator's
    * contract, and EventStreamsSpec pins BOTH halves (agreement, and the
    * readmitted straggler).
    */
  def firstEventDedup(events: DataFrame, watermark: String = "2 hours",
      keyCols: Seq[String] = Seq("user_id", "event_type")): DataFrame = {
    require(keyCols.nonEmpty, "firstEventDedup: need at least one key column")
    if (events.isStreaming)
      events.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(keyCols)
    else {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(keyCols.map(col): _*)
        .orderBy(col("ts"), col("event_id"))
      events.withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1).drop("_rn")
    }
  }

  /** Retention COHORT matrix: users grouped by first-seen day, then per
    * (cohort_day, days since) the count of distinct users active — the
    * standard engagement decay card. Two hash aggregates (first-seen per
    * user, then the matrix); the user-day relation carries only ids and
    * two dates.
    */
  def retentionCohort(events: DataFrame): DataFrame = {
    val firstSeen = events.groupBy("user_id")
      .agg(to_date(min(col("ts"))).as("cohort_day"))
    events.select(col("user_id"), to_date(col("ts")).as("day"))
      .join(firstSeen, "user_id")
      .groupBy(col("cohort_day"), datediff(col("day"), col("cohort_day")).as("age_days"))
      .agg(count_distinct(col("user_id")).as("n_users"))
  }

  // STATE-SCHEMA NOTE: lastUs is MICROseconds (was lastMs pre-r13, same
  // (Int, Long) encoder shape) — a streaming query restarted from a
  // pre-change checkpoint would silently reinterpret stored ms as µs and
  // admit conversions the gap rule should reject; restart funnel streams
  // from FRESH checkpoints after upgrading.
  final case class FunnelState(step: Int, lastUs: Long)
  final case class Conversion(user_id: Long, step: Int, event_type: String,
      conv_ts: Timestamp)

  /** Streaming funnel: per-user state machine emitting one [[Conversion]]
    * per step the user completes. Greedy-earliest (the batch
    * `Funnel.funnel` semantics) is an ONLINE rule over the time-ordered
    * event sequence — step i converts at the first step-i event strictly
    * after the step-(i−1) time — so per-user state is just (step,
    * last-conversion-ms): 12 bytes, bounded by construction, no event
    * buffering. Works on batch Datasets identically (one group pass).
    * Cross-batch parity requires each user's events to ARRIVE in event-
    * time order across micro-batches (within a batch they are sorted
    * here) — the same ordered-arrival caveat as [[firstEventDedup]];
    * EventStreamsSpec pins multi-batch == batch under it.
    */
  def streamingFunnel(events: Dataset[Event], steps: Seq[String]): Dataset[Conversion] = {
    require(steps.nonEmpty, "streamingFunnel: need at least one step")
    import events.sparkSession.implicits._
    val stepArr = steps.toArray
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, Conversion](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (userId: Long, rows: Iterator[Event], state: GroupState[FunnelState]) =>
          // compare at MICROsecond precision (the shared [[micros]]) —
          // the batch twin (Funnel.funnel) compares full timestamps, so a
          // millisecond-truncated compare would convert two same-ms/
          // different-µs events in batch but not here
          val sorted = rows.toSeq.sortBy(e => (micros(e.ts), e.event_id))
          var st = state.getOption.getOrElse(FunnelState(0, Long.MinValue))
          val out = scala.collection.mutable.ArrayBuffer.empty[Conversion]
          sorted.foreach { e =>
            if (st.step < stepArr.length && e.event_type == stepArr(st.step) &&
                (st.step == 0 || micros(e.ts) > st.lastUs)) {
              st = FunnelState(st.step + 1, micros(e.ts))
              out += Conversion(userId, st.step, e.event_type, e.ts)
            }
          }
          state.update(st)
          out.iterator
      }
  }
}
