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
  final case class SessionState(start: Long, last: Long, n: Int, total: Double)
  final case class Session(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Int, total_value: Double)

  /** Gap-based sessionization (30-min inactivity) via
    * flatMapGroupsWithState — the custom-state path (X4-adjacent). Emits a
    * session when the gap closes it or the state times out.
    */
  def sessionize(events: Dataset[Event], gapMinutes: Int = 30): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60 * 1000L
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var cur = state.getOption
          val out = scala.collection.mutable.ArrayBuffer.empty[Session]
          sorted.foreach { e =>
            val t = e.ts.getTime
            cur match {
              case Some(st) if t - st.last <= gapMs =>
                cur = Some(st.copy(last = t, n = st.n + 1, total = st.total + e.value))
              case Some(st) =>
                out += Session(userId, new Timestamp(st.start), new Timestamp(st.last), st.n, st.total)
                cur = Some(SessionState(t, t, 1, e.value))
              case None =>
                cur = Some(SessionState(t, t, 1, e.value))
            }
          }
          if (state.hasTimedOut) {
            cur.foreach(st =>
              out += Session(userId, new Timestamp(st.start), new Timestamp(st.last), st.n, st.total))
            state.remove()
          } else {
            cur.foreach { st =>
              state.update(st)
              state.setTimeoutTimestamp(st.last + gapMs)
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
    val gapMs = gapMinutes * 60 * 1000L
    val marked = events.select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_millis(col("ts")) - unix_millis(col("prev_ts")) > gapMs, 1L).otherwise(0L))
      .withColumn("session_no", sum("new_session").over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
    marked.groupBy("user_id", "session_no")
      .agg(
        min("ts").as("session_start"), max("ts").as("session_end"),
        count(lit(1)).as("n_events"), round(sum("value"), 2).as("total_value"))
  }
}
