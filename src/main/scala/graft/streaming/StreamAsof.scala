package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming backward as-of join — the feature-store replay: enrich a stream
  * of query points with the latest state update of the same key at-or-before
  * each query's event time. The streaming leg of [[graft.operators.AsofJoin]]
  * (q100's batch operator); same boundary (`<=`) and tie (greatest tie id)
  * rules.
  *
  * Mechanics: both sides arrive as one TAGGED stream keyed by the join key
  * and processed with `flatMapGroupsWithState`:
  *  - new rows land in per-key buffers (left = queries, right = state
  *    updates);
  *  - a left row EMITS once the watermark passes its event time — at that
  *    point every right row at-or-before it is guaranteed to have arrived,
  *    so the match equals the batch join's (watermark-correctness, the same
  *    contract every Structured Streaming aggregation gives);
  *  - right state then PRUNES to the single latest row at-or-before the
  *    watermark (any other pre-watermark right can never be "latest ≤ t" for
  *    a future query, whose t is ≥ the watermark) plus the post-watermark
  *    tail — so steady-state per-key state is one carried row plus the
  *    out-of-orderness window, NOT the stream history.
  *
  * Batch mode runs the SAME function: one invocation holds a key's complete
  * row set (watermark = +∞), every left emits, no state survives —
  * StreamAsofSpec pins batch-form equality against `AsofJoin.asof` and
  * stream==batch over out-of-order micro-batches; q128 oracles the batch
  * form in SQL.
  *
  * State at 100 TB: per-key state is (1 + late-window) rows regardless of
  * stream length; keys with no outstanding queries keep only the carried
  * right row (the "current feature value" — that persistence IS the
  * feature-store contract). Rows that arrive LATER than the watermark are
  * dropped before the function runs (Spark's standard stateful late-data
  * rule) — size the watermark delay to the stream's real out-of-orderness,
  * exactly as for any windowed aggregation.
  */
object StreamAsof {

  /** One tagged input row: side 0 = right (state update, `value` is the
    * payload), side 1 = left (query point, `value` ignored). `tie` breaks
    * equal-timestamp ties (greatest wins); pass a unique row id.
    */
  final case class Tagged(side: Int, key: Long, t: Timestamp, tie: Long, value: Double)

  /** One enriched query point; `asof_tie`/`asof_value` are None when no
    * right row precedes the query.
    */
  final case class Match(key: Long, t: Timestamp, tie: Long,
      asof_tie: Option[Long], asof_value: Option[Double])

  /** Per-key buffers: outstanding queries and (pruned) state updates, both
    * as epoch-ms triples kept small by the watermark prune.
    */
  final case class KeyState(lefts: Seq[(Long, Long)], rights: Seq[(Long, Long, Double)])

  /** Tag + union two plain frames into the input shape ([[Tagged]]).
    * `valueCol` is the right payload; left rows carry their `tieCol` as the
    * query id.
    */
  def tag(left: DataFrame, right: DataFrame, keyCol: String, timeCol: String,
      tieCol: String, valueCol: String): Dataset[Tagged] = {
    val spark = left.sparkSession
    import spark.implicits._
    val r = right.select(lit(0).as("side"), col(keyCol).cast("long").as("key"),
      col(timeCol).cast("timestamp").as("t"), col(tieCol).cast("long").as("tie"),
      col(valueCol).cast("double").as("value"))
    val l = left.select(lit(1).as("side"), col(keyCol).cast("long").as("key"),
      col(timeCol).cast("timestamp").as("t"), col(tieCol).cast("long").as("tie"),
      lit(0.0).as("value"))
    r.unionByName(l).as[Tagged]
  }

  /** The join. Streaming input must carry a watermark on `t` (event-time
    * timeouts require one); batch input runs the identical semantics with
    * complete information.
    */
  def asof(tagged: Dataset[Tagged]): Dataset[Match] = {
    import tagged.sparkSession.implicits._
    val streaming = tagged.isStreaming
    val timeoutConf =
      if (streaming) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    tagged.groupByKey(_.key)
      .flatMapGroupsWithState[KeyState, Match](OutputMode.Append(), timeoutConf) {
        case (key: Long, rows: Iterator[Tagged], state: GroupState[KeyState]) =>
          val st = state.getOption.getOrElse(KeyState(Nil, Nil))
          val (newL, newR) = rows.toSeq.partition(_.side == 1)
          val lefts = st.lefts ++ newL.map(e => (e.t.getTime, e.tie))
          // sorted by (t, tie): the last element ≤ a query time is its match
          val rights = (st.rights ++ newR.map(e => (e.t.getTime, e.tie, e.value)))
            .sortBy(r => (r._1, r._2))
          val wm = if (streaming) state.getCurrentWatermarkMs() else Long.MaxValue
          // emit queries the watermark has sealed (late input never reaches
          // this function — Spark's stateful operators drop it upstream)
          val (emit, hold) = lefts.partition(_._1 < wm)
          val out = emit.sortBy(identity).map { case (lt, ltie) =>
            val m = rights.takeWhile(_._1 <= lt).lastOption
            Match(key, new Timestamp(lt), ltie, m.map(_._2), m.map(_._3))
          }
          if (!streaming) {
            // single complete invocation: nothing outlives the group
            out.iterator
          } else {
            // prune rights to the carried row + the post-watermark tail
            val (sealedR, openR) = rights.partition(_._1 < wm)
            val kept = sealedR.takeRight(1) ++ openR
            if (hold.isEmpty && kept.isEmpty) state.remove()
            else {
              state.update(KeyState(hold, kept))
              // wake when the watermark passes the oldest outstanding query
              // (strictly-greater-than-watermark required by the API)
              if (hold.nonEmpty)
                state.setTimeoutTimestamp(math.max(hold.map(_._1).min, wm + 1))
            }
            out.iterator
          }
      }
  }
}
