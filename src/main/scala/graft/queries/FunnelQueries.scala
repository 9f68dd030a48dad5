package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Funnel

/** Event-log analytics queries: funnel conversion and the first-order
  * transition matrix over the events table. Both oracles replay the
  * exact semantics — nested earliest-after-previous mins for the funnel,
  * a lead() window with the (ts, event_id) total order for transitions.
  */
object FunnelQueries {

  def all: Seq[GQuery] = Seq(

    // view → click → purchase strict-order funnel, greedy-earliest
    // conversion times, per-step user counts + conversion ratios.
    GQuery(
      "q316_funnel",
      """WITH s1 AS (SELECT user_id, min(ts) AS t FROM events
        |            WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
        |       JOIN s1 ON s1.user_id = e.user_id
        |       WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
        |       JOIN s2 ON s2.user_id = e.user_id
        |       WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY e.user_id),
        |c1 AS (SELECT count(*) AS n FROM s1),
        |c2 AS (SELECT count(*) AS n FROM s2),
        |c3 AS (SELECT count(*) AS n FROM s3)
        |SELECT 1 AS step, 'view' AS event_type, c1.n AS users,
        |       round(CASE WHEN c1.n = 0 THEN 0::DOUBLE ELSE 1::DOUBLE END, 6) AS conversion
        |FROM c1
        |UNION ALL
        |SELECT 2, 'click', c2.n,
        |       round(CASE WHEN c1.n = 0 THEN 0::DOUBLE ELSE c2.n::DOUBLE / c1.n END, 6)
        |FROM c1, c2
        |UNION ALL
        |SELECT 3, 'purchase', c3.n,
        |       round(CASE WHEN c2.n = 0 THEN 0::DOUBLE ELSE c3.n::DOUBLE / c2.n END, 6)
        |FROM c2, c3""".stripMargin) { (s, dir) =>
      Funnel.funnel(Tables.events(s, dir), Seq("view", "click", "purchase"))
    },

    // Streaming-funnel twin on the batch frame: the per-user state
    // machine (EventStreams.streamingFunnel) emits one conversion row per
    // completed step; greedy-earliest is an online rule, so the oracle is
    // q316's nested-min chain EXPANDED to per-user conversion times. The
    // multi-micro-batch == batch property is pinned by EventStreamsSpec.
    GQuery(
      "q329_stream_funnel",
      """WITH s1 AS (SELECT user_id, min(ts) AS t FROM events
        |            WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
        |       JOIN s1 ON s1.user_id = e.user_id
        |       WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
        |       JOIN s2 ON s2.user_id = e.user_id
        |       WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY e.user_id)
        |SELECT user_id, 1 AS step, 'view' AS event_type,
        |       strftime(t, '%Y-%m-%d %H:%M:%S') AS conv_ts FROM s1
        |UNION ALL
        |SELECT user_id, 2, 'click', strftime(t, '%Y-%m-%d %H:%M:%S') FROM s2
        |UNION ALL
        |SELECT user_id, 3, 'purchase', strftime(t, '%Y-%m-%d %H:%M:%S') FROM s3""".stripMargin) {
      (s, dir) =>
      import s.implicits._
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
        .as[graft.streaming.EventStreams.Event]
      graft.streaming.EventStreams.streamingFunnel(
          ev, Seq("view", "click", "purchase"))
        .toDF()
        .select(col("user_id"), col("step"), col("event_type"),
          date_format(col("conv_ts"), "yyyy-MM-dd HH:mm:ss").as("conv_ts"))
    },

    // P(to | from) over per-user adjacent event pairs.
    GQuery(
      "q317_transitions",
      """WITH seq AS (
        |  SELECT event_type,
        |         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
        |  FROM events),
        |pr AS (SELECT event_type AS from_type, to_type, count(*) AS cnt
        |       FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT from_type, sum(cnt) AS tot FROM pr GROUP BY from_type)
        |SELECT pr.from_type, pr.to_type, pr.cnt,
        |       round(pr.cnt::DOUBLE / t.tot, 6) AS p
        |FROM pr JOIN t USING (from_type)""".stripMargin) { (s, dir) =>
      Funnel.transitionMatrix(Tables.events(s, dir))
    })
}
