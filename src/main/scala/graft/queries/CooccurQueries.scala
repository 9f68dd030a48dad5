package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Cooccur, Funnel}

/** Co-visitation and event-rate anomaly queries over the events log.
  * q322 projects the user×item bipartite relation (items = the props.k
  * facet) into scored item pairs; q323 z-scores each (type, hour) count
  * against its trailing observed buckets. Both oracles replay the exact
  * count/expression trees.
  */
object CooccurQueries {

  def all: Seq[GQuery] = Seq(

    // Item-item co-visitation: support, jaccard, lift over distinct
    // (user, item) incidence.
    GQuery(
      "q322_covisitation",
      """WITH gi AS (SELECT DISTINCT user_id AS g,
        |              json_extract_string(props, '$.k')::BIGINT AS item
        |            FROM events
        |            WHERE json_extract_string(props, '$.k') IS NOT NULL),
        |sized AS (SELECT g, count(*) AS gsz FROM gi GROUP BY g
        |          HAVING count(*) <= 10000),
        |kept AS (SELECT gi.g, gi.item FROM gi JOIN sized ON sized.g = gi.g),
        |ng AS (SELECT count(*) AS n FROM sized),
        |tot AS (SELECT item, count(*) AS n FROM kept GROUP BY item),
        |p AS (SELECT a.item AS a, b.item AS b, count(*) AS cnt
        |      FROM kept a JOIN kept b ON b.g = a.g AND a.item < b.item
        |      GROUP BY 1, 2 HAVING count(*) >= 20)
        |SELECT p.a, p.b, p.cnt,
        |       round(p.cnt::DOUBLE / (ta.n + tb.n - p.cnt), 6) AS jaccard,
        |       round(p.cnt::DOUBLE * ng.n / (ta.n * tb.n), 6) AS lift
        |FROM p JOIN tot ta ON ta.item = p.a JOIN tot tb ON tb.item = p.b
        |CROSS JOIN ng""".stripMargin) { (s, dir) =>
      val incidence = Tables.events(s, dir).select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("long").as("item"))
      Cooccur.pairs(incidence, "user_id", "item", minCount = 20L)
        .select(col("a"), col("b"), col("cnt"),
          round(col("jaccard"), 6).as("jaccard"),
          round(col("lift"), 6).as("lift"))
    },

    // Per-type hourly rate z-scores vs the trailing 24 observed buckets.
    GQuery(
      "q323_event_zscores",
      """WITH h AS (
        |  SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour,
        |         event_type, count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |z AS (
        |  SELECT event_type, hour, cnt,
        |         avg(cnt) OVER w AS mu,
        |         stddev_samp(cnt) OVER w AS sd
        |  FROM h
        |  WINDOW w AS (PARTITION BY event_type ORDER BY hour
        |               ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
        |SELECT event_type, hour, cnt,
        |       round(CASE WHEN sd IS NULL OR sd = 0 THEN NULL
        |                  ELSE (cnt - mu) / sd END, 6) AS z
        |FROM z""".stripMargin) { (s, dir) =>
      Funnel.rateZscores(Tables.events(s, dir), trailing = 24)
        .select(col("event_type"), col("hour"), col("cnt"),
          round(col("z"), 6).as("z"))
    })
}
