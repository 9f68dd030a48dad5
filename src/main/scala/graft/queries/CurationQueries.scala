package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{AsofJoin, Sampling}

/** Corpus-curation operators: point-in-time (as-of) join, stratified
  * sampling, split assignment. Every oracle replays the operator's
  * documented hash/order semantics from first principles.
  */
object CurationQueries {

  /** DuckDB replay of Sampling.hashUnit (md5 60-bit prefix mod 1e6). */
  private def duckHashUnit(keyExpr: String, salt: String): String =
    s"('0x' || substr(md5($keyExpr || ':$salt'), 1, 15))::BIGINT % 1000000"

  val all: Seq[GQuery] = Seq(

    // Backward as-of join: every 5th event is a "query point", the rest are
    // "state updates"; for each query point, the latest state update of the
    // same user at-or-before its timestamp. The oracle recomputes each match
    // independently (max (ts, event_id) under the <= bound) — it does not
    // replay the union+window algorithm, so a green row checks the
    // SEMANTICS, including the boundary (<=) and tie (greatest id) rules.
    GQuery(
      "q100_asof_join",
      """WITH l AS (SELECT user_id, event_id, ts FROM events WHERE event_id % 5 = 0),
        |     r AS (SELECT user_id, ts, event_id, value FROM events WHERE event_id % 5 <> 0)
        |SELECT l.user_id, l.event_id,
        |       strftime(l.ts, '%Y-%m-%d %H:%M:%S') AS ts,
        |       (SELECT r.event_id FROM r
        |        WHERE r.user_id = l.user_id AND r.ts <= l.ts
        |        ORDER BY r.ts DESC, r.event_id DESC LIMIT 1) AS asof_event_id,
        |       round(coalesce((SELECT r.value FROM r
        |        WHERE r.user_id = l.user_id AND r.ts <= l.ts
        |        ORDER BY r.ts DESC, r.event_id DESC LIMIT 1), 0.0), 6) AS asof_value
        |FROM l""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir)
      val left = ev.filter(pmod(col("event_id"), lit(5)) === 0)
        .select("user_id", "event_id", "ts")
      val right = ev.filter(pmod(col("event_id"), lit(5)) =!= 0)
        .select("user_id", "ts", "event_id", "value")
      AsofJoin.asof(left, right, keyCol = "user_id", timeCol = "ts",
          tieCol = "event_id", payloadCols = Seq("event_id", "value"))
        .select(col("user_id"), col("event_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts"),
          col("asof_event_id"),
          round(coalesce(col("asof_value"), lit(0.0)), 6).as("asof_value"))
    },

    // Stratified sample by language: per-stratum keep fractions, absent
    // strata (es/fr) fall to the 0 default. The oracle replays the md5 hash
    // draw bit-for-bit — the whole point of the operator is that any engine
    // CAN.
    GQuery(
      "q101_stratified_sample",
      s"""SELECT doc_id, lang FROM documents
         |WHERE ${duckHashUnit("doc_id::VARCHAR", "strat")} <
         |      CASE lang WHEN 'en' THEN 500000 WHEN 'zh' THEN 1000000
         |                WHEN 'de' THEN 250000 ELSE 0 END""".stripMargin) { (s, dir) =>
      Sampling.stratifiedSample(
          Tables.documents(s, dir).select("doc_id", "lang"),
          strataCol = "lang", keyCol = "doc_id",
          fractions = Map("en" -> 0.5, "zh" -> 1.0, "de" -> 0.25))
    },

    // Deterministic 80/10/10 split assignment over the document keys; the
    // oracle replays the cumulative-threshold CASE over the same hash.
    GQuery(
      "q102_split_assign",
      s"""SELECT doc_id,
         |       CASE WHEN u < 800000 THEN 'train'
         |            WHEN u < 900000 THEN 'val'
         |            ELSE 'test' END AS split
         |FROM (SELECT doc_id, ${duckHashUnit("doc_id::VARCHAR", "split")} AS u
         |      FROM documents)""".stripMargin) { (s, dir) =>
      Sampling.assignSplit(
        Tables.documents(s, dir).select("doc_id"),
        keyCol = "doc_id",
        splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    },
  )
}
