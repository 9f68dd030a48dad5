package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Relational surface of the engine: scans, filters, joins, aggregations,
  * window/top-k, set ops, deterministic sample/shuffle — the Spark-native
  * re-expression of the reference's set-oriented operators (SURVEY.md §2.2-2.6).
  *
  * Reference citations (relative to /root/reference):
  *  - window slices / multi-interval unions: layout/FWindow.java:73-120 (P2/U1)
  *  - enumeration: spec/datasets/types/DatasetView.java:84-104 (W7)
  *  - sample: CMD_slab_analyze.java:60-65 (W4); shuffle: README.md:54-57 (W5)
  *  - IN-set: spec/predicates/OpType.java:36 (U5); MATCHES full-match:
  *    spec/predicates/PredicateEvaluator.java:207 (F4)
  *  - cleanup/except: README.md:108-110 (U4)
  */
object Relational {

  val all: Seq[GQuery] = Seq(

    // A1/A-family aggregation over the big fact table (map-side partial agg +
    // one shuffle on the 6-value group key; survives any scale).
    GQuery(
      "q01_lineitem_agg",
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity), 2)                          AS sum_qty,
        |       round(sum(l_extendedprice), 2)                     AS sum_base_price,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2)  AS sum_disc_price,
        |       round(avg(l_discount), 4)                          AS avg_disc,
        |       count(*)                                           AS cnt
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("cnt"))
    },

    // Broadcast dims (region/nation) + shuffled fact joins; Catalyst picks
    // BroadcastHashJoin for the small sides automatically.
    GQuery(
      "q03_join_revenue_by_nation",
      """SELECT n_name,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |       count(*) AS cnt
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey  = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("cnt"))
    },

    // W1-shaped top-k per group via rank window (deterministic tie-break).
    GQuery(
      "q04_topk_orders_per_cust",
      """SELECT o_custkey, o_orderkey, rn FROM (
        |  SELECT o_custkey, o_orderkey,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 3""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "rn")
    },

    // U5: IN-set membership kept distinct from OR-of-EQ
    // (ordinal_predicate_writers_v1.md:41-46).
    GQuery(
      "q05_in_set",
      """SELECT o_orderpriority, count(*) AS cnt,
        |       round(sum(o_totalprice), 2) AS total
        |FROM orders
        |WHERE o_orderstatus IN ('F', 'P')
        |GROUP BY o_orderpriority""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir)
        .filter(col("o_orderstatus").isin("F", "P"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("cnt"), round(sum("o_totalprice"), 2).as("total"))
    },

    // F4: MATCHES is full-match (Pattern.matches) — rlike is find(), so the
    // pattern is anchored ^(?:...)$ to reproduce reference semantics.
    GQuery(
      "q06_matches_regex",
      """SELECT p_partkey, p_type FROM part
        |WHERE regexp_full_match(p_type, 'PROMO.*')""".stripMargin) { (s, dir) =>
      Tables.part(s, dir)
        .filter(col("p_type").rlike("^(?:PROMO.*)$"))
        .select("p_partkey", "p_type")
    },

    // P2/U1: multi-interval ordinal window — union of half-open ranges over
    // the ordinal column, compiled to an OR of range predicates so the scan
    // can prune (FWindow.java:73-120).
    GQuery(
      "q07_window_slice",
      """SELECT event_id, event_type, round(value, 2) AS value
        |FROM events
        |WHERE (event_id >= 0 AND event_id < 100)
        |   OR (event_id >= 500 AND event_id < 600)
        |   OR (event_id >= 900 AND event_id < 1000)""".stripMargin) { (s, dir) =>
      val intervals = Seq((0L, 100L), (500L, 600L), (900L, 1000L))
      val pred = intervals
        .map { case (a, b) => col("event_id") >= a && col("event_id") < b }
        .reduce(_ || _)
      Tables.events(s, dir)
        .filter(pred)
        .select(col("event_id"), col("event_type"), round(col("value"), 2).as("value"))
    },

    // W7: row enumeration — logical ordinal over a windowed slice
    // (DatasetView.getIndexed; logical->physical translation of FWindow).
    GQuery(
      "q09_enumerate",
      """SELECT row_number() OVER (ORDER BY event_id) AS logical_ordinal,
        |       event_id AS physical_ordinal
        |FROM events WHERE event_id >= 200 AND event_id < 400""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .filter(col("event_id") >= 200 && col("event_id") < 400)
        .select(
          row_number().over(Window.orderBy("event_id")).as("logical_ordinal"),
          col("event_id").as("physical_ordinal"))
    },

    // Distinct projection (dedup at the relational level).
    GQuery(
      "q11_distinct",
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem") { (s, dir) =>
      Tables.lineitem(s, dir).select("l_returnflag", "l_linestatus").distinct()
    },

    // U4: except/anti-join cleanup — drop offenders from a candidate set.
    GQuery(
      "q12_except_cleanup",
      """SELECT event_id FROM events WHERE value > 100
        |EXCEPT
        |SELECT event_id FROM events WHERE event_type = 'error'""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir)
      ev.filter(col("value") > 100).select("event_id")
        .except(ev.filter(col("event_type") === "error").select("event_id"))
    },

    // W4: deterministic sample — reproducible by key, not task-order RNG
    // (dataset_yaml_v1.md:143-145 requires per-index determinism).
    GQuery(
      "q13_sample_deterministic",
      """SELECT event_id, user_id, event_type FROM events
        |WHERE event_id % 20 = 0""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .filter(col("event_id") % 20 === 0)
        .select("event_id", "user_id", "event_type")
    },

    // W5: seeded deterministic shuffle — Knuth multiplicative hash as the
    // sort key (generate ivec-shuffle, README.md:54-57). Engine-neutral
    // arithmetic so the oracle reproduces the exact permutation.
    GQuery(
      "q14_shuffle_deterministic",
      """SELECT event_id,
        |       row_number() OVER (ORDER BY (event_id * 2654435761) % 4294967296, event_id)
        |         AS shuffle_pos
        |FROM events WHERE event_id < 2000""".stripMargin) { (s, dir) =>
      val h = (col("event_id") * lit(2654435761L)) % lit(4294967296L)
      Tables.events(s, dir)
        .filter(col("event_id") < 2000)
        .select(
          col("event_id"),
          row_number().over(Window.orderBy(h, col("event_id"))).as("shuffle_pos"))
    },

    // F10 date/time value handling: truncation, extraction, arithmetic on
    // the orders date column (MNode DATE/DATETIME tags land as these types).
    GQuery(
      "q36_datetime_ops",
      """SELECT year(o_orderdate)::BIGINT AS yr,
        |       month(o_orderdate)::BIGINT AS mo,
        |       count(*) AS cnt,
        |       round(sum(o_totalprice), 2) AS total,
        |       strftime(min(o_orderdate), '%Y-%m-%d') AS first_day,
        |       strftime(max(o_orderdate) + INTERVAL 30 DAY, '%Y-%m-%d') AS last_plus_30
        |FROM orders
        |GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir)
        .groupBy(
          year(col("o_orderdate")).cast("long").as("yr"),
          month(col("o_orderdate")).cast("long").as("mo"))
        .agg(
          count(lit(1)).as("cnt"),
          round(sum("o_totalprice"), 2).as("total"),
          date_format(min(col("o_orderdate")), "yyyy-MM-dd").as("first_day"),
          date_format(max(col("o_orderdate")) + expr("INTERVAL 30 DAYS"), "yyyy-MM-dd")
            .as("last_plus_30"))
    },

    // Event-time tumbling-window aggregation (batch form of the streaming
    // hourly rollup; the streaming variant shares this logic).
    GQuery(
      "q15_events_hourly",
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour,
        |       event_type, count(*) AS cnt, round(sum(value), 2) AS total_value
        |FROM events
        |GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(
          date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:00:00").as("hour"),
          col("event_type"))
        .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("total_value"))
    },

    // Z-order (Morton) key: interleave the low 8 bits of two bucketed join
    // keys — the multi-dim file-pruning layout key (ZOrderSpec measures
    // the pruning asymmetry vs a 1-d sort: a y-only filter touches every
    // x-sorted file but only the z-layout's tile row). Pure Catalyst bit
    // arithmetic, whole-stage codegen'd; the oracle recomputes the code
    // with the same shifts, bit for bit.
    GQuery(
      "q207_zorder_key",
      """SELECT l_orderkey, l_linenumber,
        |  list_sum(list_transform(range(0, 8),
        |    i -> ((((l_partkey % 256) >> i) & 1) << (2*i))
        |       + ((((l_suppkey % 256) >> i) & 1) << (2*i + 1))))::BIGINT AS z
        |FROM lineitem""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir).select(
        col("l_orderkey"), col("l_linenumber"),
        graft.layout.ZOrder.zValue(
          pmod(col("l_partkey"), lit(256L)),
          pmod(col("l_suppkey"), lit(256L)), bits = 8).as("z"))
    },

    // 3-column Morton key (round-robin interleave, column j's bit i at
    // z bit 3i+j) — the n-dim generalization behind zorderWriteN; the
    // oracle replays every shift from first principles, so the bit
    // layout is pinned engine-neutrally (ZOrderSpec measures the 3-D
    // pruning this key buys).
    GQuery(
      "q232_zorder3_key",
      """SELECT l_orderkey, l_linenumber,
        |  list_sum(list_transform(range(0, 6),
        |    i -> ((((l_partkey % 64) >> i) & 1) << (3*i))
        |       + ((((l_suppkey % 64) >> i) & 1) << (3*i + 1))
        |       + ((((l_orderkey % 64) >> i) & 1) << (3*i + 2))))::BIGINT AS z
        |FROM lineitem""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir).select(
        col("l_orderkey"), col("l_linenumber"),
        graft.layout.ZOrder.zValueN(Seq(
          pmod(col("l_partkey"), lit(64L)),
          pmod(col("l_suppkey"), lit(64L)),
          pmod(col("l_orderkey"), lit(64L))), bits = 6).as("z"))
    },

    // RENDEZVOUS (HRW) sharding: shard = argmax over shards of
    // md5-60(id:shard), ties to the larger index — the stable doc→shard
    // layout whose reshard migration is proportional to GROWTH, not corpus
    // size. Pure per-row Column arithmetic (no shuffle); the oracle
    // replays hash, argmax and tie-break per doc.
    GQuery(
      "q255_rendezvous_shard",
      """WITH sh AS (SELECT unnest(range(0, 8)) AS s),
        |h AS (SELECT d.doc_id, sh.s,
        |        ('0x' || substr(md5(d.doc_id::VARCHAR || ':' || sh.s::VARCHAR), 1, 15))::BIGINT AS h
        |      FROM documents d CROSS JOIN sh),
        |r AS (SELECT doc_id, s,
        |        row_number() OVER (PARTITION BY doc_id ORDER BY h DESC, s DESC) AS rn
        |      FROM h)
        |SELECT doc_id, s::BIGINT AS shard FROM r WHERE rn = 1""".stripMargin) {
      (s, dir) =>
      graft.layout.Sharding.rendezvousAssign(
          Tables.documents(s, dir).select("doc_id"), "doc_id", nShards = 8)
        .select(col("doc_id"), col("shard"))
    },

    // Reshard stability card, 8 → 10 shards: HRW moves ~(10−8)/10 of docs
    // (measured beside the analytic expectation); modulo sharding moves
    // almost everything — the baseline that shows why naive layout cannot
    // grow in place. The oracle replays both assignments and both rollups.
    GQuery(
      "q256_reshard_stability",
      """WITH sh8 AS (SELECT unnest(range(0, 8)) AS s),
        |sh10 AS (SELECT unnest(range(0, 10)) AS s),
        |h8 AS (SELECT d.doc_id, sh8.s,
        |        ('0x' || substr(md5(d.doc_id::VARCHAR || ':' || sh8.s::VARCHAR), 1, 15))::BIGINT AS h
        |      FROM documents d CROSS JOIN sh8),
        |a8 AS (SELECT doc_id, s FROM (
        |         SELECT doc_id, s, row_number() OVER (PARTITION BY doc_id ORDER BY h DESC, s DESC) AS rn
        |         FROM h8) WHERE rn = 1),
        |h10 AS (SELECT d.doc_id, sh10.s,
        |        ('0x' || substr(md5(d.doc_id::VARCHAR || ':' || sh10.s::VARCHAR), 1, 15))::BIGINT AS h
        |      FROM documents d CROSS JOIN sh10),
        |a10 AS (SELECT doc_id, s FROM (
        |         SELECT doc_id, s, row_number() OVER (PARTITION BY doc_id ORDER BY h DESC, s DESC) AS rn
        |         FROM h10) WHERE rn = 1),
        |hrw AS (SELECT count(*) AS n_docs,
        |               sum(CASE WHEN a8.s != a10.s THEN 1 ELSE 0 END)::BIGINT AS moved
        |        FROM a8 JOIN a10 USING (doc_id)),
        |md AS (SELECT count(*) AS n_docs,
        |              sum(CASE WHEN doc_id % 8 != doc_id % 10 THEN 1 ELSE 0 END)::BIGINT AS moved
        |       FROM documents)
        |SELECT 'hrw' AS policy, n_docs, moved,
        |       round(moved::DOUBLE / n_docs, 6) AS moved_frac,
        |       0.2 AS expected_frac
        |FROM hrw
        |UNION ALL
        |SELECT 'modulo', n_docs, moved,
        |       round(moved::DOUBLE / n_docs, 6), NULL
        |FROM md""".stripMargin) { (s, dir) =>
      graft.layout.Sharding.reshardStabilityCard(
        Tables.documents(s, dir).select("doc_id"), "doc_id",
        fromShards = 8, toShards = 10)
    },
  )
}
