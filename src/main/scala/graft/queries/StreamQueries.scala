package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.streaming.EventStreams

/** Batch-mode forms of the streaming transforms, oracled in SQL. The
  * streaming variants run the same code over readStream (pinned equal by
  * EventStreamsSpec).
  */
object StreamQueries {

  /** DuckDB cosine distance between two float-list refs (the q50 form). */
  private def cosDistSql(a: String, b: String): String =
    s"""(1.0 - list_sum(list_transform(range(1, len($a)+1),
       |          i -> $a[i]::DOUBLE * $b[i]::DOUBLE))
       |      / (sqrt(list_sum(list_transform($a, x -> x::DOUBLE*x::DOUBLE))) *
       |         sqrt(list_sum(list_transform($b, x -> x::DOUBLE*x::DOUBLE)))))""".stripMargin

  val all: Seq[GQuery] = Seq(

    // T4 progress events: a SparkListener-driven reporter observes a real
    // scan — every input record is accounted for and at least one cadence
    // tick fires. The async listener bus is drained by polling before the
    // assertions are emitted (deterministic: sequential Verify/Bench runs
    // mean no foreign tasks pollute the counter between attach and close).
    GQuery(
      "q89_progress_events",
      """SELECT true AS scanned_all, true AS ticked""") { (s, dir) =>
      import s.implicits._
      val expected = Tables.embeddings(s, dir).count()
      val ticks = new java.util.concurrent.atomic.AtomicLong(0)
      val rep = new graft.streaming.ProgressReporter(s,
        everyRecords = 100, everyMillis = 1)(_ => ticks.incrementAndGet())
      try {
        // force a real data read (a bare count() would be answered from
        // parquet metadata and record no input rows)
        Tables.embeddings(s, dir).agg(sum("vec_id")).collect()
        val deadline = System.currentTimeMillis() + 15000
        while (rep.totalRecords < expected && System.currentTimeMillis() < deadline)
          Thread.sleep(50)
      } finally rep.close()
      Seq((rep.totalRecords >= expected, ticks.get() > 0)).toDF("scanned_all", "ticked")
    },

    // Streaming dedup-groups, batch form (stream == batch pinned by
    // StreamDedupSpec over a MemoryStream; the transform is the same code).
    GQuery(
      "q92_stream_dedup_groups",
      """SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint,
        |       min(doc_id) AS canonical_id, count(*) AS multiplicity
        |FROM documents GROUP BY 1""".stripMargin) { (s, dir) =>
      graft.streaming.StreamDedup.dedupGroups(Tables.documents(s, dir))
    },

    // S7/T5 driver row: the xvec micro-batch stream run to completion, the
    // way q92 oracles StreamDedup. Two AvailableNow passes over a file that
    // GROWS between them share one checkpoint — exactly-once delivery means
    // the sink holds each of the 450 records exactly once, which the oracle
    // (a plain recompute from the parquet table) can only match if the
    // second pass resumed from ordinal 300 rather than re-reading from 0.
    GQuery(
      "q103_xvec_stream",
      """SELECT vec_id AS ordinal, len(embedding) AS dim,
        |       round(sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE*x::DOUBLE))), 6) AS norm
        |FROM embeddings WHERE vec_id < 450""".stripMargin) { (s, dir) =>
      import java.nio.file.{Files, Paths}
      val base = s"${tmpDir()}/xvs-${System.nanoTime()}"
      Files.createDirectories(Paths.get(base))
      val path = s"$base/s.fvec"
      val src = Tables.embeddings(s, dir)
        .select(col("vec_id").as("ordinal"), col("embedding").as("vector"))
      graft.sources.xvec.XvecIO.write(src.filter(col("ordinal") < 300), path)
      val outDir = s"$base/out"
      def drain(): Unit = {
        val q = s.readStream.format("xvec").load(path)
          .writeStream.format("parquet")
          .option("path", outDir)
          .option("checkpointLocation", s"$base/ckpt")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        // a false return means the drain is STILL RUNNING — starting the
        // second pass on the same checkpoint would then fail; stop and
        // surface the timeout instead of racing
        if (!q.awaitTermination(120000)) {
          q.stop()
          throw new IllegalStateException("q103: AvailableNow drain timed out")
        }
      }
      drain()
      // grow the file in place: xvec is a bare record concatenation, so
      // append == concatenate encodings (ordinals 300..449 by position)
      val tail = s"$base/tail.fvec"
      graft.sources.xvec.XvecIO.write(
        src.filter(col("ordinal") >= 300 && col("ordinal") < 450), tail)
      val out = new java.io.FileOutputStream(path, true)
      try out.write(Files.readAllBytes(Paths.get(tail)))
      finally out.close()
      drain()
      s.read.parquet(outDir).select(
        col("ordinal"), size(col("vector")).as("dim"),
        round(graft.functions.VectorFunctions.vectorNorm(col("vector")), 6).as("norm"))
    },

    // Streaming as-of join, batch form (stream == batch pinned by
    // StreamAsofSpec over out-of-order MemoryStream micro-batches; the
    // flatMapGroupsWithState function is the same code). The oracle
    // recomputes every match independently under the <= / greatest-tie
    // rules, exactly like q100 does for the batch AsofJoin operator —
    // a green row checks the SEMANTICS of the streaming join function.
    GQuery(
      "q128_stream_asof",
      """WITH l AS (SELECT user_id, event_id, ts FROM events WHERE event_id % 4 = 0),
        |     r AS (SELECT user_id, ts, event_id, value FROM events WHERE event_id % 4 <> 0)
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
      val left = ev.filter(pmod(col("event_id"), lit(4)) === 0)
        .select("user_id", "ts", "event_id")
      val right = ev.filter(pmod(col("event_id"), lit(4)) =!= 0)
        .select("user_id", "ts", "event_id", "value")
      graft.streaming.StreamAsof.asof(
          graft.streaming.StreamAsof.tag(left, right, "user_id", "ts", "event_id", "value"))
        .select(
          col("key").as("user_id"), col("tie").as("event_id"),
          date_format(col("t"), "yyyy-MM-dd HH:mm:ss").as("ts"),
          col("asof_tie").as("asof_event_id"),
          round(coalesce(col("asof_value"), lit(0.0)), 6).as("asof_value"))
    },

    // Gap-based sessionization (30-min inactivity).
    GQuery(
      "q17_sessionize",
      """WITH m AS (
        |  SELECT user_id, ts, event_id, value,
        |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |s AS (
        |  SELECT *, CASE WHEN prev_ts IS NULL
        |                   OR epoch_ms(ts) - epoch_ms(prev_ts) > 1800000
        |                 THEN 1 ELSE 0 END AS new_session
        |  FROM m),
        |n AS (
        |  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                                   ROWS UNBOUNDED PRECEDING) AS session_no
        |  FROM s)
        |SELECT user_id, session_no::BIGINT AS session_no,
        |       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
        |       count(*) AS n_events, round(sum(value), 2) AS total_value
        |FROM n GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      EventStreams.sessionizeBatch(Tables.events(s, dir), gapMinutes = 30)
        .select(
          col("user_id"), col("session_no"),
          date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
          date_format(col("session_end"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
          col("n_events"), col("total_value"))
    },

    // Sliding-window rate (30-min window, 10-min slide).
    GQuery(
      "q18_sliding_rate",
      """WITH cand AS (
        |  SELECT DISTINCT time_bucket(INTERVAL 10 MINUTE, ts) - (s * INTERVAL 10 MINUTE)
        |           AS window_start
        |  FROM events, range(0, 3) r(s)),
        |w AS (
        |  SELECT c.window_start, count(e.event_id) AS cnt
        |  FROM cand c JOIN events e
        |    ON e.ts >= c.window_start AND e.ts < c.window_start + INTERVAL 30 MINUTE
        |  GROUP BY 1)
        |SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start, cnt
        |FROM w WHERE cnt > 0""".stripMargin) { (s, dir) =>
      EventStreams.slidingRate(Tables.events(s, dir))
        .select(date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
          col("cnt"))
    },

    // STREAMING CMS build (q166's sketch through progressive ingest): the
    // documents parquet is read as a FILE STREAM, each micro-batch folds
    // its own counter grid into the accumulator (foreachBatch +
    // Trigger.AvailableNow), and the heavy hitters come off the MERGED
    // grid. Counter addition is an order-free monoid, so the merged grid
    // equals the batch build exactly — which is precisely what a green
    // row proves, because the oracle replays the BATCH arithmetic while
    // the engine went through the stream.
    GQuery(
      "q193_stream_cms_build",
      """WITH toks AS (SELECT unnest(list_filter(string_split(lower(text), ' '),
        |                x -> x != '')) AS term FROM documents),
        |tc AS (SELECT term, count(*) AS c FROM toks GROUP BY term),
        |js AS (SELECT unnest([0, 1, 2]) AS j),
        |ps AS (SELECT term, c, j,
        |         ('0x' || substr(md5(term || ':' || j::VARCHAR), 1, 15))::BIGINT % 128 AS pos
        |       FROM tc CROSS JOIN js),
        |bkt AS (SELECT j, pos, sum(c) AS bc FROM ps GROUP BY j, pos),
        |est AS (SELECT term, min(bc)::BIGINT AS cms_count
        |        FROM ps JOIN bkt USING (j, pos) GROUP BY term)
        |SELECT term, cms_count FROM est WHERE cms_count >= 80""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      // file-source streams want a DIRECTORY; the sf layout keeps each
      // table as one file, so glob-filter the table out of the sf dir
      val stream = s.readStream.schema(docs.schema)
        .option("pathGlobFilter", "documents.parquet")
        .option("recursiveFileLookup", "false")
        .parquet(dir)
      val grid = graft.streaming.StreamSketch.cmsFromStream(
        stream.select(explode(split(lower(col("text")), " ")).as("term"))
          .filter(col("term") =!= ""),
        "term", depth = 3, width = 128)
      val toks = docs.select(explode(split(lower(col("text")), " ")).as("term"))
        .filter(col("term") =!= "")
      graft.operators.Cms.estimates(toks, grid, depth = 3, termCol = "term")
        .filter(col("cms_count") >= 80)
    },

    // Streaming Misra-Gries build: per-micro-batch summaries merged with
    // the mergeable-summaries rule. Counter VALUES are merge-order
    // dependent, but the n/(k+1) superset guarantee and the exact total
    // survive any batching — so phase 2 (exact counts over the broadcast
    // survivors) emits the IDENTICAL guaranteed-heavy set, and q199's
    // oracle replays it unchanged through the streaming path.
    GQuery(
      "q218_stream_mg_heavy",
      """WITH toks AS (SELECT substr(unnest(list_filter(
        |                string_split(lower(text), ' '), x -> x != '')), 1, 1)
        |                AS term FROM documents),
        |n AS (SELECT count(*) AS c FROM toks),
        |tc AS (SELECT term, count(*) AS tf FROM toks GROUP BY term)
        |SELECT term, tf FROM tc CROSS JOIN n
        |WHERE tf > c / 16.0""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      def terms(df: org.apache.spark.sql.DataFrame) = df
        .select(explode(split(lower(col("text")), " ")).as("w"))
        .filter(col("w") =!= "")
        .select(substring(col("w"), 1, 1).as("term"))
      val stream = s.readStream.schema(docs.schema)
        .option("pathGlobFilter", "documents.parquet")
        .option("recursiveFileLookup", "false")
        .parquet(dir)
      val acc = graft.streaming.StreamSketch.mgFromStream(terms(stream), "term", k = 15)
      graft.operators.Freq.guaranteedHeavyFrom(acc, terms(docs), "term", k = 15)
    },

    // Streaming IVF probe: the query set arrives as a STREAM and probes a
    // frozen index via foreachBatch — each micro-batch runs the exact
    // batch search and appends its top-k. Queries are independent and the
    // index is static, so any batching unions to the whole-batch result;
    // the oracle is the full from-first-principles IVF replay (the q50
    // SQL), green only if the streaming path loses or duplicates nothing.
    GQuery(
      "q202_stream_ivf_probe",
      s"""WITH c AS (SELECT vec_id AS cell, embedding AS ce FROM embeddings WHERE vec_id < 16),
         |base AS (SELECT vec_id AS id, embedding AS v FROM embeddings),
         |assignr AS (
         |  SELECT base.id, base.v, c.cell, ${cosDistSql("base.v", "c.ce")} AS d,
         |         row_number() OVER (PARTITION BY base.id
         |                            ORDER BY ${cosDistSql("base.v", "c.ce")}, c.cell) AS rn
         |  FROM base CROSS JOIN c),
         |assign AS (SELECT id, v, cell FROM assignr WHERE rn = 1),
         |q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
         |      WHERE vec_id >= 100 AND vec_id < 120),
         |probr AS (
         |  SELECT q.qid, q.qv, c.cell,
         |         row_number() OVER (PARTITION BY q.qid
         |                            ORDER BY ${cosDistSql("q.qv", "c.ce")}, c.cell) AS rn
         |  FROM q CROSS JOIN c),
         |probes AS (SELECT qid, qv, cell FROM probr WHERE rn <= 4),
         |cand AS (
         |  SELECT p.qid, a.id AS nid, ${cosDistSql("p.qv", "a.v")} AS d
         |  FROM probes p JOIN assign a ON a.cell = p.cell
         |  WHERE a.id <> p.qid)
         |SELECT qid AS query_id, nid AS neighbor_id, rank FROM (
         |  SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY d, nid) AS rank
         |  FROM cand)
         |WHERE rank <= 5""".stripMargin) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val centroids = emb.filter(col("vec_id") < 16)
      val index = graft.operators.Ann.ivfIndex(emb, centroids)
      val queryStream = s.readStream.schema(emb.schema)
        .option("pathGlobFilter", "embeddings.parquet")
        .option("recursiveFileLookup", "false")
        .parquet(dir)
        .filter(col("vec_id") >= 100 && col("vec_id") < 120)
      val out = s"${tmpDir()}/annstream-${System.nanoTime()}"
      graft.streaming.StreamAnn.ivfSearchToPath(queryStream, index, centroids,
        k = 5, nProbe = 4, outPath = out, excludeSelf = true)
      s.read.parquet(out)
        .select(col("query_id"), col("neighbor_id"),
          col("rank").cast("long").as("rank"))
    },

    // STREAMING index ingest + maintenance: vectors arrive as a stream and
    // are assigned to the frozen quantizer micro-batch by micro-batch
    // (persisted per-batch = the maintained index); a tombstone anti-join
    // then deletes a prefix and the search runs over what survived. The
    // oracle replays a FROM-SCRATCH batch IVF build over the final corpus
    // (q235's invariant) — green only if streaming ingest + delete lose
    // and duplicate nothing vs the rebuild.
    GQuery(
      "q238_stream_index_append",
      s"""WITH c AS (SELECT vec_id AS cell, embedding AS ce FROM embeddings WHERE vec_id < 16),
         |base AS (SELECT vec_id AS id, embedding AS v FROM embeddings WHERE vec_id >= 30),
         |assignr AS (
         |  SELECT base.id, base.v, c.cell,
         |         row_number() OVER (PARTITION BY base.id
         |                            ORDER BY ${cosDistSql("base.v", "c.ce")}, c.cell) AS rn
         |  FROM base CROSS JOIN c),
         |assign AS (SELECT id, v, cell FROM assignr WHERE rn = 1),
         |q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
         |      WHERE vec_id >= 100 AND vec_id < 120),
         |probr AS (
         |  SELECT q.qid, q.qv, c.cell,
         |         row_number() OVER (PARTITION BY q.qid
         |                            ORDER BY ${cosDistSql("q.qv", "c.ce")}, c.cell) AS rn
         |  FROM q CROSS JOIN c),
         |probes AS (SELECT qid, qv, cell FROM probr WHERE rn <= 4),
         |cand AS (
         |  SELECT p.qid, a.id AS nid, ${cosDistSql("p.qv", "a.v")} AS d
         |  FROM probes p JOIN assign a ON a.cell = p.cell
         |  WHERE a.id <> p.qid)
         |SELECT qid AS query_id, nid AS neighbor_id, rank FROM (
         |  SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY d, nid) AS rank
         |  FROM cand)
         |WHERE rank <= 5""".stripMargin) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val centroids = emb.filter(col("vec_id") < 16)
      val vecStream = s.readStream.schema(emb.schema)
        .option("pathGlobFilter", "embeddings.parquet")
        .option("recursiveFileLookup", "false")
        .parquet(dir)
      val out = s"${tmpDir()}/ivfappend-${System.nanoTime()}"
      graft.streaming.StreamAnn.ivfAppendToPath(vecStream, centroids, out)
      val maintained = graft.operators.Ann.ivfDelete(
        s.read.parquet(out), emb.filter(col("vec_id") < 30))
      graft.operators.Ann.ivfSearch(
          emb.filter(col("vec_id") >= 100 && col("vec_id") < 120),
          maintained, centroids, k = 5, nProbe = 4, excludeSelf = true)
        .select(col("query_id"), col("neighbor_id"),
          col("rank").cast("long").as("rank"))
    },

    // STREAMING weighted reservoir: q163's Efraimidis–Spirakis sample
    // built through foreachBatch — the ES key is a pure per-row function,
    // so top-n of per-batch top-ns equals the batch sample EXACTLY (not
    // statistically), under any batching. Same oracle as q163; bounded
    // n-row driver state (ReservoirSpec pins multi-batch + redelivery).
    GQuery(
      "q257_stream_weighted_sample",
      """WITH w AS (SELECT doc_id,
        |             len(list_filter(string_split(lower(text), ' '), x -> x != '')) AS w
        |           FROM documents),
        |k AS (SELECT doc_id, w,
        |             ln((('0x' || substr(md5(doc_id::VARCHAR || ':wsample'), 1, 15))::BIGINT + 1)
        |                / 1152921504606846976.0) / w AS es
        |      FROM w WHERE w > 0)
        |SELECT doc_id, w, round(es, 6) AS es_key
        |FROM k ORDER BY es DESC, doc_id LIMIT 50""".stripMargin) { (s, dir) =>
      import s.implicits._
      val docs = Tables.documents(s, dir)
      val stream = s.readStream.schema(docs.schema)
        .option("pathGlobFilter", "documents.parquet")
        .option("recursiveFileLookup", "false")
        .parquet(dir)
        .select(col("doc_id"),
          size(graft.functions.TextFunctions.tokens(lower(col("text"))))
            .cast("long").as("w"))
      graft.streaming.StreamSketch
        .weightedReservoirFromStream(stream, "doc_id", "w", n = 50)
        .toDF("doc_id", "w", "es")
        .select(col("doc_id"), col("w"), round(col("es"), 6).as("es_key"))
    },

    // Watermarked STREAM-STREAM inner join (the built-in symmetric-hash
    // join class, distinct from q128's custom-state as-of): clicks of the
    // same user in the 2 hours before each error. Inner matches emit
    // eagerly — the watermark exists for state EVICTION — so the
    // run-to-completion stream equals this batch join (EventStreamsSpec
    // pins the multi-batch streaming run).
    GQuery(
      "q273_stream_stream_join",
      """WITH e AS (SELECT user_id, ts AS e_ts, event_id AS e_id FROM events
        |           WHERE event_type = 'error'),
        |c AS (SELECT user_id, ts AS c_ts, event_id AS c_id, value FROM events
        |      WHERE event_type = 'click')
        |SELECT e.user_id, e.e_id, c.c_id, round(c.value, 6) AS value
        |FROM e JOIN c ON c.user_id = e.user_id
        | AND c.c_ts >= e.e_ts - INTERVAL 120 MINUTE AND c.c_ts <= e.e_ts""".stripMargin) {
      (s, dir) =>
      val ev = Tables.events(s, dir)
      EventStreams.precedingEventsJoin(
          ev.filter(col("event_type") === "error"),
          ev.filter(col("event_type") === "click"), windowMinutes = 120)
        .select(col("user_id"), col("e_id"), col("c_id"),
          round(col("value"), 6).as("value"))
    },

    // LEFT-OUTER stream-stream join: q273's join keeping the UNMATCHED
    // errors — "no click preceded this error" is the signal a training
    // pipeline joins FOR, not a row to drop. Null c_id/value rows come
    // straight from DuckDB's LEFT JOIN; the streaming leg (null rows gated
    // on watermark EVICTION, unlike inner's eager emission) is pinned by
    // EventStreamsSpec's held-then-healed case.
    GQuery(
      "q277_stream_stream_outer",
      """WITH e AS (SELECT user_id, ts AS e_ts, event_id AS e_id FROM events
        |           WHERE event_type = 'error'),
        |c AS (SELECT user_id, ts AS c_ts, event_id AS c_id, value FROM events
        |      WHERE event_type = 'click')
        |SELECT e.user_id, e.e_id, c.c_id, round(c.value, 6) AS value
        |FROM e LEFT JOIN c ON c.user_id = e.user_id
        | AND c.c_ts >= e.e_ts - INTERVAL 120 MINUTE AND c.c_ts <= e.e_ts""".stripMargin) {
      (s, dir) =>
      val ev = Tables.events(s, dir)
      EventStreams.precedingEventsJoin(
          ev.filter(col("event_type") === "error"),
          ev.filter(col("event_type") === "click"), windowMinutes = 120,
          joinType = "left_outer")
        .select(col("user_id"), col("e_id"), col("c_id"),
          round(col("value"), 6).as("value"))
    },

    // Per-user sliding-window z-score anomalies: each event against its
    // own trailing 20 events. The frame sums run over integer CENTS, so
    // the only floating point is the final mean/variance divisions + sqrt
    // (single correctly-rounded ops) — the oracle replays the identical
    // expression tree with the identical KEYED window (no global window
    // anywhere).
    GQuery(
      "q260_sliding_zscore",
      """WITH e AS (SELECT event_id, user_id, ts, round(value * 100)::BIGINT AS x
        |           FROM events),
        |w AS (SELECT event_id, user_id, x,
        |        count(x) OVER win AS n,
        |        sum(x) OVER win AS s1,
        |        sum(x * x) OVER win AS s2
        |      FROM e
        |      WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
        |                     ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)),
        |z AS (SELECT event_id, user_id,
        |        CASE WHEN n >= 5 AND (s2::DOUBLE - s1::DOUBLE * s1 / n) / (n - 1) > 0
        |             THEN round((x::DOUBLE - s1::DOUBLE / n)
        |                    / sqrt((s2::DOUBLE - s1::DOUBLE * s1 / n) / (n - 1)), 6)
        |        END AS z
        |      FROM w)
        |SELECT event_id, user_id, z, coalesce(abs(z) > 3.0, FALSE) AS anomaly
        |FROM z""".stripMargin) { (s, dir) =>
      EventStreams.slidingZScore(Tables.events(s, dir),
          window = 20, minPrev = 5, zThreshold = 3.0)
        .select("event_id", "user_id", "z", "anomaly")
    },

    // Retention cohort matrix: users grouped by first-seen day, distinct
    // active users per (cohort, days-since) — the engagement-decay card.
    GQuery(
      "q261_retention_cohort",
      """WITH f AS (SELECT user_id, date_trunc('day', min(ts))::DATE AS cd
        |           FROM events GROUP BY user_id),
        |u AS (SELECT e.user_id, f.cd,
        |             date_diff('day', f.cd, date_trunc('day', e.ts)::DATE) AS age_days
        |      FROM events e JOIN f USING (user_id))
        |SELECT strftime(cd, '%Y-%m-%d') AS cohort_day, age_days::BIGINT AS age_days,
        |       count(DISTINCT user_id) AS n_users
        |FROM u GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      EventStreams.retentionCohort(Tables.events(s, dir))
        .select(date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort_day"),
          col("age_days").cast("long").as("age_days"), col("n_users"))
    },

    // Streaming ingest dedup, batch twin: FIRST event per (user_id,
    // event_type) by (ts, event_id) — the deterministic form
    // dropDuplicatesWithinWatermark converges to when arrival respects
    // event order (EventStreamsSpec pins the streaming leg, including the
    // beyond-watermark straggler that gets READMITTED — bounded state is
    // the trade). The oracle is the same keyed window; no global window
    // anywhere.
    GQuery(
      "q284_stream_dedup_first",
      """SELECT event_id, user_id, event_type, round(value, 6) AS value
        |FROM (SELECT event_id, user_id, event_type, value,
        |             row_number() OVER (PARTITION BY user_id, event_type
        |                                ORDER BY ts, event_id) AS rn
        |      FROM events)
        |WHERE rn = 1""".stripMargin) { (s, dir) =>
      EventStreams.firstEventDedup(Tables.events(s, dir))
        .select(col("event_id"), col("user_id"), col("event_type"),
          round(col("value"), 6).as("value"))
    },
  )
}
