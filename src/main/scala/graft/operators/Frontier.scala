package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Crawl frontier selection — the scheduling step between link
  * extraction and the next fetch wave: scored candidate URLs (host
  * authority / PageRank from the graph layer), minus everything already
  * seen, capped PER HOST (politeness — no crawl spends its budget
  * hammering one host) and then globally budgeted.
  *
  * Spark shape: candidates DEDUP first (the same URL discovered from
  * many source pages is one fetch, not many — a keyed row_number over
  * the url, keeping the best score, so duplicates never occupy extra
  * politeness slots or trigger double fetches); the seen-set subtraction
  * is one LEFT ANTI hash join on the url key; the per-host cap is a
  * KEYED window (row_number partitioned by host — never a global
  * window); the global budget compiles to TakeOrderedAndProject (a
  * bounded heap per partition + one merge — no full sort ever
  * materializes). Ties break by url so the selected set is
  * deterministic, which is what makes the frontier resumable (the same
  * inputs always schedule the same wave).
  *
  * `hostDelays` (host, crawl_delay seconds — [[RobotsTxt.compileDelays]]
  * output) turns each host's declared politeness RATE into a per-wave
  * budget: a wave spanning `waveSeconds` admits at most
  * `floor(waveSeconds / crawl_delay)` fetches from that host (never
  * below 1 — a delay longer than the wave still advances one fetch per
  * wave instead of starving the host forever), further capped by
  * `perHost`. Hosts without a declared delay use `perHost` alone.
  */
object Frontier {

  def select(candidates: DataFrame, seen: DataFrame, perHost: Int,
      total: Int, urlCol: String = "url",
      scoreCol: String = "score",
      hostDelays: Option[DataFrame] = None,
      waveSeconds: Double = 0.0): DataFrame = {
    require(perHost > 0, s"frontier: perHost must be positive, got $perHost")
    require(total > 0, s"frontier: total must be positive, got $total")
    require(hostDelays.isEmpty || waveSeconds > 0,
      s"frontier: hostDelays needs waveSeconds > 0 to derive per-wave " +
        s"host budgets, got $waveSeconds")
    // one row per candidate URL, best score wins (a URL found by many
    // pages would otherwise burn several politeness slots and fetch twice)
    val dw = Window.partitionBy(urlCol).orderBy(col(scoreCol).desc)
    val deduped = candidates
      .withColumn("_dup", row_number().over(dw))
      .filter(col("_dup") === 1).drop("_dup")
    val fresh = deduped.join(
      seen.select(col(urlCol)).distinct(), Seq(urlCol), "left_anti")
    val withHost = fresh.withColumn("host",
      lower(regexp_extract(col(urlCol), "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/]+)", 1)))
    // per-host cap: the politeness window, tightened by the host's
    // declared crawl-delay when one exists (rate × wave length = budget)
    val budgeted = hostDelays match {
      case None => withHost
        .withColumn("_cap", lit(perHost)).withColumn("_delay", lit(null))
      case Some(delays) =>
        // no broadcast hint: the left join keys on host, the SAME key the
        // politeness window partitions by — a hash-partitioned join means
        // the window reuses the exchange instead of adding one (and at
        // crawl scale the delay table is per-host, not guaranteed tiny)
        withHost
          .join(delays.select(col("host"),
            col("crawl_delay").cast("double").as("_delay")), Seq("host"), "left")
          .withColumn("_cap",
            when(col("_delay").isNull || col("_delay") <= 0, lit(perHost))
              .otherwise(least(lit(perHost),
                greatest(lit(1L), floor(lit(waveSeconds) / col("_delay"))))))
          // the host-keyed join moved `host` to the front; restore the
          // candidates-then-host order the no-delay path emits
          .select((withHost.columns.map(col) ++
            Seq(col("_cap"), col("_delay"))).toSeq: _*)
    }
    val w = Window.partitionBy("host")
      .orderBy(col(scoreCol).desc, col(urlCol))
    val ranked = budgeted
      .withColumn("host_rank", row_number().over(w))
      .filter(col("host_rank") <= col("_cap"))
    // when delays are declared, emit each fetch's WITHIN-WAVE schedule:
    // the k-th fetch from a rate-limited host goes out at (k-1)·delay —
    // the politeness contract is a RATE, not just a count, and the
    // fetcher consumes these offsets directly
    val scheduled = if (hostDelays.isDefined)
      ranked.withColumn("scheduled_offset_ms",
        ((col("host_rank") - 1) * coalesce(col("_delay"), lit(0.0)) * 1000.0)
          .cast("long"))
    else ranked
    scheduled
      .drop("_cap", "_delay")
      .orderBy(col(scoreCol).desc, col(urlCol))
      .limit(total)
  }

  /** Seen-set maintenance for the recrawl loop: fold a fetched wave into
    * the seen table, keeping the LATEST fetch time per URL — one
    * url-keyed aggregation, the exact shape [[selectWithRecrawl]]'s
    * anti-join consumes. `fetched` rows need (urlCol, fetchedAtCol);
    * pass the wave's fetch timestamps (epoch seconds).
    */
  def updateSeen(seen: DataFrame, fetched: DataFrame,
      urlCol: String = "url", fetchedAtCol: String = "fetched_at"): DataFrame =
    seen.select(col(urlCol), col(fetchedAtCol))
      .unionByName(fetched.select(col(urlCol), col(fetchedAtCol)))
      .groupBy(urlCol)
      .agg(max(col(fetchedAtCol)).as(fetchedAtCol))

  /** [[select]] with RECRAWL: `seen` carries when each URL was last
    * fetched (`fetchedAtCol`, epoch seconds), and entries older than
    * `recrawlAfterSeconds` REJOIN the candidate pool — the revisit
    * policy a continuous crawl runs (pages change; a seen-set that only
    * grows never refreshes anything). `nowSeconds` is caller-supplied so
    * waves stay deterministic and resumable (the engine never reads the
    * clock). The anti-join keys stay url-only: the recency filter is a
    * per-row predicate pushed into the seen-set scan.
    */
  def selectWithRecrawl(candidates: DataFrame, seen: DataFrame,
      perHost: Int, total: Int, nowSeconds: Long, recrawlAfterSeconds: Long,
      urlCol: String = "url", scoreCol: String = "score",
      fetchedAtCol: String = "fetched_at",
      hostDelays: Option[DataFrame] = None,
      waveSeconds: Double = 0.0): DataFrame = {
    require(recrawlAfterSeconds > 0,
      s"frontier: recrawlAfterSeconds must be positive, got $recrawlAfterSeconds")
    val stillFresh = seen
      .filter(col(fetchedAtCol) > nowSeconds - recrawlAfterSeconds)
      .select(col(urlCol))
    select(candidates, stillFresh, perHost, total, urlCol, scoreCol,
      hostDelays, waveSeconds)
  }
}
