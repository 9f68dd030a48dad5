package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Frontier contracts: seen URLs never reschedule, the per-host cap
  * holds, the global budget takes the best scores with deterministic
  * url tiebreaks, and the plan uses a bounded-heap TakeOrdered, never a
  * global sort materialization.
  */
class FrontierSpec extends SparkSpec {
  import spark.implicits._

  private val candidates = (0 until 60).map(i =>
    (s"http://h${i % 3}.test/p/$i", (i * 7) % 50)).toDF("url", "score")
  private val seen = (0 until 60 by 4).map(i =>
    s"http://h${i % 3}.test/p/$i").toDF("url")

  test("seen URLs never reschedule; per-host cap holds; budget takes best") {
    val out = Frontier.select(candidates, seen, perHost = 5, total = 12)
    val rows = out.collect()
    assert(rows.length == 12)
    val seenSet = seen.collect().map(_.getString(0)).toSet
    assert(rows.forall(r => !seenSet.contains(r.getString(0))))
    val perHost = rows.groupBy(_.getString(2)).view.mapValues(_.length)
    assert(perHost.values.forall(_ <= 5), perHost.toMap.toString)
    assert(rows.forall(_.getInt(3) <= 5), "host_rank respects the cap")
    // the 12 selected carry the best scores among capped survivors
    val capped = Frontier.select(candidates, seen, perHost = 5, total = 1000)
      .collect().map(_.getInt(1)).sorted.reverse
    assert(rows.map(_.getInt(1)).sorted.reverse.toSeq == capped.take(12).toSeq)
  }

  test("determinism under score ties: same inputs, same wave") {
    val tied = (0 until 30).map(i => (s"http://t.test/$i", 7)).toDF("url", "score")
    val empty = Seq.empty[String].toDF("url")
    val a = Frontier.select(tied, empty, perHost = 30, total = 10)
      .collect().map(_.getString(0)).toSeq
    val b = Frontier.select(tied, empty, perHost = 30, total = 10)
      .collect().map(_.getString(0)).toSeq
    assert(a == b)
    assert(a == a.sorted, "url tiebreak orders the tied wave lexicographically")
  }

  test("duplicate candidate URLs collapse to ONE slot with the best score") {
    // the same URL discovered from several source pages arrives as
    // several rows — it must occupy one politeness slot and fetch once
    val dup = Seq(
      ("http://d.test/a", 10), ("http://d.test/a", 50), ("http://d.test/a", 30),
      ("http://d.test/b", 40),
      ("http://d.test/c", 20)).toDF("url", "score")
    val empty = Seq.empty[String].toDF("url")
    val out = Frontier.select(dup, empty, perHost = 2, total = 10)
      .select("url", "score").collect().map(r => r.getString(0) -> r.getInt(1))
    assert(out.length == 2, s"per-host cap of 2 admits two URLS, not rows: ${out.toSeq}")
    assert(out.toMap == Map("http://d.test/a" -> 50, "http://d.test/b" -> 40),
      "the duplicate keeps its best score and /c is capped out, " +
        s"got ${out.toSeq}")
    // without the cap binding, each distinct URL appears exactly once
    val all = Frontier.select(dup, empty, perHost = 10, total = 10).collect()
    assert(all.length == 3 && all.map(_.getString(0)).distinct.length == 3)
  }

  test("crawl-delay host budgets: rate x wave = per-wave cap, floor 1") {
    val cand = (0 until 10).flatMap(i => Seq(
      (s"http://slow.test/p/$i", 100 - i),
      (s"http://rated.test/p/$i", 100 - i),
      (s"http://free.test/p/$i", 100 - i))).toDF("url", "score")
    val empty = Seq.empty[String].toDF("url")
    val delays = Seq(("rated.test", 2.0), ("slow.test", 100.0))
      .toDF("host", "crawl_delay")
    val out = Frontier.select(cand, empty, perHost = 5, total = 100,
        hostDelays = Some(delays), waveSeconds = 6.0)
      .collect().groupBy(_.getString(2)).view.mapValues(_.length).toMap
    // rated: min(5, floor(6/2)=3) = 3; slow: floor(6/100)=0 -> floor 1
    // (a delay longer than the wave still advances one fetch, never
    // starves); free (no declared delay): perHost = 5
    assert(out == Map("rated.test" -> 3, "slow.test" -> 1, "free.test" -> 5),
      out.toString)
    // hostDelays without a positive waveSeconds is a caller error
    intercept[IllegalArgumentException] {
      Frontier.select(cand, empty, perHost = 5, total = 10,
        hostDelays = Some(delays))
    }
  }

  test("selectWithRecrawl: stale fetches rejoin the pool, fresh stay out") {
    val cand = (0 until 12).map(i => (s"http://r.test/$i", 100 - i))
      .toDF("url", "score")
    // urls 0..5 seen: 0..2 fetched long ago (stale), 3..5 recent
    val seen = (0 until 6).map(i =>
      (s"http://r.test/$i", if (i < 3) 500L else 1190L))
      .toDF("url", "fetched_at")
    val wave = Frontier.selectWithRecrawl(cand, seen, perHost = 20,
        total = 20, nowSeconds = 1200L, recrawlAfterSeconds = 100L)
      .collect().map(_.getString(0)).toSet
    val expected = ((0 until 3) ++ (6 until 12)).map(i => s"http://r.test/$i").toSet
    assert(wave == expected,
      s"stale (0-2) recrawl, fresh (3-5) excluded: $wave")
    intercept[IllegalArgumentException] {
      Frontier.selectWithRecrawl(cand, seen, 5, 5, 1200L,
        recrawlAfterSeconds = 0L)
    }
  }

  test("updateSeen keeps the latest fetch per url; feeds recrawl directly") {
    val seen0 = Seq(("http://u.test/a", 100L), ("http://u.test/b", 200L))
      .toDF("url", "fetched_at")
    val wave = Seq(("http://u.test/a", 900L), ("http://u.test/c", 950L))
      .toDF("url", "fetched_at")
    val seen1 = Frontier.updateSeen(seen0, wave)
    val got = seen1.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("http://u.test/a" -> 900L, "http://u.test/b" -> 200L,
      "http://u.test/c" -> 950L))
    // the folded table drives the next recrawl decision: only b is stale
    val cand = Seq(("http://u.test/a", 1), ("http://u.test/b", 1),
      ("http://u.test/c", 1)).toDF("url", "score")
    val next = Frontier.selectWithRecrawl(cand, seen1, perHost = 9,
        total = 9, nowSeconds = 1000L, recrawlAfterSeconds = 300L)
      .collect().map(_.getString(0)).toSet
    assert(next == Set("http://u.test/b"))
  }

  test("scheduled_offset_ms: the k-th fetch from a rate-limited host " +
      "goes out at (k-1) x delay") {
    val cand = (0 until 4).map(i => (s"http://sched.test/$i", 50 - i))
      .toDF("url", "score")
    val empty = Seq.empty[String].toDF("url")
    val delays = Seq(("sched.test", 1.5)).toDF("host", "crawl_delay")
    val rows = Frontier.select(cand, empty, perHost = 4, total = 4,
        hostDelays = Some(delays), waveSeconds = 10.0)
      .select("url", "host_rank", "scheduled_offset_ms").collect()
      .map(r => r.getString(0) -> (r.getInt(1), r.getLong(2))).toMap
    (0 until 4).foreach { i =>
      assert(rows(s"http://sched.test/$i") == ((i + 1, (i * 1500).toLong)),
        rows.toString)
    }
    // no declared delay -> offset 0 (fetch immediately), column present
    val free = Frontier.select(cand, empty, perHost = 4, total = 4,
        hostDelays = Some(Seq(("other.test", 9.0)).toDF("host", "crawl_delay")),
        waveSeconds = 10.0)
      .select("scheduled_offset_ms").collect().map(_.getLong(0))
    assert(free.forall(_ == 0L))
    // without hostDelays the schema is unchanged (no schedule column)
    assert(!Frontier.select(cand, empty, 4, 4).columns
      .contains("scheduled_offset_ms"))
  }

  test("plan: bounded-heap TakeOrdered, keyed window, no global sort") {
    val df = Frontier.select(candidates, seen, perHost = 5, total = 12)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"global budget must be a bounded heap:\n$plan")
    assert(!plan.contains("Sort [score"), // the only ordering is inside TakeOrdered/window
      s"no standalone global sort:\n$plan")
    // the crawl-delay path keeps the same shape: the delay join keys on
    // host (the politeness window's own key) and the budget stays a
    // bounded heap — no new global sort, no extra window
    val delays = Seq(("h0.test", 2.0)).toDF("host", "crawl_delay")
    val dd = Frontier.select(candidates, seen, perHost = 5, total = 12,
      hostDelays = Some(delays), waveSeconds = 10.0)
    dd.collect()
    val dplan = dd.queryExecution.executedPlan.toString
    assert(dplan.contains("TakeOrderedAndProject"), dplan)
    assert(!dplan.contains("Sort [score"), dplan)
  }
}
