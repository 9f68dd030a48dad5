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

  test("plan: bounded-heap TakeOrdered, keyed window, no global sort") {
    val df = Frontier.select(candidates, seen, perHost = 5, total = 12)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"global budget must be a bounded heap:\n$plan")
    assert(!plan.contains("Sort [score"), // the only ordering is inside TakeOrdered/window
      s"no standalone global sort:\n$plan")
  }
}
