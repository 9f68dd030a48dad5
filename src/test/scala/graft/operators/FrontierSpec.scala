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
