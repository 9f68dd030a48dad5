package graft.layout

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

import graft.SparkSpec

/** Bucketed co-located join: no exchange in the executed plan, identical
  * results to the shuffled join.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed-bucketed equi-join plans without a shuffle exchange") {
    val left = (0L until 2000L).map(i => (i, s"payload-$i")).toDF("key", "pay")
    val right = (0L until 2000L by 2).map(i => (i, i * 10)).toDF("key", "val")
    Bucketing.writeBucketed(left, "b_left", "key", 4)
    Bucketing.writeBucketed(right, "b_right", "key", 4)

    // force the non-broadcast path: a broadcast join has no shuffle either,
    // which would make the no-exchange assertion vacuous
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.readTable(spark, "b_left")
        .join(Bucketing.readTable(spark, "b_right"), "key")
      val rows = joined.collect()

      // result parity with the plain (shuffled) join
      val expect = left.join(right, "key").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(rows.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet == expect)
      assert(rows.length == 1000)

      // sort-merge join over the bucketed layout, ZERO shuffle exchanges:
      // both sides are already hash-distributed by the bucket key.
      // MUST unwrap AQE: AdaptiveSparkPlanExec is a LeafExecNode, so a
      // collect on the outer plan never descends and would pass vacuously.
      val executed = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      assert(!executed.isInstanceOf[AdaptiveSparkPlanExec])
      val shuffles = executed.collect { case s: ShuffleExchangeExec => s }
      assert(shuffles.isEmpty, s"unexpected shuffles in:\n$executed")
      assert(executed.toString.contains("SortMergeJoin"),
        s"expected SortMergeJoin over bucketed scans in:\n$executed")
      // belt-and-braces on the rendered plan too
      assert(!executed.toString.contains("Exchange"),
        s"unexpected exchange in:\n$executed")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("mismatched bucket counts still produce correct results") {
    val left = (0L until 100L).map(i => (i, i.toString)).toDF("key", "a")
    val right = (0L until 100L).map(i => (i, i * 2)).toDF("key", "b")
    Bucketing.writeBucketed(left, "m_left", "key", 4)
    Bucketing.writeBucketed(right, "m_right", "key", 2)
    val joined = Bucketing.readTable(spark, "m_left")
      .join(Bucketing.readTable(spark, "m_right"), "key")
    assert(joined.count() == 100)
  }
}
