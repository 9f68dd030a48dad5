package graft.operators

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** PLANS.md claims a skewed SemDeDup cell is "AQE skew-join territory" —
  * this asserts it: plant one giant cell (half the corpus), run the
  * sharded pair stage under AQE skew-join, and machine-check the final
  * adaptive plan actually split the skewed partition (`skew=true` on the
  * sort-merge join). Without the split, one task would compute the whole
  * |giant|²/2 pair block while every other task idles — the exact failure
  * mode at 100 TB.
  */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("sharded pair stage splits the planted giant cell (skew=true in the plan)") {
    // local (not spec members): the typed map closure must not capture
    // the non-serializable suite instance
    val dim = 8
    val noise = (i: Long, j: Int) =>
      ((graft.functions.StableHash.fnv64(s"n:$i:$j") >>> 40).toFloat / (1L << 24) - 0.5f) * 0.01f
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.shuffle.partitions")
    val saved = keys.map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // scale the 256 MB production threshold down so a ~400 KB planted
      // cell is "giant" relative to this test's data
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "65536")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32768")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      // spread the 64 cells one-per-partition so the giant cell dominates
      // the MEDIAN partition size (the skew detector compares against it)
      conf.set("spark.sql.shuffle.partitions", "64")

      // 64 well-separated centroids; HALF of 12k embeddings sit (with tiny
      // noise) on centroid 0, the rest spread over the other 63
      val centroids = (0L until 64L).map { c =>
        (c, Array.tabulate(dim)(j => if (j == (c % dim).toInt) (10f + c) else 0f).toSeq)
      }.toDF("cell", "centroid")
      val embs = spark.range(12000L).select(col("id"),
          when(col("id") < 6000L, lit(0L)).otherwise(col("id") % 63 + 1).as("c"))
        .as[(Long, Long)]
        .map { case (i, c) =>
          val v = Array.tabulate(dim)(j =>
            (if (j == (c % dim).toInt) (10f + c) else 0f) + noise(i, j))
          (i, v.toSeq)
        }.toDF("vec_id", "embedding")

      val pairs = Dedup.embeddingNearDupPairsSharded(
        embs, "vec_id", "embedding", threshold = 0.999999, centroids)
      val agg = pairs.groupBy().count()
      val n = agg.collect()(0).getLong(0)
      // the giant cell's noise keeps most cosines under the threshold but
      // the pair stream itself (6000²/2 in cell 0) was fully computed
      assert(n >= 0L)
      val plan = agg.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      assert(plan.toString.contains("skew=true"),
        s"AQE did not split the giant cell:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
