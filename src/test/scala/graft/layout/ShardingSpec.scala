package graft.layout

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.HashMode

/** Rendezvous sharding: the HRW structural invariant (growth only STEALS
  * to new shards — no reshuffling among surviving shards), rough balance,
  * mode-agnostic statistics, and determinism.
  */
class ShardingSpec extends SparkSpec {
  import spark.implicits._

  private def ids(n: Int) = (0L until n.toLong).toDF("doc_id")

  test("growth N->M: every moved doc lands on a NEW shard (never old->old)") {
    Seq(HashMode.Md5, HashMode.Xx64).foreach { m =>
      val from = Sharding.rendezvousAssign(ids(2000), "doc_id", 8, m)
        .withColumnRenamed("shard", "s_from")
      val to = Sharding.rendezvousAssign(ids(2000), "doc_id", 12, m)
        .withColumnRenamed("shard", "s_to")
      val moved = from.join(to, "doc_id").filter(col("s_from") =!= col("s_to"))
      val bad = moved.filter(col("s_to") < 8).count()
      assert(bad == 0, s"mode ${m.name}: $bad docs moved old->old")
      // moved fraction near (12-8)/12 = 1/3 (binomial tolerance)
      val frac = moved.count().toDouble / 2000
      assert(math.abs(frac - 1.0 / 3) < 0.05, s"mode ${m.name}: moved $frac")
    }
  }

  test("assignment is balanced and total") {
    val a = Sharding.rendezvousAssign(ids(4000), "doc_id", 8)
    val counts = a.groupBy("shard").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts.keySet == (0L until 8L).toSet)
    counts.values.foreach(c => assert(math.abs(c - 500.0) < 150, counts))
    assert(a.count() == 4000)
  }

  test("deterministic: same ids, same shards, both modes") {
    Seq(HashMode.Md5, HashMode.Xx64).foreach { m =>
      val a = Sharding.rendezvousAssign(ids(500), "doc_id", 5, m)
        .select("doc_id", "shard").as[(Long, Long)].collect().toSet
      val b = Sharding.rendezvousAssign(ids(500), "doc_id", 5, m)
        .select("doc_id", "shard").as[(Long, Long)].collect().toSet
      assert(a == b)
    }
  }

  test("jumpAssign: balanced, stable under growth (never old->old), deterministic") {
    val a16 = Sharding.jumpAssign(ids(20000), "doc_id", 16)
      .select("doc_id", "shard").as[(Long, Long)].collect().toMap
    val a24 = Sharding.jumpAssign(ids(20000), "doc_id", 24)
      .select("doc_id", "shard").as[(Long, Long)].collect().toMap
    // total + in range + balanced
    assert(a16.size == 20000 && a16.values.forall(s => s >= 0 && s < 16))
    val counts = a16.values.groupBy(identity).map(_._2.size)
    counts.foreach(c => assert(math.abs(c - 1250.0) < 400, counts))
    // growth 16->24: every moved key lands on a NEW shard; moved fraction
    // near (24-16)/24 = 1/3
    val moved = a16.keys.filter(k => a16(k) != a24(k))
    moved.foreach(k => assert(a24(k) >= 16, s"key $k moved old->old"))
    assert(math.abs(moved.size / 20000.0 - 1.0 / 3) < 0.03)
    // kernel is deterministic and matches a reference triple
    assert(Sharding.jumpKernel(0L, 1) == 0L)
    (1 to 50).foreach { n =>
      val b = Sharding.jumpKernel(123456789L, n)
      assert(b >= 0 && b < n)
    }
    intercept[IllegalArgumentException](Sharding.jumpAssign(ids(5), "doc_id", 0))
  }

  test("jumpAssign carries payload columns through (same contract as HRW)") {
    val df = ids(200).withColumn("payload", col("doc_id") * 2)
    val a = Sharding.jumpAssign(df, "doc_id", 8)
    assert(a.columns.toSeq == Seq("doc_id", "payload", "shard"))
    assert(a.filter(col("payload") =!= col("doc_id") * 2).count() == 0)
    assert(a.filter(col("shard") < 0 || col("shard") >= 8).count() == 0)
    assert(a.count() == 200)
  }

  test("jump stability card holds at 1M shards — the regime HRW's guard refuses") {
    val row = Sharding.jumpStabilityCard(ids(20000), "doc_id",
      1000000, 1250000).collect()(0)
    assert(row.getAs[String]("policy") == "jump")
    assert(row.getAs[Long]("n_docs") == 20000L)
    // analytic expectation (M-N)/M = 0.2; binomial sd ~ 0.0028
    assert(row.getAs[Double]("expected_frac") == 0.2)
    assert(math.abs(row.getAs[Double]("moved_frac") - 0.2) < 0.02,
      s"moved_frac ${row.getAs[Double]("moved_frac")}")
    // growth moves keys ONLY onto the new shards
    assert(row.getAs[Long]("moved_old_to_old") == 0L)
    // shrink: expectation null, and every key must land back in range
    val shrink = Sharding.jumpStabilityCard(ids(5000), "doc_id",
      1250000, 1000000).collect()(0)
    assert(shrink.isNullAt(shrink.fieldIndex("expected_frac")))
  }

  test("rendezvousAssign rejects shard counts past the per-row-cost regime") {
    intercept[IllegalArgumentException](
      Sharding.rendezvousAssign(ids(5), "doc_id", 100000))
  }

  test("stability card: shrink gives null expectation; bad counts fail loudly") {
    val card = Sharding.reshardStabilityCard(ids(300), "doc_id", 10, 8)
      .collect().map(r => r.getString(0) -> r.isNullAt(4)).toMap
    assert(card("hrw") && card("modulo")) // both expected_frac null on shrink
    intercept[IllegalArgumentException] {
      Sharding.rendezvousAssign(ids(10), "doc_id", 0)
    }
  }
}
