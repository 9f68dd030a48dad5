package graft.sources.slab

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Crash-atomicity of slab compaction: a crash injected after EVERY step
  * of the swap sequence must leave the namespace readable (after the
  * read-side recovery) with either the complete pre-compact view or the
  * complete post-compact view — same live rows either way — and the high
  * watermark must never drop below the pre-compact ceiling, so
  * ascending-append safety survives any interleaving (the reference's
  * `.buffer`-then-rename discipline, docs/reference.md:157-162).
  */
class SlabCrashSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(name: String): String =
    java.nio.file.Paths.get("target", name + "-" + System.nanoTime()).toString

  private def seed(slab: SlabTable): Unit = {
    slab.append("ns", (0L until 40L).map(i => (i, s"r$i".getBytes)).toDF("ordinal", "data"))
    slab.delete("ns", Seq(5L, 17L, 39L).toDF("ordinal"))
  }

  private val liveIds = (0L until 40L).filterNot(Set(5L, 17L, 39L)).toSet

  test("a crash after every compact step leaves a complete, watermark-safe view") {
    // steps: 1 tmp written; 2 wm staged; 3 old wm renamed aside; 4 staged
    // wm renamed live; 5 wm aside deleted; 6 live data renamed aside;
    // 7 tmp renamed live; 8 data aside deleted; 9 (control) no crash
    (1 to 9).foreach { step =>
      val slab = new SlabTable(spark, freshDir(s"slab-crash$step"))
      seed(slab)
      if (step <= 8)
        intercept[RuntimeException](slab.compactWithFailpoint("ns", step))
      else slab.compact("ns")

      // the view (read-side recovery included) is complete at every point
      val got = slab.read("ns").select("ordinal").as[Long].collect().toSet
      assert(got == liveIds, s"step $step: live view incomplete")
      // the ceiling never drops below the pre-compact max
      assert(slab.maxOrdinal("ns") == 39L, s"step $step: watermark lost")
      // re-appending the reclaimed top ordinal stays rejected
      intercept[IllegalArgumentException] {
        slab.append("ns", Seq((39L, "again".getBytes)).toDF("ordinal", "data"))
      }
      // a rerun compact converges from any crash point
      slab.compact("ns")
      assert(slab.read("ns").select("ordinal").as[Long].collect().toSet == liveIds)
      assert(slab.deadCount("ns") == 0L, s"step $step: tombstones survived rerun")
      assert(slab.maxOrdinal("ns") == 39L)
      slab.append("ns", Seq((40L, "next".getBytes)).toDF("ordinal", "data"))
      assert(new String(slab.get("ns", 40L).get) == "next")
    }
  }

  test("recovery restores the old generation when the crash hit between renames") {
    val dir = freshDir("slab-crash-mid")
    val slab = new SlabTable(spark, dir)
    seed(slab)
    intercept[RuntimeException](slab.compactWithFailpoint("ns", 6))
    // at this point the live dir is GONE and the aside dir holds the old
    // generation — a fresh handle (new process) must heal on first read
    assert(!new java.io.File(s"$dir/ns=ns").exists())
    val fresh = new SlabTable(spark, dir)
    assert(fresh.read("ns").count() == liveIds.size.toLong)
    assert(!new java.io.File(s"$dir/.old-ns").exists(), "aside dir not cleaned")
  }

  test("watermark survives a crash mid-swap after a prior compact reclaimed the top ordinal") {
    // after the FIRST compact the raw data max (38) is below the persisted
    // watermark (39): the ceiling now lives ONLY in wm=ns, so a crash in
    // the second compact's watermark swap is the window where a
    // delete-then-rename scheme would lose it and let ordinal 39 be
    // re-appended. Every wm-swap failpoint (3 = old wm aside, wm gone;
    // 4 = new wm live, aside present; 5 = pre-data-swap) must keep 39.
    (3 to 5).foreach { step =>
      val dir = freshDir(s"slab-wm-crash$step")
      val slab = new SlabTable(spark, dir)
      seed(slab)
      slab.compact("ns")
      assert(slab.maxOrdinal("ns") == 39L)
      intercept[RuntimeException](slab.compactWithFailpoint("ns", step))
      val fresh = new SlabTable(spark, dir)
      assert(fresh.maxOrdinal("ns") == 39L, s"step $step: watermark lost")
      intercept[IllegalArgumentException] {
        fresh.append("ns", Seq((39L, "again".getBytes)).toDF("ordinal", "data"))
      }
      fresh.compact("ns")
      assert(fresh.maxOrdinal("ns") == 39L)
      assert(!new java.io.File(s"$dir/.wm-old-ns").exists, s"step $step: wm aside not cleaned")
    }
  }
}
