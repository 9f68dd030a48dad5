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
    // steps: 1 tmp written; 2 watermark persisted; 3 live renamed aside;
    // 4 tmp renamed live; 5 aside deleted; 6 (control) no crash
    (1 to 6).foreach { step =>
      val slab = new SlabTable(spark, freshDir(s"slab-crash$step"))
      seed(slab)
      if (step <= 5)
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
    intercept[RuntimeException](slab.compactWithFailpoint("ns", 3))
    // at this point the live dir is GONE and the aside dir holds the old
    // generation — a fresh handle (new process) must heal on first read
    assert(!new java.io.File(s"$dir/ns=ns").exists())
    val fresh = new SlabTable(spark, dir)
    assert(fresh.read("ns").count() == liveIds.size.toLong)
    assert(!new java.io.File(s"$dir/.old-ns").exists(), "aside dir not cleaned")
  }
}
