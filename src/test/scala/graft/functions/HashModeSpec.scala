package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.DataFrame

import graft.SparkSpec
import graft.operators.{Cms, Dedup, Dsir}

/** The pluggable-hash contract: kernel == Column per mode, values in
  * [0, 2⁶⁰), plan shapes mode-agnostic, and collision-free-equality
  * consumers (dupspans) produce IDENTICAL results in both modes.
  */
class HashModeSpec extends SparkSpec {
  import spark.implicits._

  private val modes = Seq(HashMode.Md5, HashMode.Xx64)

  private val samples: Seq[String] = {
    val rnd = new scala.util.Random(47)
    val ascii = (1 to 40).map(_ =>
      (1 to (1 + rnd.nextInt(12))).map(_ => (' ' + rnd.nextInt(94)).toChar).mkString)
    ascii ++ Seq("", "日本語テキスト", "𝔞𝔟𝔠", "naïve café", "a:0", "a : 0")
  }

  test("kernel hash60 equals the Column form for BOTH modes") {
    val df = samples.toDF("s")
    for (mode <- modes) {
      val viaCol = df.select(col("s"), mode.col60(col("s")).as("h"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      samples.foreach { s =>
        assert(mode.hash60(s) == viaCol(s), s"mode=${mode.name} s='$s'")
        assert(mode.hash60(s) >= 0L && mode.hash60(s) < (1L << 60),
          s"mode=${mode.name} out of 60-bit range")
      }
    }
  }

  test("modes disagree on bucket assignment (xx64 is not md5 renamed)") {
    assert(samples.filter(_.nonEmpty).exists(s =>
      HashMode.Md5.hash60(s) != HashMode.Xx64.hash60(s)))
  }

  test("parse accepts the documented spellings and rejects others") {
    assert(HashMode.parse("md5") == HashMode.Md5)
    assert(HashMode.parse("xx64") == HashMode.Xx64)
    assert(HashMode.parse("XXHASH64") == HashMode.Xx64)
    intercept[IllegalArgumentException](HashMode.parse("sha1"))
  }

  // -- plan-shape mode-agnosticism -----------------------------------------

  private def executedPlan(df: DataFrame): SparkPlan = {
    df.collect()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  private def shuffleCount(plan: SparkPlan): Int =
    plan.collect { case _: ShuffleExchangeExec => 1 }.sum +
      plan.toString.linesIterator
        .count(l => l.contains("ShuffleQueryStage") && !l.contains("Reused"))

  private lazy val corpus = Seq(
    (1L, "the cat sat on the mat and the cat sat again"),
    (2L, "a completely different document about spark plans"),
    (3L, "the cat sat on the mat and the cat sat again"),
    (4L, "boilerplate header the cat sat on the mat boilerplate"))
    .toDF("doc_id", "text")

  test("DSIR plan shape is hash-mode-agnostic (same shuffle count)") {
    val target = Seq((9L, "the cat sat")).toDF("doc_id", "text")
    val counts = modes.map { m =>
      shuffleCount(executedPlan(
        Dsir.importanceWeights(corpus, target, "doc_id", "text", 64, m)))
    }
    assert(counts.distinct.size == 1, s"shuffle counts diverge: $counts")
  }

  test("CMS probe stays a zero-exchange map in BOTH modes") {
    for (m <- modes) {
      val grid = Cms.build(
        corpus.select(explode(split(lower(col("text")), " ")).as("term")),
        "term", 2, 1024, m)
      val probe = Cms.commonTokenFraction(corpus, grid, 2, "doc_id", "text",
        threshold = 2L, mode = m)
      assert(shuffleCount(executedPlan(probe)) == 0, s"mode=${m.name}")
    }
  }

  // -- cross-mode result identity where the hash is equality-only ----------

  test("dupspans removal is IDENTICAL across modes (collision-free equality)") {
    val got = modes.map { m =>
      Dedup.removeDuplicatedSpans(corpus, "doc_id", "text", w = 4, mode = m)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    }
    assert(got(0) == got(1))
    // and the planted exact duplicate was actually excised
    assert(got(0).exists { case (id, _, n) => (id == 1L || id == 3L) && n > 0 })
  }

  test("CMS overestimate-only guarantee holds in xx64 mode") {
    val toks = corpus.select(explode(split(lower(col("text")), " ")).as("term"))
    val exact = toks.groupBy("term").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val grid = Cms.build(toks, "term", 4, 4096, HashMode.Xx64)
    Cms.estimates(toks, grid, 4, "term", mode = HashMode.Xx64)
      .collect().foreach { r =>
        assert(r.getLong(1) >= exact(r.getString(0)), s"term=${r.getString(0)}")
      }
  }
}
