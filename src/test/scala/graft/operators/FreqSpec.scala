package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Misra-Gries: the n/(k+1) superset guarantee, summary size bound,
  * merge-order invariance of the guaranteed-heavy OUTPUT (the counter
  * values may differ; the phase-2 result may not), and exactness of the
  * restricted second pass.
  */
class FreqSpec extends SparkSpec {

  private lazy val docs =
    graft.Tables.documents(spark, "/root/testdata/sf0.001").cache()

  private lazy val toks = docs
    .select(explode(split(lower(col("text")), " ")).as("term"))
    .filter(col("term") =!= "").cache()

  private lazy val exact: Map[String, Long] =
    toks.groupBy("term").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("summary keeps at most k counters and exact n") {
    val k = 5
    val acc = Freq.mgSummary(toks, "term", k)
    assert(acc.counts.size <= k)
    assert(acc.n == toks.count())
  }

  test("every term with true count > n/(k+1) survives the summary") {
    val k = 7
    val acc = Freq.mgSummary(toks, "term", k)
    val threshold = acc.n.toDouble / (k + 1)
    val mustSurvive = exact.filter(_._2 > threshold).keySet
    assert(mustSurvive.subsetOf(acc.counts.keySet),
      s"guarantee violated, missing: ${mustSurvive.diff(acc.counts.keySet)}")
  }

  test("guaranteedHeavy == exact heavy set with exact counts, under any partitioning") {
    val k = 7
    val n = toks.count()
    val want = exact.filter(_._2 > n.toDouble / (k + 1))
    for (parts <- Seq(1, 3, 13)) {
      val got = Freq.guaranteedHeavy(toks.repartition(parts), "term", k)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == want, s"parts=$parts: $got != $want")
    }
  }

  test("a planted overwhelming term is always caught, even with k=1") {
    import spark.implicits._
    val planted = (Seq.fill(500)("zzz") ++ (1 to 400).map(i => s"t$i")).toDF("term")
    val got = Freq.guaranteedHeavy(planted.repartition(11), "term", k = 1)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("zzz", 500L)))
  }

  test("threshold filter can legitimately be empty on a uniform stream") {
    import spark.implicits._
    val uniform = (1 to 300).map(i => s"u${i % 100}").toDF("term")
    // 100 types x 3 each; with k=10 the guarantee threshold is 300/11 > 3
    assert(Freq.guaranteedHeavy(uniform, "term", k = 10).count() == 0L)
  }
}
