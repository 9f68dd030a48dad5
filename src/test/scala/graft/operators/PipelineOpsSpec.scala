package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions

/** Edge cases for the round-2 pipeline additions: repetition ratio and
  * benchmark decontamination (the oracled queries cover the bulk behavior).
  */
class PipelineOpsSpec extends SparkSpec {

  test("repetitionRatio: empty, unique, degenerate") {
    import spark.implicits._
    val df = Seq(
      (1L, ""), (2L, "a b c d"), (3L, "spam spam spam spam"), (4L, "x y x y"))
      .toDF("id", "text")
      .select(col("id"),
        TextFunctions.repetitionRatio(TextFunctions.tokens(col("text"))).as("r"))
    val r = df.collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r(1) == 0.0)
    assert(r(2) == 0.0)
    assert(r(3) == 0.75)
    assert(r(4) == 0.5)
  }

  test("containmentScores: full, partial, zero containment") {
    import spark.implicits._
    val bench = Seq((100L, "alpha beta gamma delta")).toDF("id", "text")
    val docs = Seq(
      (1L, "alpha beta gamma delta"),          // all 2 trigrams contained
      (2L, "alpha beta gamma zork quux flam"), // 1 of 4 contained
      (3L, "one two three four")               // none
    ).toDF("id", "text")
    val got = Dedup.containmentScores(docs, bench, "id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1) == 1.0)
    assert(got(2) == 0.25)
    assert(got(3) == 0.0)
  }
}
