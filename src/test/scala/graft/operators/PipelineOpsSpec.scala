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

  test("bloom containment: exact at ample size, superset when tiny, partition-stable build") {
    import spark.implicits._
    val bench = Seq((100L, "alpha beta gamma delta")).toDF("id", "text")
    val docs = Seq(
      (1L, "alpha beta gamma delta"),          // exact containment 1.0
      (2L, "alpha beta gamma zork quux flam"), // exact 0.25
      (3L, "one two three four"),              // exact 0.0
      (4L, "too short")                        // < n tokens -> 0.0
    ).toDF("id", "text")
    // ample filter (2^20 bits for 2 bench shingles): zero FP probability in
    // practice -> bloom == exact
    val big = Bloom.build(bench, "text", n = 3, mBits = 1 << 20, kProbes = 4)
    val gotBig = Bloom.containmentScores(docs, big, "id", "text", n = 3, kProbes = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(gotBig == Map(1L -> 1.0, 2L -> 0.25, 3L -> 0.0, 4L -> 0.0))
    // tiny filter (64 bits): false positives can only ADD — no false negatives
    val tiny = Bloom.build(bench, "text", n = 3, mBits = 64, kProbes = 2)
    val gotTiny = Bloom.containmentScores(docs, tiny, "id", "text", n = 3, kProbes = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(gotTiny(1L) == 1.0)
    assert(gotTiny(2L) >= 0.25 && gotTiny(4L) == 0.0)
    // the OR-merge is partition-count independent
    val b1 = Bloom.build(bench.repartition(7), "text", n = 3, mBits = 1 << 10, kProbes = 3)
    val b2 = Bloom.build(bench.coalesce(1), "text", n = 3, mBits = 1 << 10, kProbes = 3)
    assert(b1.toSeq == b2.toSeq)
    // the probe hash equals the SQL md5-60 contract the oracles replay
    val sqlPos = spark.sql(
      "SELECT conv(substr(md5('alpha beta gamma:1'), 1, 15), 16, 10)")
      .head().getString(0).toLong % (1 << 10)
    val jvmPos = graft.functions.StableHash.md5Hash60("alpha beta gamma:1") % (1 << 10)
    assert(sqlPos == jvmPos)
  }

  test("noveltyScores: exact dup -> 0, near-dup -> 1 - jaccard, unrelated -> 1") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"),   // exact dup of 1
      (3L, "alpha beta gamma delta zeta"),      // near dup of 1/2
      (4L, "completely different words here entirely")
    ).toDF("doc_id", "text")
    val got = Dedup.noveltyScores(docs, "doc_id", "text", n = 3, threshold = 0.1)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) == 0.0 && got(2L) == 0.0) // identical shingle sets
    assert(got(4L) == 1.0)                   // shares no shingle
    assert(got(3L) > 0.0 && got(3L) < 1.0)   // partial overlap
  }
}
