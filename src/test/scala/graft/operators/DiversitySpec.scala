package graft.operators

import graft.SparkSpec

/** distinct-n: hand-computed ratios, repetition sensitivity, and totality
  * on degenerate inputs.
  */
class DiversitySpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed counts on a tiny corpus") {
    val docs = Seq((1L, "a b a"), (2L, "a b")).toDF("doc_id", "text")
    val got = Diversity.distinctN(docs, "text", Seq(1, 2))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // unigrams: a b a | a b -> 5 total, 2 distinct
    assert(got(1L) == ((5L, 2L, 0.4)))
    // bigrams: "a b","b a" | "a b" -> 3 total, 2 distinct
    assert(got(2L) == ((3L, 2L, 0.666667)))
  }

  test("a repeated corpus collapses the ratio; a unique one holds it at 1.0") {
    val repeated = Seq.fill(50)((1L, "the same line again")).zipWithIndex
      .map { case ((_, t), i) => (i.toLong, t) }.toDF("doc_id", "text")
    val gotRep = Diversity.distinctN(repeated, "text", Seq(2))
      .collect()(0).getDouble(3)
    assert(gotRep < 0.05)
    val unique = (0 until 50).map(i => (i.toLong, s"w${i}a w${i}b w${i}c"))
      .toDF("doc_id", "text")
    val gotUniq = Diversity.distinctN(unique, "text", Seq(2))
      .collect()(0).getDouble(3)
    assert(gotUniq == 1.0)
  }

  test("n beyond every doc length yields a total zero row, not an error") {
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    val r = Diversity.distinctN(docs, "text", Seq(5)).collect()(0)
    assert((r.getLong(1), r.getLong(2), r.getDouble(3)) == ((0L, 0L, 0.0)))
  }
}
