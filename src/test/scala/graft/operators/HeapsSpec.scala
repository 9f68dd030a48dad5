package graft.operators

import graft.SparkSpec

/** Heaps fit: exact closed-form regimes (β=1 all-new tokens, β=0 fixed
  * vocabulary) and checkpoint accounting on a hand corpus.
  */
class HeapsSpec extends SparkSpec {
  import spark.implicits._

  test("all-new tokens per doc fit beta=1, log_k=0 exactly") {
    val docs = (0L until 40L)
      .map(i => (i, s"w${i}a w${i}b w${i}c")).toDF("doc_id", "text")
    val r = Heaps.heapsFit(docs, "doc_id", "text").collect()(0)
    assert(r.getLong(0) == 40L)
    assert(r.getDouble(1) == 1.0 && r.getDouble(2) == 0.0, r.toString)
  }

  test("a fixed one-word vocabulary fits beta=0 with V=1") {
    val docs = (0L until 30L).map(i => (i, "same same")).toDF("doc_id", "text")
    val r = Heaps.heapsFit(docs, "doc_id", "text").collect()(0)
    assert(r.getDouble(1) == 0.0) // ln V constant at 0
    assert(r.getDouble(2) == 0.0)
  }

  test("empty docs contribute no checkpoint until tokens appear") {
    val docs = Seq((1L, ""), (2L, "a b"), (3L, "")).toDF("doc_id", "text")
    // only docs 2 and 3 have N>0 (doc 3 inherits the running totals)
    val r = Heaps.heapsFit(docs, "doc_id", "text").collect()(0)
    assert(r.getLong(0) == 2L)
  }
}
