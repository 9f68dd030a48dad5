package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** TextRank contracts: co-occurrence edge construction (window, symmetry,
  * self-pair exclusion, noise floor), rank mass conservation, salience
  * ordering on a constructed corpus, and the keywords cut.
  */
class TextRankSpec extends SparkSpec {
  import spark.implicits._

  private def docs(texts: String*) = texts.toDF("text")

  test("window-2 co-occurrence: distance 1 and 2 pairs, both directions, counts") {
    val d = docs("a b c")
    val e = TextRank.cooccurrenceEdges(d, "text", window = 2, minCount = 1L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    // pairs: (a,b) d1, (b,c) d1, (a,c) d2 — each symmetrized
    assert(e.size == 6, e.toString)
    assert(e(("a", "b")) == 1.0 && e(("b", "a")) == 1.0)
    assert(e(("a", "c")) == 1.0 && e(("c", "a")) == 1.0)
    assert(e(("b", "c")) == 1.0 && e(("c", "b")) == 1.0)
  }

  test("self-pairs from repeated tokens are excluded; counts accumulate") {
    val d = docs("x x y", "x y")
    val e = TextRank.cooccurrenceEdges(d, "text", window = 2, minCount = 1L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(!e.contains(("x", "x")), "no self edge")
    // (x,y): doc1 has x@1..y@3 (d2) and x@2..y@3 (d1) = 2; doc2 d1 = 1
    assert(e(("x", "y")) == 3.0, e.toString)
    assert(e(("y", "x")) == 3.0)
  }

  test("minCount floors the edge relation") {
    val d = docs(Seq.fill(4)("p q").mkString(" SEP ") :: "r s" :: Nil: _*)
    val e = TextRank.cooccurrenceEdges(d, "text", window = 1, minCount = 3L)
    val pairs = e.select("src", "dst").as[(String, String)].collect().toSet
    assert(pairs.contains(("p", "q")))
    assert(!pairs.contains(("r", "s")), "below the floor")
  }

  test("rank mass sums to 1 and hub token dominates on a constructed corpus") {
    // 'core' co-occurs with every filler; fillers only see 'core'
    val fillers = (1 to 8).map(i => s"f$i")
    val lines = fillers.flatMap(f => Seq.fill(5)(s"core $f")).toDF("text")
    val ranks = TextRank.tokenRanks(lines, "text", window = 1, minCount = 1L,
      iters = 20).collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(ranks.values.sum - 1.0) < 1e-9)
    val core = ranks("core")
    fillers.foreach(f => assert(core > 3 * ranks(f), s"core $core vs $f ${ranks(f)}"))
  }

  test("keywords returns topK by rank with deterministic ties") {
    val lines = (1 to 6).flatMap(i => Seq.fill(i * 2)(s"w$i anchor")).toDF("text")
    val kw = TextRank.keywords(lines, "text", topK = 3, window = 1,
      minCount = 1L, iters = 10).collect().map(_.getString(0)).toSeq
    assert(kw.head == "anchor", s"hub first: $kw")
    assert(kw.size == 3)
  }
}
