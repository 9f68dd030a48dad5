package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Block-max WAND: pruned top-k must EQUAL the exhaustive BM25 on any
  * input (the skipping is exact, not approximate), the pruning card must
  * account for every posting, and the threshold must fall back to -inf
  * (no pruning) when the seed holds fewer than k docs.
  */
class WandSpec extends SparkSpec {
  import spark.implicits._

  // 400 docs in blocks of 64: docs 0..9 are term-dense (high scores live
  // in block 0), the long tail mentions the terms rarely — the shape
  // where block-max pruning fires
  private lazy val docs = (0 until 400).map { i =>
    val text =
      if (i < 10) s"vector hash spark vector hash spark vector doc$i"
      else if (i % 7 == 0) s"vector filler$i " + ("pad " * (i % 13))
      else if (i % 11 == 0) s"hash filler$i " + ("pad " * (i % 17))
      else s"plain text filler$i " + ("pad " * (i % 5))
    (i.toLong, text)
  }.toDF("doc_id", "text")

  private val terms = Seq("vector", "hash", "spark")

  test("pruned top-k equals exhaustive BM25 exactly, at several k and block sizes") {
    for (k <- Seq(5, 20); bs <- Seq(16L, 64L)) {
      val (p, b) = Wand.impactIndex(docs, "doc_id", "text", blockSize = bs)
      val got = Wand.topK(p, b, terms, k = k, seedBlocks = 2)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val want = Bm25.bm25(docs, "doc_id", "text", terms, k = k)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got == want, s"k=$k blockSize=$bs")
    }
  }

  test("pruning card accounts for every posting and actually skips on the skewed fixture") {
    val (p, b) = Wand.impactIndex(docs, "doc_id", "text", blockSize = 16L)
    val card = Wand.pruningCard(p, b, terms, k = 5, seedBlocks = 2).collect().head
    val (bt, bsc, pt, psc) = (card.getLong(0), card.getLong(1), card.getLong(2), card.getLong(3))
    assert(pt == p.filter(col("tok").isin(terms: _*)).count())
    assert(bsc <= bt && psc <= pt)
    // the dense block seeds a threshold the sparse tail can't reach
    assert(bsc < bt && psc < pt, s"expected pruning: blocks $bsc/$bt postings $psc/$pt")
    assert(math.abs(card.getDouble(4) - (1.0 - psc.toDouble / pt)) < 1e-6)
  }

  test("seed smaller than k disables pruning instead of truncating the answer") {
    val tiny = (0 until 6).map(i => (i.toLong, s"vector hash doc$i")).toDF("doc_id", "text")
    val (p, b) = Wand.impactIndex(tiny, "doc_id", "text", blockSize = 2L)
    // k=20 > 6 docs: theta = -inf, every block survives, result == exhaustive
    val got = Wand.topK(p, b, terms, k = 20, seedBlocks = 1)
      .collect().map(_.getLong(0)).toSeq
    val want = Bm25.bm25(tiny, "doc_id", "text", terms, k = 20)
      .collect().map(_.getLong(0)).toSeq
    assert(got == want)
    val card = Wand.pruningCard(p, b, terms, k = 20, seedBlocks = 1).collect().head
    assert(card.getLong(0) == card.getLong(1), "nothing may be pruned below k docs")
  }
}
