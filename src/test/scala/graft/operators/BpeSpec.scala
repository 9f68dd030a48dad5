package graft.operators

import graft.SparkSpec

/** BPE training must equal a sequential reference (same init, tie and
  * greedy-merge rules) over many merges, apply merges greedily
  * left-to-right, stop early when no pair remains, and encode with the
  * final segmentation.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Sequential reference BPE over a word-count map. */
  private def refTrain(words: Map[String, Long], numMerges: Int)
      : (Seq[(Long, String, String, Long)], Map[String, Array[String]]) = {
    var segs: Map[String, Array[String]] =
      words.map { case (w, _) => w -> w.map(_.toString).toArray }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var rank = 1L
    var done = false
    while (rank <= numMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (w, c) =>
        val s = segs(w)
        (0 until s.length - 1).foreach { i =>
          counts((s(i), s(i + 1))) = counts.getOrElse((s(i), s(i + 1)), 0L) + c
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, r), c) = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
        merges += ((rank, l, r, c))
        segs = segs.map { case (w, s) => w -> Bpe.applyMerge(s, l, r) }
        rank += 1
      }
    }
    (merges.toSeq, segs)
  }

  private val corpus = Seq(
    (1L, "low low low low low"),
    (2L, "lower lower newest newest"),
    (3L, "newest newest newest newest"),
    (4L, "widest widest widest"),
    (5L, "new new newer wider low"))
  private def docs = corpus.toDF("doc_id", "text").repartition(3)

  test("30-merge training equals the sequential reference") {
    val words = corpus.flatMap(_._2.split(" ")).groupBy(identity)
      .map { case (w, g) => w -> g.size.toLong }
    val (want, _) = refTrain(words, 30)
    val got = Bpe.train(docs, "text", numMerges = 30)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(got == want)
  }

  test("applyMerge is greedy left-to-right (aaa -> [aa, a])") {
    assert(Bpe.applyMerge(Array("a", "a", "a"), "a", "a").toSeq == Seq("aa", "a"))
    assert(Bpe.applyMerge(Array("a", "a", "a", "a"), "a", "a").toSeq == Seq("aa", "aa"))
    assert(Bpe.applyMerge(Array("x", "a", "a"), "a", "a").toSeq == Seq("x", "aa"))
    assert(Bpe.applyMerge(Array("a", "b"), "b", "a").toSeq == Seq("a", "b"))
  }

  test("training stops early when no pair remains") {
    val tiny = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val got = Bpe.train(tiny, "text", numMerges = 5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, "a", "b", 2L))) // one merge, then exhausted
  }

  test("encodeCounts equals the reference segmentation's piece totals") {
    val words = corpus.flatMap(_._2.split(" ")).groupBy(identity)
      .map { case (w, g) => w -> g.size.toLong }
    val (_, segs) = refTrain(words, 10)
    val want = corpus.map { case (id, t) =>
      id -> t.split(" ").map(w => segs(w).length.toLong).sum
    }.toMap
    val got = Bpe.encodeCounts(docs, "doc_id", "text", numMerges = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }
}
