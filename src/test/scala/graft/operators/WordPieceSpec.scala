package graft.operators

import graft.SparkSpec

/** WordPiece: greedy longest-match semantics, ## continuations, [UNK]
  * collapse, corpus-vocab coverage, and greedy-vs-optimal divergence
  * (the property separating it from the unigram Viterbi segmenter).
  */
class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  private def enc(text: String, v: WordPiece.WpVocab, maxLen: Int = 3) =
    WordPiece.encodeWords(Seq((1L, text)).toDF("doc_id", "text"), "text", v, maxLen)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
      .sortBy(t => (t._1, t._2))

  test("longest-match-first with ## continuations") {
    val v = WordPiece.WpVocab(
      init = Set("un", "u", "n"),
      cont = Set("aff", "able", "a", "f", "b", "l", "e"))
    assert(enc("unaffable", v, maxLen = 4).map(_._3).toSeq ==
      Seq("un", "##aff", "##able"))
  }

  test("greedy can differ from a globally optimal segmentation (documented semantics)") {
    // vocab: "ab" and "c" exist but "abc" = ab + c needs cont "c";
    // greedy takes "ab" then fails... with cont only {"bc"}: greedy
    // takes init "ab", then cont at 'c' has no piece -> [UNK], while
    // the optimal split a + ##bc exists. WordPiece is DEFINED greedy.
    val v = WordPiece.WpVocab(init = Set("ab", "a"), cont = Set("bc"))
    assert(enc("abc", v).map(_._3).toSeq == Seq("[UNK]"))
  }

  test("unmatchable position collapses the word to a single [UNK] row") {
    val v = WordPiece.WpVocab(init = Set("x"), cont = Set("y"))
    assert(enc("xyz", v).toSeq == Seq(("xyz", 0, "[UNK]")))
    // and a fully matchable sibling in the same corpus still segments
    val both = WordPiece.encodeWords(
      Seq((1L, "xy xqz")).toDF("doc_id", "text"), "text", v)
      .collect().map(r => (r.getString(0), r.getString(2))).toSet
    assert(both == Set(("xy", "x"), ("xy", "##y"), ("xqz", "[UNK]")))
  }

  test("corpus-derived vocab covers every corpus word (no [UNK]) and respects minCount") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val v = WordPiece.vocabFromCorpus(docs, "text", maxLen = 2, minCount = 2)
    val out = WordPiece.encodeWords(docs, "text", v, maxLen = 2)
    assert(out.filter(org.apache.spark.sql.functions.col("piece") === "[UNK]").count() == 0L)
    // reassembling pieces (## stripped) must reproduce each word exactly
    val words = out.collect().groupBy(_.getString(0)).map { case (w, rows) =>
      w -> rows.sortBy(_.getInt(1)).map(_.getString(2).stripPrefix("##")).mkString
    }
    words.foreach { case (w, rebuilt) => assert(rebuilt == w, s"word $w -> $rebuilt") }
  }

  test("maxLen=1 degenerates to characters") {
    val v = WordPiece.WpVocab(init = Set("a", "b"), cont = Set("a", "b"))
    assert(enc("abba", v, maxLen = 1).map(_._3).toSeq ==
      Seq("a", "##b", "##b", "##a"))
  }
}
