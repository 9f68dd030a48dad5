package graft.operators

import graft.SparkSpec

/** Phrase/proximity contracts beyond the oracled corpus queries:
  * duplicate-word phrases, overlapping occurrences, absent phrases, and
  * the window boundary being inclusive.
  */
class PhraseSearchSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "a b a b a"),          // overlapping "a b a" at 0 and 2
    (1L, "the the the"),        // duplicate-word phrase
    (2L, "x y z w"),
    (3L, "a far b")).toDF("doc_id", "text")

  private lazy val postings =
    PhraseSearch.positionalPostings(docs, "doc_id", "text")

  test("overlapping occurrences each count; first_pos is the earliest") {
    val m = PhraseSearch.phraseOccurrences(postings, Seq("a", "b", "a"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toList
    assert(m == List((0L, 2L, 0)), m.toString)
  }

  test("duplicate-word phrase aligns the SAME posting list at two offsets") {
    val m = PhraseSearch.phraseOccurrences(postings, Seq("the", "the"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toList
    assert(m == List((1L, 2L)), m.toString)
  }

  test("absent phrase yields no rows; 'a b' does not match 'a far b'") {
    assert(PhraseSearch.phraseOccurrences(postings, Seq("z", "x")).count() == 0)
    val ab = PhraseSearch.phraseOccurrences(postings, Seq("a", "b"))
      .select("id").as[Long].collect().toSet
    assert(ab == Set(0L), "doc 3 has an intervening token")
  }

  test("proximity window is inclusive and anchored on the first term") {
    // doc 3: a(0) far(1) b(2) — |2-0| = 2
    val hit = PhraseSearch.proximityDocs(postings, Seq("a", "b"), window = 2)
      .select("id").as[Long].collect().toSet
    assert(hit.contains(3L), "distance == window must match")
    val miss = PhraseSearch.proximityDocs(postings, Seq("a", "b"), window = 1)
      .select("id").as[Long].collect().toSet
    assert(!miss.contains(3L), "distance > window must not match")
    assert(miss.contains(0L))
  }
}
