package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Aho-Corasick blocklist tagging: overlapping counts, suffix-term output
  * inheritance (the classic he/she/his/hers automaton), brute-force parity,
  * and the zero-hit totality of the gate rollup.
  */
class BlocklistSpec extends SparkSpec {
  import spark.implicits._

  private def bruteCount(text: String, term: String): Long =
    (0 to text.length - term.length)
      .count(i => text.regionMatches(i, term, 0, term.length)).toLong

  test("classic he/she/his/hers: suffix outputs fire through fail links") {
    val a = new Blocklist.Automaton(Array("he", "she", "his", "hers"))
    val hits = a.countHits("ushers say she is his hero")
    val byTerm = hits.map { case (ti, n) => a.terms(ti) -> n }
    // "ushers": she, he, hers; "say she": she+he; "his": his; "hero": he
    assert(byTerm == Map("she" -> 2L, "he" -> 3L, "hers" -> 1L, "his" -> 1L),
      s"got $byTerm")
  }

  test("overlapping occurrences all count") {
    val a = new Blocklist.Automaton(Array("aa"))
    assert(a.countHits("aaaa") == Map(0 -> 3L))
  }

  test("randomized brute-force parity over a small alphabet") {
    val rnd = new scala.util.Random(7)
    val terms = Array("ab", "ba", "aab", "bbb", "abab", "a")
    val a = new Blocklist.Automaton(terms)
    (0 until 50).foreach { _ =>
      val text = Array.fill(rnd.nextInt(40))(if (rnd.nextBoolean()) 'a' else 'b').mkString
      val got = a.countHits(text).map { case (ti, n) => terms(ti) -> n }
      val want = terms.map(t => t -> bruteCount(text, t)).filter(_._2 > 0).toMap
      assert(got == want, s"text='$text' got=$got want=$want")
    }
  }

  test("tagMatches and hitCounts: distributed parity + zero-hit totality") {
    val docs = Seq(
      (1L, "the table is big"),
      (2L, "no matches here at all"),
      (3L, "table table spark")).toDF("doc_id", "text")
    val terms = Seq("table", "spark")
    val tags = Blocklist.tagMatches(docs, "doc_id", "text", terms)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(tags == Set((1L, "table", 1L), (3L, "table", 2L), (3L, "spark", 1L)))
    val counts = Blocklist.hitCounts(docs, "doc_id", "text", terms)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(counts == Set((1L, 1L, 1L), (2L, 0L, 0L), (3L, 3L, 2L)))
  }

  test("empty terms and empty-string terms fail loudly") {
    intercept[IllegalArgumentException](new Blocklist.Automaton(Array.empty))
    intercept[IllegalArgumentException](new Blocklist.Automaton(Array("ok", "")))
  }

  test("executor automaton cache is bounded: many distinct blocklists never accumulate") {
    val docs = Seq((1L, "x0 x1 x2 hit")).toDF("doc_id", "text")
    // 20 jobs with 20 DIFFERENT term lists on a long-lived JVM (local mode
    // shares the executor): the LRU must hold at most its capacity (8),
    // not one automaton per list forever
    (0 until 20).foreach { i =>
      val tags = Blocklist.tagMatches(docs, "doc_id", "text", Seq(s"x$i", "hit"))
        .collect()
      assert(tags.exists(_.getString(1) == "hit"), s"list $i lost correctness")
    }
    assert(Blocklist.cachedAutomatonCount <= 8,
      s"cache grew to ${Blocklist.cachedAutomatonCount}")
  }
}
