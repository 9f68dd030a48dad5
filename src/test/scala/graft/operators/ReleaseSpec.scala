package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Release takedown sweep: artifact pruning equals from-scratch on the
  * reduced corpus; resurrection semantics; completeness audit totality.
  */
class ReleaseSpec extends SparkSpec {
  import spark.implicits._

  // a, b near-identical (Jaccard 1.0 on 3-grams); c, d unique filler.
  // Pair (1,2) drops id 2 from the baseline selection.
  private def corpus = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta"),
    (2L, "alpha beta gamma delta epsilon zeta eta theta"),
    (3L, "one two three four five six seven eight nine"),
    (4L, "red orange yellow green blue indigo violet tint"))
    .toDF("doc_id", "text")
  private def bench = Seq((100L, "nothing shared here at all")).toDF("doc_id", "text")
  private val p = Release.Params(budget = 1000L)

  test("takedown resurrects the kept near-duplicate and equals from-scratch") {
    val art = Release.materialized(
      Release.artifacts(corpus, bench, "doc_id", "text", p))
    val before = Release.fromArtifacts(corpus, art, "doc_id", p)
      .select("id").as[Long].collect().toSet
    assert(before == Set(1L, 3L, 4L), s"near-dup 2 must lose to 1: $before")

    // removing the SURVIVOR (1) must resurrect its dropped duplicate (2)
    val removals = Seq(1L).toDF("doc_id")
    val (sel, pruned) = Release.takedown(corpus, art, removals, "doc_id", p)
    val after = sel.select("id").as[Long].collect().toSet
    assert(after == Set(2L, 3L, 4L), s"2 must resurrect once 1 is gone: $after")

    // pruning commutes with recomputation: equality with from-scratch on
    // the reduced corpus, full row contract (score/cost/cum_before)
    val scratch = Release.fromScratch(
      corpus.filter(col("doc_id") =!= 1L), bench, "doc_id", "text", p)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "score", "cost", "cum_before")
        .as[(Long, Long, Long, Long)].collect().toSet
    assert(rows(sel) == rows(scratch))

    // no artifact retains a trace of the removed id
    assert(pruned.index.filter(col("id") === 1L).count() == 0)
    assert(pruned.pairs.filter(col("id_a") === 1L || col("id_b") === 1L).count() == 0)
    assert(pruned.contam.filter(col("id") === 1L).count() == 0)
    assert(pruned.scores.filter(col("id") === 1L).count() == 0)
  }

  test("takedown audit: exposure counted, leftover zero, selection row tracks the old set") {
    val art = Release.materialized(
      Release.artifacts(corpus, bench, "doc_id", "text", p))
    val oldSel = Release.fromArtifacts(corpus, art, "doc_id", p)
    val removals = Seq(1L).toDF("doc_id")
    val (sel, pruned) = Release.takedown(corpus, art, removals, "doc_id", p)
    val card = Release.takedownAudit(oldSel, sel, art, pruned, removals, "doc_id")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(card.keySet == Set("pairs", "index", "contam", "scores", "selection"))
    assert(card("pairs") == (1L, 0L))     // the (1,2) pair touched the removal
    assert(card("index") == (1L, 0L))
    assert(card("contam") == (1L, 0L))
    assert(card("scores") == (1L, 0L))
    assert(card("selection") == (1L, 0L)) // 1 was selected before, gone after
    assert(card.values.forall(_._2 == 0L), s"leftover must be zero: $card")
  }

  test("empty removal set is the identity sweep") {
    val art = Release.materialized(
      Release.artifacts(corpus, bench, "doc_id", "text", p))
    val before = Release.fromArtifacts(corpus, art, "doc_id", p)
      .select("id").as[Long].collect().toSet
    val (sel, _) = Release.takedown(corpus, art,
      Seq.empty[Long].toDF("doc_id"), "doc_id", p)
    assert(sel.select("id").as[Long].collect().toSet == before)
  }
}
