package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Misra-Gries frequent-items summary — the DETERMINISTIC-guarantee leg of
  * the frequency family (CMS gives randomized-hash estimates; MG gives a
  * hard superset guarantee in k counters, no hashing at all).
  *
  * The classic two-phase shape for heavy hitters at 100 TB:
  *
  *   1. one treeAggregate folds the whole term stream into a bounded map of
  *      at most k counters per task (Misra & Gries 1982), merged pairwise
  *      with the mergeable-summaries rule (Agarwal et al. 2012: add counts,
  *      then subtract the (k+1)-th largest and drop non-positive). State is
  *      O(k) regardless of vocabulary — no shuffle, no distinct-term
  *      aggregate;
  *   2. the ≤ k surviving candidates broadcast back as an `isin` filter and
  *      ONE exact count runs restricted to them — the full-vocabulary
  *      shuffle never happens.
  *
  * Guarantee (the invariant [[FreqSpec]] pins): any term with true count
  * > n/(k+1) survives phase 1 in EVERY merge order, so phase 2's output —
  * exact counts filtered to > n/(k+1) — is exactly the set of true heavy
  * hitters with their exact counts, deterministic under any partitioning
  * even though the intermediate counter VALUES are order-dependent. That
  * determinism is what makes the operator oracle-able end to end.
  *
  * Reference frames frequency profiling as a verify-stage analysis
  * (SURVEY §2 A7/A16); MG is the bounded-memory exact-guarantee variant
  * the sketch family was missing.
  */
object Freq {

  /** Bounded Misra-Gries accumulator: at most k counters plus the exact
    * stream length. Mutable within a task; merged pairwise by treeAggregate.
    */
  final class MgAcc(val k: Int) extends Serializable {
    val counts: mutable.HashMap[String, Long] = mutable.HashMap.empty
    var n: Long = 0L

    def add(term: String): Unit = {
      n += 1L
      counts.get(term) match {
        case Some(c) => counts.update(term, c + 1L)
        case None =>
          if (counts.size < k) counts.update(term, 1L)
          else decrementAll(1L) // drop one occurrence of every tracked term
      }
    }

    /** Mergeable-summaries merge: add counts, then if over k counters
      * subtract the (k+1)-th largest count from all and drop ≤ 0.
      */
    def merge(other: MgAcc): MgAcc = {
      other.counts.foreach { case (t, c) =>
        counts.update(t, counts.getOrElse(t, 0L) + c)
      }
      n += other.n
      if (counts.size > k) {
        val kth = counts.values.toArray.sorted(Ordering[Long].reverse).apply(k)
        decrementAll(kth)
      }
      this
    }

    /** Subtract `by` from every counter and drop the non-positive ones
      * (iterates a key snapshot — safe against in-place mutation).
      */
    private def decrementAll(by: Long): Unit = {
      counts.keys.toArray.foreach { t =>
        val c = counts(t) - by
        if (c <= 0L) counts.remove(t) else counts.update(t, c)
      }
    }
  }

  /** Phase 1: fold `terms(termCol)` into an MG summary of ≤ k counters
    * (plus the exact total n) in one treeAggregate — no shuffle, task
    * state O(k).
    */
  def mgSummary(terms: DataFrame, termCol: String, k: Int): MgAcc = {
    require(k > 0, s"k must be positive, got $k")
    val spark = terms.sparkSession
    import spark.implicits._
    terms.select(col(termCol).cast("string")).na.drop().as[String].rdd
      .treeAggregate(new MgAcc(k))(
        seqOp = { (acc, t) => acc.add(t); acc },
        combOp = { (a, b) => a.merge(b) })
  }

  /** Phase 2: exact counts restricted to the MG candidates, filtered to the
    * guarantee threshold. Output: every term with true count > n/(k+1),
    * with its EXACT count — deterministic under any partitioning.
    */
  def guaranteedHeavy(terms: DataFrame, termCol: String, k: Int): DataFrame =
    guaranteedHeavyFrom(mgSummary(terms, termCol, k), terms, termCol, k)

  /** Phase 2 against a PRE-BUILT summary (batch-built, or merged out of a
    * stream — [[graft.streaming.StreamSketch.mgFromStream]]; the
    * mergeable-summaries rule preserves the guarantee under any batching,
    * so the output is identical either way).
    */
  def guaranteedHeavyFrom(acc: MgAcc, terms: DataFrame, termCol: String,
      k: Int): DataFrame = {
    val cands = acc.counts.keys.toSeq
    val threshold = acc.n.toDouble / (k + 1)
    terms.select(col(termCol).cast("string").as("term")).na.drop()
      .filter(col("term").isin(cands: _*))
      .groupBy("term").agg(count(lit(1)).as("tf"))
      .filter(col("tf") > lit(threshold))
  }

  /** Convenience over a text column: whitespace tokens, lowercased —
    * the [[Cms.heavyHitters]] tokenization, for side-by-side use.
    */
  def guaranteedHeavyTokens(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    val toks = docs
      .select(explode(split(lower(col(textCol)), " ")).as("term"))
      .filter(col("term") =!= "")
    guaranteedHeavy(toks, "term", k)
  }
}
