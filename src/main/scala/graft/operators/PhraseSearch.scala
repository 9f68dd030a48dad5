package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Positional phrase and proximity search over an inverted index — the
  * exact-match complement to the ranked sparse retrieval family
  * ([[Bm25]]/[[Wand]] score; this LOCATES). A curation pipeline uses it
  * for quote detection, boilerplate phrase audits, and benchmark-string
  * lookups where n-gram hashing (Dedup.containmentScores) is too coarse
  * to give positions. The reference engine has no text-search surface
  * (SURVEY §2.3 — its search is vector KNN); public inverted-index
  * positional-intersection semantics (Manning et al., IIR ch. 2).
  *
  * Spark shape:
  *  - [[positionalPostings]] builds (tok, id, pos) ONCE — query-
  *    independent, persistable partitioned BY TOKEN, so a phrase query's
  *    scan prunes to its own terms' partitions (the same discipline as
  *    `Wand.impactIndex`);
  *  - [[phraseOccurrences]] filters the postings to the phrase's terms
  *    FIRST, then intersects positions with an (L−1)-way equi-join on
  *    (id, pos − offset) — each side is already term-pruned, the join
  *    keys carry (long, long), and no text ever shuffles;
  *  - [[proximityDocs]] is the slop variant: all terms within a `window`
  *    of an anchor occurrence of the first term (the documented,
  *    SQL-replayable contract — anchored, not minimal-cover).
  */
object PhraseSearch {

  /** Positional postings (tok, id LONG, pos INT), whitespace tokens,
    * lowercased — the `TextFunctions.tokens` convention every text oracle
    * replays.
    */
  def positionalPostings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).cast("long").as("id"),
        posexplode(TextFunctions.tokens(lower(coalesce(col(textCol), lit("")))))
          .as(Seq("pos", "tok")))
      .select(col("tok"), col("id"), col("pos"))

  /** Documents containing the exact token sequence `phrase`, with the
    * occurrence count and the first match position. Output:
    * (id, n_occurrences, first_pos), only matching docs.
    */
  def phraseOccurrences(postings: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phraseOccurrences: empty phrase")
    val terms = phrase.map(_.toLowerCase)
    // one term-pruned pass over the postings, then align on (id, pos-k)
    val pruned = postings.filter(col("tok").isin(terms.distinct: _*))
    val anchors = terms.zipWithIndex.map { case (w, k) =>
      pruned.filter(col("tok") === w)
        .select(col("id"), (col("pos") - k).as("start"))
    }
    val matches = anchors.reduce((a, b) => a.join(b, Seq("id", "start")))
    matches.groupBy("id")
      .agg(count(lit(1)).as("n_occurrences"), min(col("start")).as("first_pos"))
  }

  /** Documents where every term in `terms` occurs within `window` tokens
    * of some occurrence of terms.head (the anchored-slop contract:
    * |pos_i − anchorPos| <= window for all i, one anchor witnesses all
    * terms). Output: (id, n_anchors) — anchor occurrences that witness
    * the full term set.
    */
  def proximityDocs(postings: DataFrame, terms: Seq[String], window: Int): DataFrame = {
    require(terms.size >= 2, "proximityDocs: need at least two terms")
    require(window >= 1, s"proximityDocs: window must be positive, got $window")
    val lower = terms.map(_.toLowerCase)
    val pruned = postings.filter(col("tok").isin(lower.distinct: _*))
    val anchor = pruned.filter(col("tok") === lower.head)
      .select(col("id"), col("pos").as("apos"))
    val witnessed = lower.tail.distinct.zipWithIndex.map { case (w, i) =>
      pruned.filter(col("tok") === w)
        .select(col("id"), col("pos").as(s"p$i"))
    }.zipWithIndex.foldLeft(anchor) { case (acc, (t, i)) =>
      // range-join per term, then keep DISTINCT anchors: each term needs
      // ONE witness within the window, not a cross product of them
      acc.join(t, Seq("id"))
        .filter(abs(col(s"p$i") - col("apos")) <= window)
        .select(acc.columns.map(col): _*).distinct()
    }
    witnessed.groupBy("id").agg(count(lit(1)).as("n_anchors"))
  }
}
