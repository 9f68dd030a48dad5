package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Unigram language-model surprisal: p(tok) = corpusCount(tok)/totalTokens,
  * doc score = mean token surprisal `Σ k·(−ln p) / Σ k` in nats. The cheap
  * LM-quality signal corpus filters threshold on — abnormally LOW surprisal
  * flags boilerplate/repetitive text, abnormally HIGH flags garbage
  * vocabulary. Complements the heuristic scores (gopherFlags,
  * qualityScore) with a corpus-relative statistic.
  *
  * Scale shape: per-(doc, token) multiplicities first (one shuffle of
  * distinct doc-token pairs, map-side combined), vocabulary counts
  * aggregate from THAT frame (vocabulary-sized, not corpus-sized), the
  * 1-row total broadcasts, and the multiplicity⋈vocabulary join shuffles
  * 8-byte-keyed pairs — no pass ever carries O(corpus tokens) through an
  * exchange twice. Zero-token documents are absent from the output (they
  * have no mean).
  */
object UnigramLm {

  def surprisal(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("id"),
      explode(TextFunctions.tokens(lower(coalesce(col(textCol), lit(""))))).as("tok"))
    val m = toks.groupBy("id", "tok").agg(count(lit(1)).cast("double").as("k"))
    val cnt = m.groupBy("tok").agg(sum(col("k")).as("c"))
    val tot = cnt.agg(sum(col("c")).as("t"))
    m.join(cnt, Seq("tok"))
      .crossJoin(broadcast(tot))
      .groupBy("id")
      .agg(round(sum(col("k") * -log(col("c") / col("t"))) / sum(col("k")), 6)
        .as("surprisal"))
  }
}
