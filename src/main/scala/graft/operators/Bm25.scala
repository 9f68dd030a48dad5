package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** BM25 keyword retrieval over whitespace-lowercased tokens — the lexical
  * top-k a corpus-curation pipeline runs next to the embedding KNN (hybrid
  * retrieval, boilerplate probes, eval-set leakage hunts). Extends the
  * reference's query surface (its retrieval is vector-only, SURVEY §2.3)
  * with the sparse ranking function.
  *
  * Scoring is the Lucene/Robertson non-negative form:
  * `idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5))`,
  * `score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·len/avgLen))`.
  *
  * Scale shape: the corpus is scanned once to build per-(doc, term) term
  * frequencies — the explode is filtered to the query terms BEFORE the
  * aggregation, so postings volume is O(term hits), not O(tokens), and the
  * document length rides THROUGH the postings as a grouping column so no
  * corpus-wide (tf ⋈ lens) join ever shuffles. Document frequencies
  * (|terms| rows) and the global (N, avgLen) scalar broadcast; the final
  * top-k is a TakeOrdered, never a global sort materialization
  * (PlanShapeSpec pins all of this). Ties rank deterministically: rounded
  * score desc, id asc.
  */
object Bm25 {

  def bm25(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25: at least one query term")
    require(k > 0, "bm25: k must be positive")
    val qTerms = terms.map(_.toLowerCase).distinct
    // coalesce BEFORE size(): size(null) is -1 and would poison avg_len
    val toks = docs.select(col(idCol).as("id"),
      TextFunctions.tokens(lower(coalesce(col(textCol), lit("")))).as("toks"))
    val stats = toks.agg(count(lit(1)).cast("double").as("n_docs"),
      avg(size(col("toks")).cast("double")).as("avg_len"))
    val tf = toks
      .select(col("id"), size(col("toks")).cast("double").as("len"),
        explode(col("toks")).as("tok"))
      .filter(col("tok").isin(qTerms: _*))
      .groupBy("id", "len", "tok").agg(count(lit(1)).cast("double").as("tf"))
    val dfreq = tf.groupBy("tok").agg(count(lit(1)).cast("double").as("df"))
    tf.join(broadcast(dfreq), Seq("tok"))
      .crossJoin(broadcast(stats))
      .withColumn("_s",
        log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
          * col("tf") * lit(k1 + 1.0)
          / (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("len") / col("avg_len"))))
      .groupBy("id").agg(round(sum(col("_s")), 6).as("score"))
      .orderBy(col("score").desc, col("id"))
      .limit(k)
  }

  /** Dirichlet-smoothed QUERY-LIKELIHOOD retrieval — the language-model
    * ranker next to [[bm25]] (two independent lexical rankers make ranker
    * disagreement measurable, [[Eval.rankAgreement]]). Uses the standard
    * postings-only decomposition
    * `score(d) = Σ_{t ∈ d∩q} ln(1 + tf/(μ·p(t|C))) + |q_eff|·ln(μ/(len+μ))`
    * (rank-equivalent to the full Dirichlet query likelihood), where
    * `p(t|C) = ctf/total` and `|q_eff|` counts query terms that occur in
    * the collection at all (a ctf=0 term has likelihood 0 under every
    * document — it carries no ranking signal and is dropped, documented).
    * Candidates are docs matching ≥ 1 query term (the same candidate
    * discipline as BM25's postings).
    *
    * Scale shape mirrors [[bm25]]: term-filtered postings, broadcast
    * collection stats, TakeOrdered top-k.
    */
  def queryLikelihood(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int, mu: Double = 300.0): DataFrame = {
    require(terms.nonEmpty, "queryLikelihood: at least one query term")
    require(k > 0 && mu > 0, s"queryLikelihood: bad k=$k or mu=$mu")
    val qTerms = terms.map(_.toLowerCase).distinct
    val toks = docs.select(col(idCol).as("id"),
      TextFunctions.tokens(lower(coalesce(col(textCol), lit("")))).as("toks"))
    val allToks = toks.select(col("id"), size(col("toks")).cast("double").as("len"),
      explode(col("toks")).as("tok"))
    val total = allToks.agg(count(lit(1)).cast("double").as("total"))
    // collection term frequency of each query term (ctf=0 terms drop)
    val ctf = allToks.filter(col("tok").isin(qTerms: _*))
      .groupBy("tok").agg(count(lit(1)).cast("double").as("ctf"))
    val nEff = ctf.agg(count(lit(1)).cast("double").as("n_eff"))
    val tf = allToks.filter(col("tok").isin(qTerms: _*))
      .groupBy("id", "len", "tok").agg(count(lit(1)).cast("double").as("tf"))
    tf.join(broadcast(ctf), Seq("tok"))
      .crossJoin(broadcast(total))
      .withColumn("_s", log(lit(1.0) +
        col("tf") * col("total") / (lit(mu) * col("ctf"))))
      .groupBy("id", "len").agg(sum("_s").as("_hits"))
      .crossJoin(broadcast(nEff))
      .select(col("id"), round(col("_hits") +
        col("n_eff") * log(lit(mu) / (col("len") + mu)), 6).as("score"))
      .orderBy(col("score").desc, col("id"))
      .limit(k)
  }
}
