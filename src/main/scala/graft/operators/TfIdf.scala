package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{HashMode, TextFunctions}

/** Sparse document vectorization — TF-IDF scores and hashing-trick feature
  * counts, the two standard text→vector precursors (BM25's scoring siblings;
  * `Bm25.bm25` is the query-time form, these are the corpus-wide forms a
  * classifier / clustering / near-dup stage consumes).
  *
  * Scale shape: tokenize+explode is a pure projection; term frequencies are
  * ONE (doc, term) shuffle with map-side combine; document frequencies
  * aggregate the ALREADY-DISTINCT (doc, term) rows (vocab-sized output);
  * the tf⋈df join re-keys tf by term (AQE broadcasts df when the pruned
  * vocabulary fits). `minDf` prunes the hapax tail — on web corpora most of
  * the vocabulary is singleton typos/ids whose idf is noise; pruning them
  * in df (inner join) bounds the join's build side. Feature hashing needs
  * no vocabulary at all: bucket = md5-60(term) mod nBuckets, a pure
  * projection + one (doc, bucket) aggregate, engine-replayable by any SQL
  * dialect (the q131 oracle recomputes the buckets byte-for-byte).
  */
object TfIdf {

  /** (doc_id, term, tf, tfidf) for every term with document frequency >=
    * `minDf`, where `tfidf = tf * (ln((1+N)/(1+df)) + 1)` — the smoothed
    * idf (sklearn's formulation), rounded to 6 so any engine replays it.
    */
  def tfidf(docs: DataFrame, idCol: String, textCol: String,
      minDf: Int = 1): DataFrame = {
    require(minDf >= 1, s"minDf must be >= 1, got $minDf")
    val toks = docs.select(col(idCol).cast("long").as("doc_id"),
      explode(TextFunctions.tokens(lower(coalesce(col(textCol), lit(""))))).as("term"))
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    tf.join(dfreq, "term")
      .crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("term"), col("tf"),
        round(col("tf") * (log((lit(1) + col("n_docs")).cast("double") /
          (lit(1) + col("df")).cast("double")) + lit(1.0)), 6).as("tfidf"))
  }

  /** Hashing-trick term counts: (doc_id, bucket, cnt) with
    * `bucket = md5-60(term) mod nBuckets` — fixed dimensionality with no
    * vocabulary pass, the standard collision-tolerant vectorizer for
    * corpora whose vocab would not fit a dictionary. The md5-60 hash is
    * the engine-neutral `conv(substr(md5(term),1,15),16,10)` used across
    * the dedup family, so the bucketing reproduces in any SQL engine.
    */
  def hashedTf(docs: DataFrame, idCol: String, textCol: String,
      nBuckets: Int = 1 << 18, mode: HashMode = HashMode.Md5): DataFrame = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    docs.select(col(idCol).cast("long").as("doc_id"),
        explode(TextFunctions.tokens(lower(coalesce(col(textCol), lit(""))))).as("term"))
      .select(col("doc_id"),
        pmod(Dedup.tokenHash60(col("term"), mode),
          lit(nBuckets.toLong)).as("bucket"))
      .groupBy("doc_id", "bucket").agg(count(lit(1)).as("cnt"))
  }
}
