package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{HashMode, TextFunctions}

/** Data Selection via Importance Resampling (Xie et al. 2023, NeurIPS —
  * public method): score every raw document by how target-like its hashed
  * n-gram distribution is,
  *
  *   log w(d) = Σ_b n_b(d) · (log p̂_target(b) − log p̂_raw(b)),
  *
  * over `nBuckets` hashed unigram buckets with add-one smoothing. Sampling
  * the raw corpus ∝ w(d) yields a target-matched subset; here the weights
  * themselves are the product so any downstream policy (top-k, Gumbel
  * resampling via [[Sampling]]) can consume them.
  *
  * Scale shape: the two bucket marginals are scalar-keyed map-side-combined
  * aggregates collapsing to `nBuckets` rows; their log-likelihood-ratio
  * table broadcasts (a few thousand doubles); the per-doc pass is
  * explode → (doc, bucket) count → broadcast join → one doc-keyed sum. No
  * all-pairs form, no driver collect beyond the bucket table.
  *
  * Bucketing is the engine-neutral md5-60 hash ([[Dedup.tokenHash60]]), so
  * any SQL engine replays the weights byte-for-byte (q157's oracle does).
  */
object Dsir {

  /** (idCol, bucket, n) hashed token counts per document — token-level
    * multiplicities, the unigram feature vector of the DSIR paper.
    */
  private def bucketCounts(docs: DataFrame, idCol: String, textCol: String,
      nBuckets: Int, mode: HashMode): DataFrame =
    docs.select(col(idCol),
        explode(TextFunctions.tokens(lower(col(textCol)))).as("tok"))
      .select(col(idCol),
        pmod(Dedup.tokenHash60(col("tok"), mode), lit(nBuckets.toLong))
          .as("bucket"))
      .groupBy(col(idCol), col("bucket")).agg(count(lit(1)).as("n"))

  /** Per-raw-document DSIR log importance weights against `target`'s hashed
    * unigram distribution: (idCol, log_weight rounded to 6). Documents with
    * no tokens are dropped (they carry no evidence either way).
    */
  def importanceWeights(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, nBuckets: Int = 4096,
      mode: HashMode = HashMode.Md5): DataFrame = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    def marginal(df: DataFrame, cnt: String) =
      df.select(explode(TextFunctions.tokens(lower(col(textCol)))).as("tok"))
        .select(pmod(Dedup.tokenHash60(col("tok"), mode),
          lit(nBuckets.toLong)).as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as(cnt))
    val tgt = marginal(target, "ct")
    val rawM = marginal(raw, "cr")
    val totT = tgt.agg(sum(col("ct")).as("st"))
    val totR = rawM.agg(sum(col("cr")).as("sr"))
    // llr per bucket present in raw; absent-from-target buckets smooth to
    // 1/(st + B). Buckets with no raw tokens can never be referenced by a
    // raw document, so the left join over rawM is complete.
    val llr = rawM.join(tgt, Seq("bucket"), "left")
      .crossJoin(broadcast(totT)).crossJoin(broadcast(totR))
      .select(col("bucket"),
        (log((coalesce(col("ct"), lit(0L)) + 1).cast("double") /
            (col("st") + nBuckets)) -
          log((col("cr") + 1).cast("double") / (col("sr") + nBuckets))).as("llr"))
    bucketCounts(raw, idCol, textCol, nBuckets, mode)
      .join(broadcast(llr), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(round(sum(col("n") * col("llr")), 6).as("log_weight"))
  }
}
