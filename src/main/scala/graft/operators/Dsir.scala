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

  /** EFFECTIVE-SAMPLE-SIZE card for importance weights under log-weight
    * clipping — the instrument that picks the clip BEFORE a resampling run
    * commits to it: heavy-tailed importance weights make a weighted sample
    * behave like far fewer documents (ESS = (Σw)²/Σw²), and clipping
    * trades a little bias for a lot of effective mass. One row per clip:
    * (clip, n, ess, ess_frac, clipped_frac). Weights are exp(min(lw, clip))
    * computed as exp(min(lw, clip) − max(lw)) — ESS is scale-invariant, so
    * the max-shift is pure overflow protection and drops out of the
    * statistic.
    *
    * Scale shape: one max scalar + one aggregate pass per clip over
    * (id, double) rows — no text, no shuffle beyond the partial aggregate.
    */
  def essCard(weights: DataFrame, idCol: String, logWeightCol: String,
      clips: Seq[Double]): DataFrame = {
    require(clips.nonEmpty, "essCard needs at least one clip threshold")
    val lw = weights.select(col(idCol).cast("long").as("id"),
      col(logWeightCol).cast("double").as("lw"))
    val m = lw.agg(max("lw").as("m"))
    val base = lw.crossJoin(broadcast(m))
    clips.map { c =>
      base
        .select(exp(least(col("lw"), lit(c)) - col("m")).as("w"),
          (col("lw") > c).cast("long").as("cl"))
        .agg(count(lit(1)).as("n"), sum("w").as("sw"),
          sum(col("w") * col("w")).as("sw2"), sum("cl").as("ncl"))
        .select(lit(c).as("clip"), col("n"),
          round(col("sw") * col("sw") / col("sw2"), 6).as("ess"),
          round(col("sw") * col("sw") / col("sw2") / col("n"), 6).as("ess_frac"),
          round(col("ncl").cast("double") / col("n"), 6).as("clipped_frac"))
    }.reduce(_ unionAll _)
  }
}
