package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Threshold-free classifier evaluation cards — the artifacts a
  * filter-stage quality model (LogReg, or any scored frame) ships with
  * beyond the fixed-threshold confusion matrix of
  * [[LogReg.binaryMetrics]]: ROC-AUC (ranking quality across ALL
  * thresholds) and the calibration reliability card + ECE (is a 0.8
  * score right 80% of the time — the property mixture weighting and
  * threshold selection actually consume).
  *
  * Scale shapes: everything aggregates per DISTINCT SCORE first (one
  * hash aggregate over the corpus), so the expensive relations are
  * bounded by the score alphabet (round-6 scores in [0,1]: ≤ 1e6+1
  * rows), never the corpus. The AUC cumulative runs through
  * [[Ranking.exclusivePrefixSum]] — one range shuffle over the per-value
  * relation, no single-partition window. All derived ratios are computed
  * from integer-exact counts, so results are bit-identical across
  * engines and partitionings.
  */
object Eval {

  /** ROC-AUC by the rank statistic (Mann–Whitney U) with exact tie
    * handling: AUC = [Σ_v pos_v·(2·neg_below_v + neg_v)] / (2·P·N) over
    * distinct score values v — ties contribute ½, the trapezoidal-ROC
    * value. One row: `(n_pos, n_neg, auc)`; `auc` is round-6, NULL when
    * the frame has no positive or no negative (no ranking is defined).
    * The numerator is an integer sum — no floating-point accumulation
    * order anywhere before the final division.
    */
  def rocAuc(scored: DataFrame, labelCol: String, scoreCol: String): DataFrame = {
    val perValue = scored.select(col(scoreCol).cast("double").as("s"),
        col(labelCol).cast("long").as("y"))
      .groupBy("s").agg(count(lit(1)).as("c"), sum("y").as("pos"))
      .withColumn("neg", col("c") - col("pos"))
    val cum = Ranking.exclusivePrefixSum(perValue, Seq("s"), "neg", "neg_below")
    cum.agg(
        coalesce(sum("pos"), lit(0L)).as("n_pos"),
        coalesce(sum("neg"), lit(0L)).as("n_neg"),
        coalesce(sum(col("pos") * (col("neg_below") * 2 + col("neg"))), lit(0L))
          .as("num2"))
      .select(col("n_pos"), col("n_neg"),
        when(col("n_pos") === 0L || col("n_neg") === 0L,
          lit(null).cast("double"))
          .otherwise(round(col("num2").cast("double") /
            (col("n_pos").cast("double") * col("n_neg") * 2.0), 6)).as("auc"))
  }

  /** Reliability card: equal-width score bins `[i/k, (i+1)/k)` (top bin
    * closed at 1.0), one row per NON-EMPTY bin:
    * `(bin, n, mean_score, frac_pos, abs_gap)` — mean_score and frac_pos
    * round-6, abs_gap = round6(|mean_score − frac_pos|) computed FROM the
    * rounded values (the engine-replayable contract). One hash aggregate.
    */
  def calibrationBins(scored: DataFrame, labelCol: String, scoreCol: String,
      nBins: Int = 10): DataFrame = {
    require(nBins > 0, s"nBins must be positive, got $nBins")
    scored.select(
        least(floor(col(scoreCol).cast("double") * nBins).cast("long"),
          lit(nBins - 1L)).as("bin"),
        col(scoreCol).cast("double").as("s"),
        col(labelCol).cast("double").as("y"))
      .groupBy("bin").agg(count(lit(1)).as("n"),
        round(avg("s"), 6).as("mean_score"),
        round(avg("y"), 6).as("frac_pos"))
      .withColumn("abs_gap",
        round(abs(col("mean_score") - col("frac_pos")), 6))
  }

  /** Expected calibration error over the [[calibrationBins]] card:
    * ECE = round6(Σ n_b·abs_gap_b / Σ n_b). One row `(n, ece)`; an empty
    * frame scores `(0, 0.0)`. Defined from the card's ROUNDED per-bin
    * columns so any engine replaying the card replays the scalar.
    */
  def ece(scored: DataFrame, labelCol: String, scoreCol: String,
      nBins: Int = 10): DataFrame =
    calibrationBins(scored, labelCol, scoreCol, nBins).agg(
        coalesce(sum("n"), lit(0L)).as("n"),
        coalesce(round(sum(col("n") * col("abs_gap")) / sum("n"), 6), lit(0.0))
          .as("ece"))

  /** Youden-J optimal operating point: over the distinct score thresholds
    * (predict positive iff score ≥ t), the t maximizing
    * J = tpr − fpr — the threshold-selection card read off a trained
    * quality classifier before it gates a corpus. tpr/fpr round to 6 and
    * J is defined from the ROUNDED values (the [[calibrationBins]]
    * engine-replay contract); ties on J break to the HIGHER threshold
    * (the conservative gate). Returns one row
    * `(threshold, tpr, fpr, j)`; EMPTY when either class is absent
    * (tpr or fpr undefined — documented, spec'd).
    *
    * Same scale shape as [[rocAuc]]: per-distinct-score aggregates
    * (bounded by the score alphabet), one range prefix sum, a bounded
    * TakeOrdered(1) argmax.
    */
  def youdenThreshold(scored: DataFrame, labelCol: String,
      scoreCol: String): DataFrame = {
    val perValue = scored.select(col(scoreCol).cast("double").as("s"),
        col(labelCol).cast("long").as("y"))
      .groupBy("s").agg(count(lit(1)).as("c"), sum("y").as("pos"))
      .withColumn("neg", col("c") - col("pos"))
    val cum = Ranking.exclusivePrefixSum(
      Ranking.exclusivePrefixSum(perValue, Seq("s"), "neg", "neg_below"),
      Seq("s"), "pos", "pos_below")
    val tot = cum.agg(coalesce(sum("pos"), lit(0L)).as("n_pos"),
      coalesce(sum("neg"), lit(0L)).as("n_neg"))
    cum.crossJoin(broadcast(tot))
      .filter(col("n_pos") > 0 && col("n_neg") > 0)
      .select(col("s").as("threshold"),
        round((col("n_pos") - col("pos_below")).cast("double") / col("n_pos"), 6)
          .as("tpr"),
        round((col("n_neg") - col("neg_below")).cast("double") / col("n_neg"), 6)
          .as("fpr"))
      .withColumn("j", round(col("tpr") - col("fpr"), 6))
      .orderBy(col("j").desc, col("threshold").desc)
      .limit(1)
  }

  /** Retrieval ranking card: MRR@k and binary nDCG@k of a ranked list
    * against a relevance set — the two numbers that complete the recall
    * cards (q192/q214/q229): recall ignores WHERE in the list the hits
    * land; MRR scores the first hit's position, nDCG the whole ranking's.
    *
    *  - `ranked`: (query_id, neighbor_id, rank), rank 1-based (any of the
    *    search family's outputs).
    *  - `relevant`: (query_id, neighbor_id) — the graded-relevance=1 set
    *    (typically exact-KNN truth).
    *
    * Per query: MRR term = 1/rank of the first relevant hit in the top-k
    * (0 if none); DCG = Σ_{relevant hits} 1/log2(rank+1); IDCG = the DCG
    * of a perfect ranking = Σ_{i=1..min(k,|rel_q|)} 1/log2(i+1). Averages
    * go over the queries in `relevant` (a query with an empty relevance
    * set defines neither metric, documented drop). One row:
    * (n_queries, mrr, ndcg), round-4.
    *
    * Scale shape: one semi-join of the top-k lists against the relevance
    * set + two bounded per-query aggregates — cost is the RANKED list
    * size (n_queries × k), never the corpus.
    */
  def mrrNdcgAtK(ranked: DataFrame, relevant: DataFrame, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val rel = relevant.select(col("query_id").cast("long"),
      col("neighbor_id").cast("long"))
    val hits = ranked
      .select(col("query_id").cast("long"), col("neighbor_id").cast("long"),
        col("rank").cast("long"))
      .filter(col("rank") <= k)
      .join(rel, Seq("query_id", "neighbor_id"), "left_semi")
    val perQ = hits.groupBy("query_id").agg(
      min("rank").as("first_rel"),
      sum(lit(1.0) / log2(col("rank") + 1)).as("dcg"))
    val idcg = rel.groupBy("query_id").agg(count(lit(1)).as("n_rel"))
      .withColumn("idcg", expr(
        s"aggregate(sequence(1L, least(n_rel, ${k}L)), 0D, (acc, i) -> acc + 1.0 / log2(i + 1))"))
    idcg.join(perQ, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(lit(1.0) / col("first_rel"), lit(0.0)).as("mrr_q"),
        (coalesce(col("dcg"), lit(0.0)) / col("idcg")).as("ndcg_q"))
      .agg(count(lit(1)).as("n_queries"),
        round(avg("mrr_q"), 4).as("mrr"),
        round(avg("ndcg_q"), 4).as("ndcg"))
  }

  /** RANK-AGREEMENT card between two top-k lists (id + 1-based rank each):
    * overlap size, Jaccard@k, and the Spearman FOOTRULE (mean |rank_a −
    * rank_b| over the intersection — 0 = identical order on shared items).
    * The instrument that says whether two rankers (BM25 vs query
    * likelihood, binary vs exact, stale vs retrained) disagree enough to
    * be worth fusing (q215's RRF) or auditing. One outer join of two
    * ≤k-row relations.
    */
  def rankAgreement(a: DataFrame, b: DataFrame, k: Int,
      idCol: String = "id", rankCol: String = "rank"): DataFrame = {
    require(k > 0, s"rankAgreement: k must be positive, got $k")
    val aa = a.select(col(idCol).cast("long").as("id"),
      col(rankCol).cast("long").as("ra")).filter(col("ra") <= k)
    val bb = b.select(col(idCol).cast("long").as("id"),
      col(rankCol).cast("long").as("rb")).filter(col("rb") <= k)
    aa.join(bb, Seq("id"), "full_outer")
      .agg(
        sum(when(col("ra").isNotNull && col("rb").isNotNull, 1L)
          .otherwise(0L)).as("n_common"),
        count(lit(1)).as("n_union"),
        coalesce(round(avg(when(col("ra").isNotNull && col("rb").isNotNull,
          abs(col("ra") - col("rb")))), 6), lit(0.0)).as("footrule"))
      .select(col("n_common"), col("n_union"),
        round(col("n_common").cast("double") / col("n_union"), 6)
          .as("jaccard"),
        col("footrule"))
  }
}
