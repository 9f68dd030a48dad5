package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Maximal Marginal Relevance (Carbonell & Goldstein 1998) — greedy
  * diversified top-k over per-query candidate sets: at each step pick the
  * candidate maximizing
  *
  *   score(c) = λ·rel(c) − (1−λ)·max_{s ∈ selected} sim(c, s)
  *
  * (max over the empty set = 0, so the first pick is pure relevance).
  * The retrieval-diversification stage of a RAG / hard-negative pipeline:
  * a plain top-k returns near-duplicate passages; MMR trades relevance
  * against redundancy with the selected set.
  *
  * Scale shape: ONE shuffle on the query key, then each candidate set
  * (bounded — candidates come from a top-N retrieval, enforced by
  * `maxCandidates`) runs the O(n·k·d) greedy in-task via
  * `flatMapGroups`. Corpus vectors never meet each other across queries;
  * no per-query window, no driver involvement.
  *
  * Determinism is engine-neutral by construction: relevance and pairwise
  * similarities are rounded to 6 BEFORE the argmax, the step score is
  * rounded to 6, and ties break by ascending id — so a SQL engine
  * replaying the unrolled steps (q201) picks the identical chain.
  * Similarity is cosine in f64, the [[graft.functions.DistanceKernels]]
  * accumulation order.
  */
object Mmr {

  /** Internal row shape for the grouped greedy (public: the Dataset
    * encoder's generated deserializer needs constructor access).
    */
  case class Cand(q: Long, id: Long, rel: Double, vec: Array[Float])

  private def r6(x: Double): Double = {
    // Spark/DuckDB round-half-away-from-zero at 6 digits
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
  }

  private def cosineSim(a: Array[Float], b: Array[Float]): Double = {
    require(a.length == b.length,
      s"dimension mismatch: ${a.length} vs ${b.length}")
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Select up to k diversified candidates per query. Input: one row per
    * (query, candidate) with a relevance column and the candidate vector;
    * output: (queryCol, idCol, rank 1..k, mmr_score), the greedy chain.
    */
  def mmrSelect(candidates: DataFrame, queryCol: String, idCol: String,
      relCol: String, vecCol: String, lambda: Double, k: Int,
      maxCandidates: Int = 100000): DataFrame = {
    require(lambda >= 0.0 && lambda <= 1.0,
      s"lambda must be in [0, 1], got $lambda")
    require(k > 0, s"k must be positive, got $k")
    val spark = candidates.sparkSession
    import spark.implicits._
    val ds = candidates.select(
      col(queryCol).cast("long").as("q"),
      col(idCol).cast("long").as("id"),
      col(relCol).cast("double").as("rel"),
      col(vecCol).cast("array<float>").as("vec"))
      .na.drop() // a candidate without relevance or vector can't compete
      .as[Cand]
    val out = ds.groupByKey(_.q).flatMapGroups { (q, it) =>
      val cands = it.toArray
      require(cands.length <= maxCandidates,
        s"query $q has ${cands.length} candidates > maxCandidates " +
          s"$maxCandidates — bound the retrieval stage first")
      val n = cands.length
      val rel6 = cands.map(c => r6(c.rel))
      // max rounded sim to the selected set; -inf until the first pick so a
      // NEGATIVE max similarity penalizes (rewards) exactly as in the
      // unrolled SQL replay — only the empty set maps to penalty 0
      val maxSim = Array.fill(n)(Double.NegativeInfinity)
      val taken = Array.fill(n)(false)
      val picks = Seq.newBuilder[(Long, Long, Int, Double)]
      var r = 1
      while (r <= math.min(k, n)) {
        var best = -1; var bestScore = Double.NegativeInfinity
        var i = 0
        while (i < n) {
          if (!taken(i)) {
            val pen = if (r == 1) 0.0 else maxSim(i)
            val s = r6(lambda * rel6(i) - (1.0 - lambda) * pen)
            if (s > bestScore ||
                (s == bestScore && (best < 0 || cands(i).id < cands(best).id))) {
              best = i; bestScore = s
            }
          }
          i += 1
        }
        taken(best) = true
        picks += ((q, cands(best).id, r, bestScore))
        var j = 0
        while (j < n) {
          if (!taken(j)) {
            val s = r6(cosineSim(cands(j).vec, cands(best).vec))
            if (s > maxSim(j)) maxSim(j) = s
          }
          j += 1
        }
        r += 1
      }
      picks.result().iterator
    }
    out.toDF(queryCol, idCol, "rank", "mmr_score")
  }
}
