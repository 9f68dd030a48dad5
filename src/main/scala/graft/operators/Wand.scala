package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Block-max WAND: exact BM25 top-k that SKIPS postings blocks whose score
  * upper bound cannot beat the running threshold — the standard exact
  * top-k accelerator for inverted indexes (Broder et al. WAND, Ding &
  * Suel block-max; public literature). The reference engine has no sparse
  * retrieval at all (SURVEY §2.3 — its search surface is vector KNN);
  * this accelerates the repo's own [[Bm25.bm25]], whose exhaustive
  * postings aggregate scores EVERY candidate document.
  *
  * Distributed shape — document-at-a-time WAND pivoting is inherently
  * sequential, so the Spark formulation is BULK block pruning, the same
  * exactness guarantee by a set argument instead of a cursor argument:
  *
  *  1. INDEX (query-independent, built once, persisted): per-posting
  *     BM25 impact `s(t,d) = idf(t)·tf·(k1+1)/(tf + k1·(1−b+b·len/avg))`
  *     — the BM25 term score does not depend on the query, only on which
  *     terms the query selects — keyed by (term, block), block =
  *     `doc_id / blockSize`; plus per-(term, block) maxima `bm(t,blk)`.
  *     At 100 TB the postings persist partitioned by term and sorted by
  *     block, so a query's scan prunes to its terms' row groups; the
  *     block-max side relation is |terms|·|blocks| — tiny.
  *  2. SEED: `UB(blk) = Σ_{t∈q} bm(t,blk)` (an unseen term contributes
  *     0); exactly score the `seedBlocks` blocks with the greatest UB
  *     (ties: lower block id) and take the k-th best rounded score as
  *     the threshold θ (−∞ when they hold fewer than k docs — then
  *     nothing prunes, correctness never depends on the seed guess).
  *  3. PRUNE: a block survives iff `round(UB,6) ≥ θ − 1e-6`. Every doc
  *     d in a skipped block has `round(score(d),6) ≤ round(UB,6) < θ` —
  *     strictly below the k-th seed score even after rounding — so it
  *     cannot enter the top-k under the (rounded score desc, id asc)
  *     order. Skipping is therefore EXACT, not approximate; the 1e-6
  *     margin makes the rounded-tie boundary safe in the inclusive
  *     direction (admitting an extra block is always correct).
  *  4. SCORE: exhaustive BM25 over surviving blocks only, global top-k.
  *
  * Every step is deterministic arithmetic over counts — the DuckDB
  * oracle replays seed, θ, pruning and final ranking from first
  * principles (q278), and the skipped-postings card (q279) oracles the
  * measured saving itself. WandSpec additionally pins top-k equality
  * with [[Bm25.bm25]] across fixtures where pruning does fire.
  */
object Wand {

  /** Query-independent impact postings: (tok, blk, id, impact DOUBLE) plus
    * the block-max side table (tok, blk, bm). `docs` is scanned once; the
    * postings shuffle once on (id, tok) for tf aggregation, then once on
    * tok for document frequencies — the same two exchanges as
    * [[Bm25.bm25]]'s build, now reusable across queries.
    */
  def impactIndex(docs: DataFrame, idCol: String, textCol: String,
      blockSize: Long = 64L, k1: Double = 1.2, b: Double = 0.75)
      : (DataFrame, DataFrame) = {
    require(blockSize > 0, s"impactIndex: blockSize must be positive: $blockSize")
    val toks = docs.select(col(idCol).cast("long").as("id"),
      TextFunctions.tokens(lower(coalesce(col(textCol), lit("")))).as("toks"))
    val stats = toks.agg(count(lit(1)).cast("double").as("n_docs"),
      avg(size(col("toks")).cast("double")).as("avg_len"))
    val tf = toks
      .select(col("id"), size(col("toks")).cast("double").as("len"),
        explode(col("toks")).as("tok"))
      .groupBy("id", "len", "tok").agg(count(lit(1)).cast("double").as("tf"))
    val dfreq = tf.groupBy("tok").agg(count(lit(1)).cast("double").as("df"))
    val postings = tf.join(dfreq, Seq("tok"))
      .crossJoin(broadcast(stats))
      // floor division on longs (matches SQL `id // blockSize` for negative
      // ids too, exact for the full long range): subtract the non-negative
      // pmod remainder, then the integral divide is exact by construction.
      .select(col("tok"),
        expr(s"(id - pmod(id, ${blockSize}L)) div ${blockSize}L").as("blk"),
        col("id"),
        (log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
          * col("tf") * lit(k1 + 1.0)
          / (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("len") / col("avg_len"))))
          .as("impact"))
    val blockMax = postings.groupBy("tok", "blk").agg(max(col("impact")).as("bm"))
    (postings, blockMax)
  }

  /** Internal: surviving (blk) frame + the threshold relation, shared by
    * [[topK]] and [[pruningCard]]. Returns (survivors, candidates,
    * queryPostings, thetaDf).
    */
  private def prune(postings: DataFrame, blockMax: DataFrame,
      terms: Seq[String], k: Int, seedBlocks: Int)
      : (DataFrame, DataFrame, DataFrame) = {
    require(terms.nonEmpty, "wand: at least one query term")
    require(k > 0 && seedBlocks > 0, s"wand: bad k=$k or seedBlocks=$seedBlocks")
    val qTerms = terms.map(_.toLowerCase).distinct
    val qPost = postings.filter(col("tok").isin(qTerms: _*))
    val ub = blockMax.filter(col("tok").isin(qTerms: _*))
      .groupBy("blk").agg(round(sum(col("bm")), 6).as("ub"))
    // seed: exactly score the seedBlocks highest-UB blocks; θ = k-th best
    // rounded doc score there (or −∞ when they hold fewer than k docs)
    val seed = ub.orderBy(col("ub").desc, col("blk")).limit(seedBlocks)
      .select(col("blk"))
    val seedScores = qPost.join(broadcast(seed), Seq("blk"))
      .groupBy("id").agg(round(sum(col("impact")), 6).as("score"))
    val theta = seedScores.orderBy(col("score").desc, col("id")).limit(k)
      .agg(when(count(lit(1)) === k, min(col("score")))
        .otherwise(lit(Double.NegativeInfinity)).as("theta"))
    val survivors = ub.crossJoin(broadcast(theta))
      .filter(col("ub") >= col("theta") - lit(1e-6))
      .select(col("blk"))
    (survivors, qPost, ub)
  }

  /** Exact BM25 top-k via block-max pruning — identical result to
    * [[Bm25.bm25]] with the same (k1, b), by the skipped-block bound
    * argument above. Output: (id, score) like `bm25`.
    */
  def topK(postings: DataFrame, blockMax: DataFrame, terms: Seq[String],
      k: Int, seedBlocks: Int = 4): DataFrame = {
    val (survivors, qPost, _) = prune(postings, blockMax, terms, k, seedBlocks)
    qPost.join(survivors.hint("broadcast"), Seq("blk"))
      .groupBy("id").agg(round(sum(col("impact")), 6).as("score"))
      .orderBy(col("score").desc, col("id"))
      .limit(k)
  }

  /** The measured saving: postings/blocks touched vs skipped for one
    * query — the number that says whether block-max pruning pays at this
    * corpus/query shape. One row: blocks_total, blocks_scored,
    * postings_total, postings_scored, skipped_frac (of postings).
    */
  def pruningCard(postings: DataFrame, blockMax: DataFrame, terms: Seq[String],
      k: Int, seedBlocks: Int = 4): DataFrame = {
    val (survivors, qPost, ub) = prune(postings, blockMax, terms, k, seedBlocks)
    val tot = qPost.agg(count(lit(1)).as("postings_total"))
    val scored = qPost.join(survivors.hint("broadcast"), Seq("blk"))
      .agg(count(lit(1)).as("postings_scored"))
    val blocksTot = ub.agg(count(lit(1)).as("blocks_total"))
    val blocksScored = survivors.agg(count(lit(1)).as("blocks_scored"))
    blocksTot.crossJoin(broadcast(blocksScored))
      .crossJoin(broadcast(tot)).crossJoin(broadcast(scored))
      .select(col("blocks_total"), col("blocks_scored"),
        col("postings_total"), col("postings_scored"),
        round(lit(1.0) - col("postings_scored").cast("double")
          / col("postings_total"), 6).as("skipped_frac"))
  }
}
