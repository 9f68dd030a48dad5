package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

import graft.functions.TopKPairs.topKPairs
import graft.functions.VectorFunctions

/** Exact KNN ground-truth computation and recall verification (SURVEY.md
  * J3/J4/W1/A14; reference: `compute knn` / `verify_knn`, README.md:49-51,
  * docs/user_manual/03-cli-reference.md:203-222).
  *
  * Physical shape, chosen for the 100TB posture: the (small) query set is
  * broadcast against the (huge) base relation; per-task bounded heaps do the
  * top-k map-side via partial aggregation, so the only shuffle is
  * num_partitions × |Q| serialized k-heaps — never the |Q|×|B| pair stream.
  * An exact result (this is ground-truth tooling), unlike LSH-style ANN.
  */
object Knn {

  /** Top-k nearest neighbors of each query vector.
    *
    * @param queries  DataFrame with (idCol, vecCol) — expected small (broadcast)
    * @param base     DataFrame with (idCol, vecCol) — arbitrarily large
    * @param pairPredicate optional predicate over the joined (query×base) row,
    *   e.g. hybrid-query metadata restriction (J2); columns of both sides are
    *   in scope via the supplied extra columns.
    * @param excludeSelf drop base rows whose id equals the query id
    * @return (query_id, neighbor_id, rank, dist), rank 1..k by (dist, id) asc
    */
  def knn(
      queries: DataFrame,
      base: DataFrame,
      k: Int,
      metric: String = "COSINE",
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      queryExtra: Seq[String] = Nil,
      baseExtra: Seq[String] = Nil,
      pairPredicate: Option[Column] = None,
      excludeSelf: Boolean = false): DataFrame = {

    val q = queries.select(
      (Seq(col(idCol).cast("long").as("query_id"), col(vecCol).as("q_vec")) ++
        queryExtra.map(c => col(c).as(s"q_$c"))): _*)
    val b = base.select(
      (Seq(col(idCol).cast("long").as("neighbor_id"), col(vecCol).as("b_vec")) ++
        baseExtra.map(c => col(c).as(s"b_$c"))): _*)

    var pairs = b.crossJoin(broadcast(q))
    if (excludeSelf) pairs = pairs.filter(col("neighbor_id") =!= col("query_id"))
    pairPredicate.foreach(p => pairs = pairs.filter(p))

    pairs
      .groupBy("query_id")
      .agg(topKPairs(
        VectorFunctions.distance(col("q_vec"), col("b_vec"), metric),
        col("neighbor_id"), k).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "pair")))
      .select(
        col("query_id"),
        col("pair.id").as("neighbor_id"),
        (col("pos") + 1).as("rank"),
        col("pair.dist").as("dist"))
  }

  /** [[knn]] for query sets too large for a single broadcast (the 100TB
    * deployment note in PLANS.md): queries are split into `nChunks`
    * deterministic hash partitions, each chunk runs the broadcast+heap plan
    * independently, and the per-chunk results union. Per-query top-k is
    * independent across queries, so the result is EXACTLY knn()'s; the
    * trade is `nChunks` scans of the base for an `|Q|/nChunks`-sized
    * broadcast. Use when |Q|·dim·4B would blow the broadcast budget.
    */
  def knnChunked(
      queries: DataFrame,
      base: DataFrame,
      k: Int,
      nChunks: Int,
      metric: String = "COSINE",
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(nChunks > 0, s"nChunks must be positive, got $nChunks")
    (0 until nChunks).map { i =>
      knn(queries.filter(pmod(xxhash64(col(idCol)), lit(nChunks)) === i),
        base, k, metric, idCol, vecCol)
    }.reduce(_ unionByName _)
  }

  /** [[knn]] with NO broadcast and NO base re-scans — the shuffle-partitioned
    * exact form for query sets too large even to chunk. Queries hash into
    * `nQBlocks` blocks and base rows into `nBBlocks`; each side replicates
    * across the other dimension so every (query-block, base-block) grid cell
    * meets on a plain shuffle key, and the bounded-heap aggregate reduces
    * each cell's pair stream MAP-SIDE — only k-sized partial heaps cross the
    * second exchange (the k-way merge). Results are EXACTLY [[knn]]'s (same
    * distances, same (dist, id) tie rule — per-query top-k is insensitive to
    * how its pairs were blocked).
    *
    * The trade vs [[knnChunked]]: the base crosses the wire `nQBlocks` times
    * and the queries `nBBlocks` times, instead of `nChunks` full base SCANS
    * each gated on a driver-held broadcast. At 100 TB pick
    * `nQBlocks ≈ |Q|·dim·4 B / (shuffle-partition budget)` so one replicated
    * query block fits a task, and `nBBlocks ≈ |B|·dim·4 B / (same budget)`;
    * the |Q|×|B| pair space itself never materializes anywhere.
    *
    * SIZING CONSTRAINT: the partial heap aggregate's key count per task is
    * queries-per-block × CELLS-PER-SHUFFLE-PARTITION, and it must stay
    * under `spark.sql.objectHashAggregate.sortBased.fallbackThreshold`
    * (this repo's sessions set 65536; Spark's default is 128). Past it,
    * the partial aggregate falls back to SORT-BASED aggregation, which
    * sorts the raw pair stream — measured as a disk-filling spill at
    * 200k×10k, and (round 8) as a 1M×100k grid run that went from ~8 min
    * of kernel work to 45+ min of spill when hash collisions packed 3 of
    * the 16 grid cells into one shuffle partition (25k queries × 3 cells
    * = 75k keys > 65536). The cells-per-partition factor is why this
    * method now repartitions the grid join onto ≥4× nQBlocks·nBBlocks
    * partitions: with cells spread that thin the expected max is 1–2
    * cells per task, keeping the key count at queries-per-block scale.
    * The heap buffers are k-sized, so hash mode is safe at any realistic
    * key count; raise the threshold or nQBlocks together.
    */
  def knnPartitioned(
      queries: DataFrame,
      base: DataFrame,
      k: Int,
      nQBlocks: Int,
      nBBlocks: Int,
      metric: String = "COSINE",
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(nQBlocks > 0, s"nQBlocks must be positive, got $nQBlocks")
    require(nBBlocks > 0, s"nBBlocks must be positive, got $nBBlocks")
    val q = queries.select(col(idCol).cast("long").as("query_id"),
      col(vecCol).as("q_vec"),
      pmod(xxhash64(col(idCol)), lit(nQBlocks)).cast("int").as("_qb"))
    val b = base.select(col(idCol).cast("long").as("neighbor_id"),
      col(vecCol).as("b_vec"),
      pmod(xxhash64(col(idCol)), lit(nBBlocks)).cast("int").as("_bb"))
    val qRep = q.withColumn("_bb", explode(sequence(lit(0), lit(nBBlocks - 1))))
    val bRep = b.withColumn("_qb", explode(sequence(lit(0), lit(nQBlocks - 1))))
    // spread the nQBlocks×nBBlocks cells across ≥4× as many partitions:
    // hash collisions otherwise pack multiple cells into one task and the
    // partial-heap key count multiplies past the sort-based-fallback cliff
    // (see the sizing constraint above). Repartitioning on the join keys IS
    // the join exchange — no extra shuffle is added.
    val gridParts = math.max(
      queries.sparkSession.sessionState.conf.numShufflePartitions,
      nQBlocks * nBBlocks * 4)
    qRep.repartition(gridParts, col("_qb"), col("_bb"))
      .join(bRep.repartition(gridParts, col("_qb"), col("_bb")), Seq("_qb", "_bb"))
      .groupBy("query_id")
      .agg(topKPairs(
        VectorFunctions.distance(col("q_vec"), col("b_vec"), metric),
        col("neighbor_id"), k).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "pair")))
      .select(
        col("query_id"),
        col("pair.id").as("neighbor_id"),
        (col("pos") + 1).as("rank"),
        col("pair.dist").as("dist"))
  }

  /** Adaptive dispatch over the three exact forms: measure the QUERY side
    * (one count + one row for the dim — it is the small side by
    * construction) and pick broadcast / chunked / partitioned so the
    * broadcast budget and the sort-based-fallback cliff are respected
    * without the caller sizing anything. The base side is never scanned to
    * decide: its only role is choosing `nBBlocks` in the partitioned
    * regime, read from Catalyst's size estimate (plan statistics, free).
    *
    * Regimes (budget defaults: 128 MB broadcast, ≤4 extra base scans):
    *  - query bytes ≤ budget            → `knn` (one broadcast)
    *  - ≤ budget × maxBaseScans         → `knnChunked` (nChunks = ⌈bytes/budget⌉)
    *  - else                            → `knnPartitioned`, with nQBlocks
    *    sized to the budget AND the per-block query count held under the
    *    sort-based-fallback threshold — which this method RAISES to 65536
    *    for the session if it is lower (the silent cliff documented on
    *    [[knnPartitioned]]), and nBBlocks from the base size estimate at
    *    ~256 MB of vectors per block.
    * Returns the same (query_id, neighbor_id, rank, dist) contract.
    */
  def auto(
      queries: DataFrame,
      base: DataFrame,
      k: Int,
      metric: String = "COSINE",
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      broadcastBudgetBytes: Long = 128L << 20,
      maxBaseScans: Int = 4): DataFrame =
    autoPlan(queries, base, k, metric, idCol, vecCol,
      broadcastBudgetBytes, maxBaseScans)._2

  /** [[auto]] exposing the chosen strategy name ("broadcast" | "chunked" |
    * "partitioned") for specs, logs and the CLI's plan report.
    */
  def autoPlan(
      queries: DataFrame,
      base: DataFrame,
      k: Int,
      metric: String = "COSINE",
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      broadcastBudgetBytes: Long = 128L << 20,
      maxBaseScans: Int = 4): (String, DataFrame) = {
    require(broadcastBudgetBytes > 0 && maxBaseScans >= 1,
      "auto: budget must be positive and maxBaseScans >= 1")
    val spark = queries.sparkSession
    val nQ = queries.count()
    if (nQ == 0L) return ("broadcast", knn(queries, base, k, metric, idCol, vecCol))
    val dim = queries.select(col(vecCol)).head().getSeq[Any](0).length
    // per-row broadcast cost: dim floats + id + array/row overhead
    val qBytes = nQ * (dim.toLong * 4 + 64)
    if (qBytes <= broadcastBudgetBytes)
      ("broadcast", knn(queries, base, k, metric, idCol, vecCol))
    else {
      val nChunks = ((qBytes + broadcastBudgetBytes - 1) / broadcastBudgetBytes).toInt
      if (nChunks <= maxBaseScans)
        ("chunked", knnChunked(queries, base, k, nChunks, metric, idCol, vecCol))
      else {
        val fallbackKey = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
        val fallback = spark.conf.getOption(fallbackKey).map(_.toInt).getOrElse(128)
        if (fallback < 65536) spark.conf.set(fallbackKey, "65536")
        val maxQPerBlock = math.max(1024, math.min(
          spark.conf.get(fallbackKey).toInt / 2,
          (broadcastBudgetBytes / (dim.toLong * 4 + 64)).toInt))
        val nQBlocks = ((nQ + maxQPerBlock - 1) / maxQPerBlock).toInt
        // base size from plan statistics — an ESTIMATE is fine: nBBlocks
        // only balances task size, never correctness
        val bBytes = base.queryExecution.optimizedPlan.stats.sizeInBytes
        val nBBlocks = math.max(1, math.min(4096,
          (bBytes / BigInt(256L << 20)).toInt + 1))
        ("partitioned",
          knnPartitioned(queries, base, k, nQBlocks, nBBlocks, metric, idCol, vecCol))
      }
    }
  }

  /** J4 `verify_profiles`: recall@k for several profiles at once —
    * (profile, avg_recall) rows, one per named (predicted, truth) pair.
    */
  def verifyProfiles(profiles: Seq[(String, DataFrame, DataFrame)], k: Int): DataFrame =
    profiles.map { case (name, predicted, truth) =>
      avgRecall(predicted, truth, k).select(lit(name).as("profile"), col("avg_recall"))
    }.reduce(_ unionByName _)

  /** recall@k between two (query_id, neighbor_id) neighbor sets — J4's
    * verify_knn: |predicted ∩ truth| / k averaged over queries.
    */
  def avgRecall(predicted: DataFrame, truth: DataFrame, k: Int): DataFrame = {
    val p = predicted.select(col("query_id"), col("neighbor_id"))
    val t = truth.select(col("query_id"), col("neighbor_id"))
    val hits = p.join(t, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("hits"))
    // every query contributes, including zero-hit ones
    t.select("query_id").distinct()
      .join(hits, Seq("query_id"), "left")
      .select(coalesce(col("hits"), lit(0L)).as("hits"))
      .agg(round(avg(col("hits").cast("double") / k), 4).as("avg_recall"))
  }
}
