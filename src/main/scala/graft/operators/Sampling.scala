package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-neutral sampling and split assignment for corpus
  * curation: stratified keep-fractions per group and train/val/test split
  * labels, both derived from an md5 key hash so (a) any engine reproduces
  * the decision bit-for-bit (the DuckDB oracle replays it), (b) re-runs and
  * incremental appends are stable — a document's fate never depends on
  * partitioning, row order, or cluster size, and (c) the operator is a pure
  * PROJECTION/FILTER: zero shuffle, fully codegen'd, trivially 100TB-safe.
  *
  * Extends the reference's sampling surface (its `select=`/random draws over
  * windows, testdata-apis sized selections) with the per-stratum quota and
  * split-assignment forms an LLM data-mix pipeline needs.
  */
object Sampling {

  /** Null keys hash as this sentinel so a null-key row gets a deterministic
    * draw instead of silently vanishing (concat/md5 of a null is null, which
    * would fail every `<` compare — rows dropped by stratifiedSample even at
    * fraction 1.0, and all assigned the last split by assignSplit).
    */
  val NullKeySentinel = "__null__"

  /** Uniform hash in [0, 1e6) as a LONG: first 15 md5 hex digits of
    * `key:salt` (60 bits, exactly representable) mod 1e6. Integer compare
    * against `round(fraction * 1e6)` avoids float-threshold edge cases.
    * DuckDB replay:
    * `('0x' || substr(md5(coalesce(key::VARCHAR, '__null__') || ':salt'), 1, 15))::BIGINT % 1000000`.
    */
  /** Raw 60-bit md5 key hash (the [[hashUnit]] numerator). DuckDB replay:
    * `('0x' || substr(md5(coalesce(key::VARCHAR, '__null__') || ':salt'), 1, 15))::BIGINT`.
    */
  def hash60(key: Column, salt: String): Column =
    conv(substring(md5(concat(
      coalesce(key.cast("string"), lit(NullKeySentinel)), lit(":" + salt))), 1, 15), 16, 10)
      .cast("long")

  def hashUnit(key: Column, salt: String): Column =
    pmod(hash60(key, salt), lit(1000000L))

  /** [0,1] fraction -> integer hash quota, shared by both operators so the
    * documented replay SQL (`round(f * 1e6)`) holds everywhere. */
  private def quotaOf(f: Double): Long = (f * 1e6).round

  /** Keep each row with its stratum's fraction: deterministic per-key draw
    * compared to the per-stratum quota. Strata absent from `fractions` use
    * `default`. Null keys draw from the sentinel hash (see
    * [[NullKeySentinel]]); null strata fall through to `default`.
    */
  def stratifiedSample(df: DataFrame, strataCol: String, keyCol: String,
      fractions: Map[String, Double], default: Double = 0.0,
      salt: String = "strat"): DataFrame = {
    require((fractions.values ++ Seq(default)).forall(f => f >= 0.0 && f <= 1.0),
      "fractions must be in [0, 1]")
    val quota = fractions.foldLeft(lit(quotaOf(default))) { case (acc, (s, f)) =>
      when(col(strataCol) === s, lit(quotaOf(f))).otherwise(acc)
    }
    df.filter(hashUnit(col(keyCol), salt) < quota)
  }

  /** Assign a split label per row from cumulative weight thresholds:
    * `splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)`. Weights
    * must sum to 1 (±1e-9). Deterministic in the key (null keys included,
    * via the sentinel hash); adding data never reassigns existing rows.
    */
  def assignSplit(df: DataFrame, keyCol: String, splits: Seq[(String, Double)],
      salt: String = "split", outCol: String = "split"): DataFrame = {
    require(splits.nonEmpty && math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      "split weights must sum to 1")
    val u = hashUnit(col(keyCol), salt)
    val thresholds = splits.scanLeft(0.0)(_ + _._2).tail.map(quotaOf)
    val labeled = splits.map(_._1).zip(thresholds).reverse
      .foldLeft(lit(splits.last._1)) { case (acc, (name, cum)) =>
        when(u < cum, name).otherwise(acc)
      }
    df.withColumn(outCol, labeled)
  }

  /** Weighted sampling WITHOUT replacement, deterministic (Efraimidis &
    * Spirakis 2006, one-pass A-ES form): each row draws u from the
    * md5-60 key hash, ranks by `es = ln(u) / w`, and the n LARGEST ranks
    * win — inclusion probability proportional to weight, no RNG state, a
    * row's draw never depends on partitioning or corpus growth. Rows with
    * null or non-positive weight are excluded (the algorithm's domain).
    *
    * Scale shape: a pure projection feeding `orderBy(...).limit(n)` —
    * Catalyst plans TakeOrderedAndProject (per-partition bounded heap of n,
    * driver merges n per partition), never a global sort. Output = the
    * winning rows with their `es_key` rounded to 6 (selection uses the
    * unrounded key; ties break by the sample key column).
    */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: String, n: Int,
      salt: String = "wsample"): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    require(!df.columns.contains("_es") && !df.columns.contains("es_key"),
      "input collides with reserved columns _es/es_key")
    // u = (h+1) / 2^60 in (0, 1]: +1 dodges ln(0); both bounds exact in f64
    val u = (hash60(col(keyCol), salt) + 1).cast("double") / lit(math.pow(2, 60))
    df.filter(col(weightCol).cast("double") > 0)
      .withColumn("_es", log(u) / col(weightCol).cast("double"))
      .orderBy(col("_es").desc, col(keyCol))
      .limit(n)
      .withColumn("es_key", round(col("_es"), 6))
      .drop("_es")
  }

  /** Curriculum schedule: cut the corpus into `k` difficulty stages
    * (ntile by ascending `difficultyCol` — easy first) and give every row
    * a deterministic within-stage shuffle key, so a trainer consuming in
    * `(stage, shuffle_key, id)` order sees stages in sequence but each
    * stage in seeded-random document order. Appends `stage` (1..k) and
    * `shuffle_key`. No single-partition window: the stage comes from
    * [[Ranking.ntileBuckets]]' two-pass rank (one range shuffle), the
    * shuffle key is a pure per-row hash — an epoch reshuffle is a salt
    * change, not a data move.
    */
  def curriculumSchedule(df: DataFrame, idCol: String, difficultyCol: String,
      k: Int, salt: String = "curriculum"): DataFrame = {
    require(!df.columns.contains("shuffle_key"),
      "input collides with reserved column shuffle_key")
    Ranking.ntileBuckets(df, Seq(difficultyCol, idCol), k, bucketCol = "stage")
      .withColumn("shuffle_key", hashUnit(col(idCol), salt))
  }

  /** Deterministic k-per-group sample: rank each group by the salted key
    * hash (uniform random order, reproducible) and keep in-group rank ≤ k
    * — the inspection/eval-slice sampler ("5 random docs per language",
    * same 5 every run). Window-free: [[Ranking.groupedRank]]'s one global
    * range shuffle + broadcast offsets, so a group with 90% of the corpus
    * still spreads across tasks. Appends `rn` (the in-group rank).
    */
  def perGroupSample(df: DataFrame, groupCol: String, keyCol: String, k: Int,
      salt: String = "pergroup"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(!df.columns.contains("_h") && !df.columns.contains("rn"),
      "input collides with reserved columns _h/rn")
    Ranking.groupedRank(df.withColumn("_h", hashUnit(col(keyCol), salt)),
        groupCol, Seq("_h", keyCol), rankCol = "rn")
      .filter(col("rn") <= k)
      .drop("_h")
  }

  /** Token-budget selection: keep the maximal PREFIX of rows, in
    * score-density order (score/cost desc, id ties ascending), whose
    * cumulative cost fits `budget` — "the best `budget` tokens of this
    * corpus", the greedy knapsack a data-selection stage runs after
    * scoring. Density rounds to 6 before ordering so any engine replays
    * the cut (the [[Mmr]]/[[Coreset]] convention); rows past the first
    * overflow are out even if a later small row would fit (prefix
    * semantics, stated contract).
    *
    * Scale shape: [[Ranking.exclusivePrefixSum]]'s machinery — ONE range
    * shuffle on the density order, per-partition running sums against
    * broadcast offsets, no Window, no single partition. Appends
    * `cum_before` (cost mass strictly ahead of the row; `costCol` comes
    * back cast to long).
    */
  def budgetSelect(df: DataFrame, idCol: String, scoreCol: String,
      costCol: String, budget: Long): DataFrame = {
    require(budget >= 0L, s"budget must be >= 0, got $budget")
    require(!df.columns.contains("_neg_density") && !df.columns.contains("cum_before"),
      "input collides with reserved columns _neg_density/cum_before")
    // rows without a computable density (null score/cost, cost <= 0)
    // can't be ordered or budgeted — dropped, documented
    val d = df
      .filter(col(scoreCol).isNotNull && col(costCol).isNotNull && col(costCol) > 0)
      .withColumn("_neg_density", -round(col(scoreCol) / col(costCol), 6))
    Ranking.exclusivePrefixSum(d, Seq("_neg_density", idCol), costCol, "cum_before")
      .filter(col("cum_before") + col(costCol) <= budget)
      .drop("_neg_density")
  }

  /** [[budgetSelect]] with an INDEPENDENT budget per group ("2000 tokens
    * of every language"): the per-group greedy prefix in density order,
    * via [[Ranking.groupedExclusivePrefixSum]] — one range shuffle on
    * (group, density, id), O(partitions) driver state regardless of
    * group count, no Window. Same determinism and degenerate-row
    * contracts as the global form.
    */
  def budgetSelectPerGroup(df: DataFrame, groupCol: String, idCol: String,
      scoreCol: String, costCol: String, budgetPerGroup: Long): DataFrame = {
    require(budgetPerGroup >= 0L,
      s"budgetPerGroup must be >= 0, got $budgetPerGroup")
    require(!df.columns.contains("_neg_density") && !df.columns.contains("cum_before"),
      "input collides with reserved columns _neg_density/cum_before")
    val d = df
      .filter(col(groupCol).isNotNull &&
        col(scoreCol).isNotNull && col(costCol).isNotNull && col(costCol) > 0)
      .withColumn("_neg_density", -round(col(scoreCol) / col(costCol), 6))
    Ranking.groupedExclusivePrefixSum(d, groupCol,
        Seq("_neg_density", idCol), costCol, "cum_before")
      .filter(col("cum_before") + col(costCol) <= budgetPerGroup)
      .drop("_neg_density")
  }

  /** Split-hygiene audit: how many near-duplicate pairs CROSS split
    * boundaries — the train/test contamination a hash split cannot see
    * (hash splits are per-document; near-dups are per-PAIR, so a test
    * document's twin lands in train with probability ≈ the train
    * fraction). `pairs` is any pair relation (LSH, SimHash, embedding
    * near-dup); `assign` is [[assignSplit]]'s output. One row per
    * unordered split pair: (split_a ≤ split_b, pairs, frac of all pairs,
    * cross_split flag). Two hash joins against the 16-byte assignment +
    * one count — the pair relation never re-derives.
    */
  def splitLeakage(pairs: DataFrame, assign: DataFrame,
      idACol: String = "id_a", idBCol: String = "id_b",
      idCol: String = "doc_id", splitCol: String = "split"): DataFrame = {
    val a = assign.select(col(idCol).as("_ida"), col(splitCol).as("_sa"))
    val b = assign.select(col(idCol).as("_idb"), col(splitCol).as("_sb"))
    val byPair = pairs
      .join(a, col(idACol) === col("_ida"))
      .join(b, col(idBCol) === col("_idb"))
      .groupBy(least(col("_sa"), col("_sb")).as("split_a"),
        greatest(col("_sa"), col("_sb")).as("split_b"))
      .agg(count(lit(1)).as("pairs"))
    val tot = byPair.agg(sum(col("pairs")).as("_tot"))
    byPair.crossJoin(broadcast(tot))
      .select(col("split_a"), col("split_b"), col("pairs"),
        round(col("pairs").cast("double") / col("_tot"), 6).as("frac"),
        (col("split_a") =!= col("split_b")).as("cross_split"))
  }
}
