package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale-safe global ranking and quantile bucketing. A naive
  * `row_number().over(Window.orderBy(...))` or `ntile(k)` drags the whole
  * relation through ONE partition (Spark warns "No Partition Defined for
  * Window operation"); at corpus scale that window is the job. This is the
  * two-pass range-partition pattern `Packing.packCoordinates` uses for its
  * prefix sum, specialized to row COUNTS: range-repartition on the order
  * key, collect one count per partition (numPartitions longs of driver
  * state — the same order as the range partitioner's own sample), then add
  * the broadcast partition offset to a running local index. ONE shuffle
  * total; both passes reuse the same range-exchange files.
  *
  * The caller's `orderCols` must be a TOTAL order (include a unique
  * tiebreaker such as the id column) — rows that compare equal would
  * otherwise take partition-dependent ranks. Determinism does not depend on
  * where the range boundaries fall: any range partitioning of a total order
  * yields the same global ranks.
  *
  * The primary consumer is quantile bucketing (`ntile`): CCNet-style
  * perplexity bucketing assigns each document to one of k equal-size
  * buckets by LM surprisal; the head bucket is boilerplate, the tail bucket
  * is garbage vocabulary, and mid buckets feed training mixtures.
  *
  * INPUT PINNING: like packCoordinates, the per-partition counts job runs
  * eagerly and freezes offsets; a non-deterministic input recomputed after
  * shuffle-file loss could disagree. Cache volatile inputs first.
  */
object Ranking {

  /** Rank pass returning the ranked frame plus the total row count (free
    * from the partition-counts job — no extra aggregate).
    */
  private def rankWithCount(df: DataFrame, orderCols: Seq[String],
      rankCol: String, numParts: Int): (DataFrame, Long) = {
    require(orderCols.nonEmpty, "globalRank needs at least one order column")
    // reserved-column guard (the Mixture.materialize convention): appending
    // a rank column over an input that already has one would produce
    // duplicate field names and an ambiguous downstream col(rankCol)
    require(!df.columns.contains(rankCol),
      s"input already has a '$rankCol' column; pass a different rankCol")
    val spark = df.sparkSession
    val parts = if (numParts > 0) numParts
      else spark.sessionState.conf.numShufflePartitions
    val oc: Seq[Column] = orderCols.map(col)
    val base = df.repartitionByRange(parts, oc: _*)
      .sortWithinPartitions(oc: _*)
    val schema = base.schema
    // InternalRow lineage, not `.rdd`: the external-Row conversion boxes
    // every field and plans a serialization boundary that knocks the rank
    // output out of whole-stage codegen. `toRdd` shares one lineage, so
    // the range-exchange map stage computes once across both passes.
    val rows = base.queryExecution.toRdd
    val counts = rows.mapPartitionsWithIndex { case (pid, it) =>
      Iterator(pid -> it.size.toLong)
    }.collect().toMap
    val offsets = (0 until rows.getNumPartitions)
      .map(p => counts.getOrElse(p, 0L)).scanLeft(0L)(_ + _).toArray
    val bc = spark.sparkContext.broadcast(offsets)
    val ranked = rows.mapPartitionsWithIndex { case (pid, it) =>
      var r = bc.value(pid)
      val extra = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
      val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow
      it.map { row => r += 1; extra.update(0, r)
        joined(row, extra): org.apache.spark.sql.catalyst.InternalRow }
    }
    val out = org.apache.spark.sql.graftbridge.Bridge.internalCreateDataFrame(
      spark, ranked,
      org.apache.spark.sql.types.StructType(schema.fields :+
        org.apache.spark.sql.types.StructField(rankCol,
          org.apache.spark.sql.types.LongType, nullable = false)))
    (out, offsets.last)
  }

  /** Append a 0-based CONTIGUOUS ordinal in the input's EXISTING partition
    * order — (partition, position-within-partition), i.e. file read order
    * for a fresh scan — with NO shuffle and NO window: one per-partition
    * count job plus a numbering pass sharing the same lineage. This is
    * the scale-safe replacement for
    * `row_number().over(Window.orderBy(monotonically_increasing_id()))`,
    * which funnels the whole input through one partition; the ordering it
    * produces is identical (monotonic ids sort by (partition, position)).
    * Same input-pinning caveat as [[exclusivePrefixSum]]: the source must
    * be deterministic across recomputation.
    */
  def fileOrderOrdinal(df: DataFrame, outCol: String): DataFrame = {
    require(!df.columns.contains(outCol),
      s"input already has a '$outCol' column; pass a different outCol")
    val spark = df.sparkSession
    val schema = df.schema
    val rows = df.queryExecution.toRdd
    val counts = rows.mapPartitionsWithIndex { case (pid, it) =>
      Iterator(pid -> it.size.toLong)
    }.collect().toMap
    val offsets = (0 until rows.getNumPartitions)
      .map(p => counts.getOrElse(p, 0L)).scanLeft(0L)(_ + _).toArray
    val bc = spark.sparkContext.broadcast(offsets)
    val numbered = rows.mapPartitionsWithIndex { case (pid, it) =>
      var r = bc.value(pid)
      val extra = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
      val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow
      it.map { row =>
        extra.update(0, r); r += 1
        joined(row, extra): org.apache.spark.sql.catalyst.InternalRow
      }
    }
    org.apache.spark.sql.graftbridge.Bridge.internalCreateDataFrame(
      spark, numbered,
      org.apache.spark.sql.types.StructType(schema.fields :+
        org.apache.spark.sql.types.StructField(outCol,
          org.apache.spark.sql.types.LongType, nullable = false)))
  }

  /** Append an EXCLUSIVE global prefix sum of long column `valueCol` in
    * `orderCols` order as `outCol` — the `Packing.packCoordinates` two-pass
    * range-partition shape exposed as a primitive (one range shuffle, no
    * single-partition window; both passes share the exchange files).
    * `orderCols` must be a TOTAL order over the input rows (include a
    * unique tiebreaker, or order by a key each row holds exactly once —
    * the per-score-value cumulative pattern): rows comparing equal would
    * otherwise take partition-dependent prefixes. Subject to the same
    * input-pinning caveat as `globalRank`.
    */
  def exclusivePrefixSum(df: DataFrame, orderCols: Seq[String],
      valueCol: String, outCol: String, numParts: Int = 0): DataFrame = {
    require(orderCols.nonEmpty, "exclusivePrefixSum needs an order column")
    require(!df.columns.contains(outCol),
      s"input already has a '$outCol' column; pass a different outCol")
    val spark = df.sparkSession
    val parts = if (numParts > 0) numParts
      else spark.sessionState.conf.numShufflePartitions
    val oc: Seq[Column] = orderCols.map(col)
    val base = df.withColumn(valueCol, col(valueCol).cast("long"))
      .repartitionByRange(parts, oc: _*)
      .sortWithinPartitions(oc: _*)
    val schema = base.schema
    val vIdx = schema.fieldIndex(valueCol)
    val rows = base.queryExecution.toRdd
    val totals = rows.mapPartitionsWithIndex { case (pid, it) =>
      var s = 0L
      it.foreach(r => s += r.getLong(vIdx))
      Iterator(pid -> s)
    }.collect().toMap
    val offsets = (0 until rows.getNumPartitions)
      .map(p => totals.getOrElse(p, 0L)).scanLeft(0L)(_ + _).toArray
    val bc = spark.sparkContext.broadcast(offsets)
    val withSum = rows.mapPartitionsWithIndex { case (pid, it) =>
      var run = bc.value(pid)
      val extra = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
      val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow
      it.map { r =>
        val before = run
        run += r.getLong(vIdx)
        extra.update(0, before)
        joined(r, extra): org.apache.spark.sql.catalyst.InternalRow
      }
    }
    org.apache.spark.sql.graftbridge.Bridge.internalCreateDataFrame(
      spark, withSum,
      org.apache.spark.sql.types.StructType(schema.fields :+
        org.apache.spark.sql.types.StructField(outCol,
          org.apache.spark.sql.types.LongType, nullable = false)))
  }

  /** PER-GROUP exclusive prefix sums without a window: range-partition on
    * `(groupCol, orderCols…)` so each group occupies a CONTIGUOUS run of
    * partitions, then two passes. Pass 1 collects, per partition, only
    * the totals of its FIRST and LAST group — the only groups that can
    * cross a partition boundary — so the driver state is O(partitions)
    * REGARDLESS of group count (a billion tiny groups collect nothing
    * beyond the boundary entries; one giant skewed group threads its
    * running carry through every partition it spans). Pass 2 streams
    * each partition with the carried offset for its first group, 0 for
    * every later group, resetting at group changes.
    *
    * The grouped sibling of [[exclusivePrefixSum]] — per-group running
    * token budgets, per-group packing coordinates, per-group CDFs — with
    * the same no-Window, one-range-shuffle contract.
    */
  def groupedExclusivePrefixSum(df: DataFrame, groupCol: String,
      orderCols: Seq[String], valueCol: String, outCol: String,
      numParts: Int = 0): DataFrame = {
    require(orderCols.nonEmpty, "groupedExclusivePrefixSum needs an order column")
    require(!df.columns.contains(outCol),
      s"input already has a '$outCol' column; pass a different outCol")
    val spark = df.sparkSession
    val parts = if (numParts > 0) numParts
      else spark.sessionState.conf.numShufflePartitions
    val oc: Seq[Column] = (groupCol +: orderCols).map(col)
    val base = df.withColumn(valueCol, col(valueCol).cast("long"))
      .repartitionByRange(parts, oc: _*)
      .sortWithinPartitions(oc: _*)
    val schema = base.schema
    val vIdx = schema.fieldIndex(valueCol)
    val gIdx = schema.fieldIndex(groupCol)
    val gType = schema.fields(gIdx).dataType
    val rows = base.queryExecution.toRdd

    // group keys are compared with Scala == across rows and partitions, so
    // the key type must carry VALUE equality: atomic types only (an array/
    // struct/map group key would need deep normalization)
    require({
      import org.apache.spark.sql.types._
      gType match {
        case _: NumericType | StringType | BinaryType | BooleanType |
            DateType | TimestampType | TimestampNTZType => true
        case _ => false
      }
    }, s"groupedExclusivePrefixSum: group column '$groupCol' must be an atomic " +
      s"type (string/numeric/binary/date/bool), got $gType")
    // COPY any stored group key: the row iterator may REUSE its UnsafeRow
    // buffer, so a raw UTF8String reference held across rows silently
    // mutates (whether it does depends on the spill path — the bug class
    // that only reproduces under some partition layouts). BINARY keys come
    // back as Array[Byte], where == is REFERENCE equality — wrap them in an
    // ArraySeq so every comparison (and the driver boundary walk) sees
    // element-wise value equality.
    def keyOf(r: org.apache.spark.sql.catalyst.InternalRow): Any =
      r.get(gIdx, gType) match {
        case u: org.apache.spark.unsafe.types.UTF8String => u.copy()
        case a: Array[Byte] =>
          scala.collection.immutable.ArraySeq.unsafeWrapArray(a.clone())
        case other => other
      }

    // pass 1: (firstGroup, firstTotal, lastGroup, lastTotal) per partition
    val bounds = rows.mapPartitionsWithIndex { case (pid, it) =>
      if (!it.hasNext) Iterator.empty
      else {
        var firstG: Any = null; var firstT = 0L
        var curG: Any = null; var curT = 0L
        var started = false
        it.foreach { r =>
          val g = keyOf(r)
          val v = r.getLong(vIdx)
          if (!started) {
            started = true; firstG = g; firstT = v; curG = g; curT = v
          } else if (g == curG) {
            curT += v
            if (g == firstG && curG == firstG) firstT = curT
          } else {
            curG = g; curT = v
          }
        }
        Iterator((pid, firstG, firstT, curG, curT))
      }
    }.collect().sortBy(_._1)

    // driver walk: carry the running total of the group spanning the
    // boundary into each partition's first group
    val offsets = scala.collection.mutable.HashMap.empty[Int, Long]
    var carryG: Any = null // last group of the previous non-empty partition
    var carryT = 0L        // its mass accumulated over its span so far
    var haveCarry = false
    bounds.foreach { case (pid, fg, _, lg, lt) =>
      val off = if (haveCarry && carryG == fg) carryT else 0L
      if (off != 0L) offsets.update(pid, off)
      carryG = lg
      // a single-group partition EXTENDS the span; otherwise the last
      // group starts fresh inside this partition
      carryT = if (fg == lg) off + lt else lt
      haveCarry = true
    }
    val bc = spark.sparkContext.broadcast(offsets.toMap)

    val withSum = rows.mapPartitionsWithIndex { case (pid, it) =>
      val extra = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
      val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow
      var run = bc.value.getOrElse(pid, 0L)
      var curG: Any = null
      var started = false
      it.map { r =>
        val g = keyOf(r) // copied: held across the (buffer-reusing) iterator
        if (!started) { started = true; curG = g }
        else if (g != curG) { curG = g; run = 0L }
        val before = run
        run += r.getLong(vIdx)
        extra.update(0, before)
        joined(r, extra): org.apache.spark.sql.catalyst.InternalRow
      }
    }
    org.apache.spark.sql.graftbridge.Bridge.internalCreateDataFrame(
      spark, withSum,
      org.apache.spark.sql.types.StructType(schema.fields :+
        org.apache.spark.sql.types.StructField(outCol,
          org.apache.spark.sql.types.LongType, nullable = false)))
  }

  /** Append a 1-based dense global `rank` column ordering by `orderCols`
    * (must be a total order). One range shuffle; no single-partition window.
    */
  def globalRank(df: DataFrame, orderCols: Seq[String],
      rankCol: String = "rank", numParts: Int = 0): DataFrame =
    rankWithCount(df, orderCols, rankCol, numParts)._1

  /** Append ANSI `percent_rank()` = (rank−1)/(n−1) ordering by `orderCols`
    * (rounded to 6, engine-replayable; n=1 yields 0.0 as SQL does) — the
    * score-normalization form of the global rank, same one-shuffle pass.
    */
  def percentRank(df: DataFrame, orderCols: Seq[String],
      outCol: String = "pr", numParts: Int = 0): DataFrame = {
    val (ranked, n) = rankWithCount(df, orderCols, "_rank", numParts)
    val pr = if (n <= 1L) lit(0.0)
      else round((col("_rank") - 1).cast("double") / (n - 1).toDouble, 6)
    ranked.withColumn(outCol, pr).drop("_rank")
  }

  /** k-quantile bucket THRESHOLDS (the CCNet cut points as VALUES, not row
    * ranks): t_i = quantile(i/k) for i in 1..k-1, so bucket i spans
    * (t_{i-1}, t_i]. `exact=true` computes them with the distributed-sort
    * exact form (`quantile_cont` semantics — engine-replayable, the oracle
    * path); `exact=false` uses the mergeable `percentile_approx` sketch
    * (GK-family) — the form a progressive-ingest pipeline can keep folding
    * micro-batches into, at a bounded rank error of n/accuracy. Output:
    * `(bucket, threshold)` with threshold rounded to 6.
    *
    * Thresholds versus `ntileBuckets`: ntile assigns by ROW RANK (exact
    * equal counts, needs the full relation), thresholds assign by VALUE —
    * which is what a stream needs, because a row's bucket is then a pure
    * function of the row against k−1 broadcast doubles (`bucketize`).
    */
  def bucketThresholds(df: DataFrame, valueCol: String, k: Int,
      exact: Boolean = true, accuracy: Int = 10000): DataFrame = {
    require(k >= 2, s"bucket count must be >= 2, got $k")
    val ps = (1 until k).map(_.toDouble / k)
    val qs = if (exact) ProfileStats.quantilesExactDistributed(df, col(valueCol), ps)
      else ProfileStats.quantilesApprox(df, col(valueCol), ps, accuracy)
    qs.select(round(col("p") * k).cast("long").as("bucket"),
      round(col("q").cast("double"), 6).as("threshold"))
  }

  /** Stateless bucket assignment against materialized thresholds: bucket =
    * 1 + |{t_i < v}| (ties at a threshold fall into the lower bucket,
    * matching the (t_{i-1}, t_i] spans of [[bucketThresholds]]). A pure
    * k-term projection — composes with batch and Structured Streaming
    * unchanged, the streaming half of CCNet quantile bucketing.
    */
  def bucketize(df: DataFrame, valueCol: String, thresholds: Seq[Double],
      bucketCol: String = "bucket"): DataFrame = {
    require(thresholds.nonEmpty, "bucketize needs at least one threshold")
    require(thresholds == thresholds.sorted, "thresholds must be ascending")
    require(!df.columns.contains(bucketCol),
      s"input already has a '$bucketCol' column; pass a different bucketCol")
    val v = col(valueCol).cast("double")
    val bucket = thresholds
      .map(t => when(v > t, 1L).otherwise(0L))
      .reduce(_ + _) + 1L
    df.withColumn(bucketCol, bucket)
  }

  /** Append SQL `ntile(k)` bucket numbers (1..k) ordering by `orderCols`,
    * without the single-partition window: the first `n mod k` buckets get
    * `ceil(n/k)` rows, the rest `floor(n/k)` — exactly ANSI ntile, derived
    * arithmetically from the global rank.
    */
  def ntileBuckets(df: DataFrame, orderCols: Seq[String], k: Int,
      bucketCol: String = "bucket", numParts: Int = 0): DataFrame = {
    require(k > 0, s"ntile bucket count must be positive, got $k")
    val (ranked, n) = rankWithCount(df, orderCols, "_rank", numParts)
    val q = n / k
    val rem = n % k
    val cut = rem * (q + 1) // ranks 1..cut fall in the ceil-sized buckets
    val r0 = col("_rank") - 1
    val bucket =
      if (q == 0L) col("_rank") // n < k: ntile gives row i bucket i
      else when(r0 < cut, floor(r0 / (q + 1)) + 1)
        .otherwise(floor((r0 - cut) / q) + rem + 1)
    ranked.withColumn(bucketCol, bucket.cast("long")).drop("_rank")
  }

  /** ANSI `percent_rank() OVER (PARTITION BY groupCol ORDER BY orderCols)`
    * WITHOUT a per-group window: a skewed group (one language owning half
    * a 100 TB corpus) would drag its whole partition through one task
    * under `Window.partitionBy`. Instead: ONE global two-pass rank over
    * `(groupCol, orderCols)` — the concatenated total order — then a tiny
    * per-group (offset, count) aggregate broadcast back, so the in-group
    * rank is `global − offset` arithmetically. The range partitioner
    * splits a hot group across tasks like any other key range; group
    * count is assumed broadcast-small (languages, domains, sources — not
    * doc ids).
    */
  def groupedPercentRank(df: DataFrame, groupCol: String,
      orderCols: Seq[String], outCol: String = "pr",
      numParts: Int = 0): DataFrame = {
    val (ranked, _) =
      rankWithCount(df, groupCol +: orderCols, "_grank", numParts)
    val groups = ranked.groupBy(groupCol).agg(
      min(col("_grank")).as("_goff"), count(lit(1)).as("_gn"))
    val pr = when(col("_gn") === 1L, 0.0) // SQL: single-row group -> 0
      .otherwise(round((col("_grank") - col("_goff")).cast("double") /
        (col("_gn") - 1L), 6))
    ranked.join(broadcast(groups), groupCol)
      .withColumn(outCol, pr)
      .drop("_grank", "_goff", "_gn")
  }

  /** Cross-group QUANTILE NORMALIZATION: map each row's score onto the
    * GLOBAL score distribution at the row's within-group percent rank —
    * `norm = global_sorted[round(pr·(N−1)) + 1]` (1-based, pr the rounded
    * [[groupedPercentRank]]). The curation use: per-domain/per-language
    * quality scorers have incomparable scales; after normalization the
    * p-th best document of EVERY group carries the same score, so one
    * global threshold or budget order treats groups fairly (the same
    * discipline as the q223 fair-budget selection, applied to the score
    * axis instead of the cost axis).
    *
    * Scale shape: one grouped rank (range shuffle), one global rank, one
    * scalar count, one join on the rank position — no Window, no text.
    */
  def quantileNormalize(df: DataFrame, groupCol: String, scoreCol: String,
      idCol: String, outCol: String = "norm_score",
      numParts: Int = 0): DataFrame = {
    require(!df.columns.contains(outCol),
      s"input already has a '$outCol' column; pass a different outCol")
    val pr = groupedPercentRank(df, groupCol, Seq(scoreCol, idCol), "_pr",
      numParts)
    val global = globalRank(
        df.select(col(scoreCol), col(idCol)), Seq(scoreCol, idCol),
        "_gpos", numParts)
      .select(col("_gpos"), col(scoreCol).as(outCol))
    val n = df.agg(count(lit(1)).as("_N"))
    pr.crossJoin(broadcast(n))
      .withColumn("_gpos",
        (round(col("_pr") * (col("_N") - 1)) + 1).cast("long"))
      .join(global, Seq("_gpos"))
      .drop("_pr", "_N", "_gpos")
  }

  /** 1-based in-group `row_number() OVER (PARTITION BY groupCol ORDER BY
    * orderCols)` from ONE global two-pass rank plus broadcast per-group
    * offsets — the window-free form every per-group top-k/sample
    * composition builds on. `orderCols` must totally order rows WITHIN
    * each group.
    */
  def groupedRank(df: DataFrame, groupCol: String, orderCols: Seq[String],
      rankCol: String = "grank", numParts: Int = 0): DataFrame = {
    val (ranked, _) =
      rankWithCount(df, groupCol +: orderCols, "_grank", numParts)
    val groups = ranked.groupBy(groupCol).agg(min(col("_grank")).as("_goff"))
    ranked.join(broadcast(groups), groupCol)
      .withColumn(rankCol, col("_grank") - col("_goff") + 1L)
      .drop("_grank", "_goff")
  }

  /** Exact per-GROUP quantiles (`quantile_cont` semantics) without a
    * per-group window or per-group sort job: the same global-two-pass-rank
    * + broadcast-group-offsets trick as [[groupedPercentRank]], then the
    * interpolation rank positions `p·(n_g−1)` are picked out
    * arithmetically and interpolated. Output: `(groupCol, p, q)` with q
    * rounded to 6. ONE range shuffle total for ANY number of groups and
    * quantiles; a skewed group spreads across tasks like any key range.
    * Ties within a value are rank-order ambiguous but value-identical, so
    * the picked quantiles are deterministic regardless.
    */
  def groupedQuantiles(df: DataFrame, groupCol: String, valueCol: String,
      ps: Seq[Double], numParts: Int = 0): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      s"bad quantiles: $ps")
    val spark = df.sparkSession
    import spark.implicits._
    val (ranked, _) = rankWithCount(
      df.select(col(groupCol), col(valueCol).cast("double").as("_v"))
        .filter(col("_v").isNotNull),
      Seq(groupCol, "_v"), "_grank", numParts)
    val groups = ranked.groupBy(groupCol).agg(
      min(col("_grank")).as("_goff"), count(lit(1)).as("_gn"))
    // per-(group, p) interpolation positions: x = p*(n-1), pick ranks
    // floor(x)/ceil(x) — a tiny broadcast relation (groups × quantiles)
    // "_tg" rename severs the shared lineage with `ranked` (both descend
    // from the same frame — Spark's ambiguous-self-join check fires on
    // same-name join keys otherwise)
    val targets = groups.crossJoin(ps.toDF("p"))
      .select(col(groupCol).as("_tg"), col("p"),
        (col("p") * (col("_gn") - 1L)).as("_x"), col("_goff"))
      .select(col("_tg"), col("p"), col("_x"),
        (floor(col("_x")) + col("_goff")).as("_lo"),
        (ceil(col("_x")) + col("_goff")).as("_hi"))
    ranked.join(broadcast(targets),
        col(groupCol) === col("_tg") &&
          (col("_grank") === col("_lo") || col("_grank") === col("_hi")))
      .groupBy(col("_tg"), col("p"))
      .agg(
        first(col("_x")).as("_xx"),
        min(when(col("_grank") === col("_lo"), col("_v"))).as("_qlo"),
        min(when(col("_grank") === col("_hi"), col("_v"))).as("_qhi"))
      .select(col("_tg").as(groupCol), col("p"),
        round(col("_qlo") +
          (col("_qhi") - col("_qlo")) * (col("_xx") - floor(col("_xx"))), 6)
          .as("q"))
  }

  /** Rank-average ensemble of quality signals: percent_rank each signal
    * independently (ordering by `(signal, idCol)` — the total-order
    * contract), then average the ranks into one `outCol` score. Rank
    * averaging is the scale-robust way to combine signals with unrelated
    * units (a z-score ensemble would let one heavy-tailed signal dominate;
    * ranks are distribution-free). Per-signal pr columns are kept
    * (`pr_<signal>`) so a consumer can weight or ablate them. One range
    * shuffle PER SIGNAL — inherent, each signal is its own total order;
    * nothing else moves, and no single-partition window anywhere.
    */
  def rankEnsemble(df: DataFrame, signalCols: Seq[String], idCol: String,
      outCol: String = "quality_ensemble"): DataFrame = {
    require(signalCols.nonEmpty, "rankEnsemble needs at least one signal")
    val prCols = signalCols.map(s => s"pr_$s")
    (prCols :+ outCol).foreach { c =>
      require(!df.columns.contains(c),
        s"input collides with reserved column $c")
    }
    val withPr = signalCols.zip(prCols).foldLeft(df) { case (acc, (s, pc)) =>
      percentRank(acc, Seq(s, idCol), pc)
    }
    // no rounding on the blend: the inputs are already 6-decimal-rounded
    // doubles, so the sum/divide is bit-identical across engines — while
    // ROUNDING it would sit exactly on decimal half-boundaries (e.g.
    // (0.847695+0.104208)/2 = 0.4759515) where banker's vs half-up
    // rounding diverge
    val avg = prCols.map(col).reduce(_ + _) / prCols.size.toDouble
    withPr.withColumn(outCol, avg)
  }
}
