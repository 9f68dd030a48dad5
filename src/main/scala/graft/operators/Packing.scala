package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-sequence packing: concatenate documents in ascending-id order
  * and cut the token stream into fixed-length sequences of `seqLen` tokens —
  * the standard LLM pretraining layout (documents back-to-back, a document
  * may straddle a sequence boundary). Extends the reference's windowed/sized
  * read surface (SURVEY §2.2 window slices operate on vector ordinals) with
  * the token-coordinate form a dataloader needs.
  *
  * Scale shape: the only global state is an EXCLUSIVE PREFIX SUM of token
  * counts in id order. A naive `Window.orderBy(id)` cumsum drags the whole
  * corpus through ONE partition — and even the partitioned form
  * (`Window.partitionBy(spark_partition_id())`) re-shuffles the corpus a
  * second time, because Catalyst cannot know `_pid` is constant within a
  * partition and inserts `hashpartitioning(_pid)` to satisfy the window.
  * So this uses the canonical two-pass pattern (the one Spark's own
  * `zipWithIndex` uses): range-repartition on the id, a first pass
  * collecting one running total PER PARTITION (numPartitions longs — the
  * same O(10k) driver state any range partitioner already holds), then a
  * mapPartitions pass adding the broadcast partition offset to a running
  * local sum. ONE corpus shuffle total; both passes read the same range
  * exchange (shared RDD lineage → the shuffle files are reused, the second
  * pass skips the stage). Determinism does not depend on partition
  * boundaries: any range partitioning yields the same global prefix sum.
  *
  * Zero-token documents are excluded (they occupy no coordinates); ids and
  * token counts must be non-null, counts non-negative.
  */
object Packing {

  /** Per-document packing coordinates: global `tok_start` (exclusive prefix
    * sum in id order), the first/last sequence the document touches and its
    * offset within the first sequence. Output columns: `<idCol>, n_tokens,
    * tok_start, seq_first, seq_last, seq_offset` (all longs except the id,
    * which keeps its type).
    *
    * INPUT PINNING: the per-partition totals job runs eagerly at call time
    * and freezes the partition offsets in a broadcast; the second pass
    * re-reads the SAME range-shuffle files (shared RDD lineage), so both
    * passes observe one materialization under normal execution. The input
    * must still be DETERMINISTIC across recomputation: if shuffle files are
    * lost (executor death) the map stage re-runs from the source, and a
    * non-deterministic source (fresh `rand()`, a mutated table) would then
    * disagree with the frozen offsets, silently corrupting `tok_start`.
    * Callers packing from volatile inputs should `cache()`/`localCheckpoint`
    * the input first.
    */
  def packCoordinates(df: DataFrame, idCol: String, tokensCol: String,
      seqLen: Int, numParts: Int = 0): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val spark = df.sparkSession
    val parts = if (numParts > 0) numParts
      else spark.sessionState.conf.numShufflePartitions
    val base = df
      .select(col(idCol), col(tokensCol).cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .repartitionByRange(parts, col(idCol))
      .sortWithinPartitions(idCol)
    val schema = base.schema
    val nIdx = schema.fieldIndex("n_tokens")
    // one InternalRow lineage shared by both jobs: the range exchange
    // computes once, and (unlike `.rdd`) no external-Row boxing boundary —
    // the coords output stays a codegen-capable ExistingRDD scan
    val rows = base.queryExecution.toRdd
    val totals = rows.mapPartitionsWithIndex { case (pid, it) =>
      var s = 0L
      it.foreach(r => s += r.getLong(nIdx))
      Iterator(pid -> s)
    }.collect().toMap
    val offsets = (0 until rows.getNumPartitions)
      .map(p => totals.getOrElse(p, 0L)).scanLeft(0L)(_ + _).toArray
    val bc = spark.sparkContext.broadcast(offsets)
    val withStart = rows.mapPartitionsWithIndex { case (pid, it) =>
      var run = bc.value(pid)
      val extra = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
      val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow
      it.map { r =>
        val start = run
        run += r.getLong(nIdx)
        extra.update(0, start)
        joined(r, extra): org.apache.spark.sql.catalyst.InternalRow
      }
    }
    val coords = org.apache.spark.sql.graftbridge.Bridge.internalCreateDataFrame(
      spark, withStart,
      org.apache.spark.sql.types.StructType(schema.fields :+
        org.apache.spark.sql.types.StructField("tok_start",
          org.apache.spark.sql.types.LongType, nullable = false)))
    // `div`, not `/`: Spark's `/` is double division, inexact past 2^53
    // total tokens — integer division keeps coordinates exact at any scale
    val l = lit(seqLen.toLong)
    coords.select(col(idCol), col("n_tokens"), col("tok_start"),
      expr(s"tok_start div ${seqLen}L").as("seq_first"),
      expr(s"(tok_start + n_tokens - 1) div ${seqLen}L").as("seq_last"),
      pmod(col("tok_start"), l).as("seq_offset"))
  }

  /** [[packCoordinates]] with an independent token stream PER GROUP (the
    * multilingual shape: each language packs into its own sequence ids,
    * so a per-language dataloader shard never splices streams). Built on
    * [[Ranking.groupedExclusivePrefixSum]]: one range shuffle on
    * (group, id), O(partitions) driver state regardless of group count,
    * no Window. Output adds `groupCol`; `seq_first`/`seq_last`/
    * `seq_offset` are group-local.
    */
  def packCoordinatesPerGroup(df: DataFrame, groupCol: String, idCol: String,
      tokensCol: String, seqLen: Int, numParts: Int = 0): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val base = df
      .select(col(groupCol), col(idCol), col(tokensCol).cast("long").as("n_tokens"))
      .filter(col(groupCol).isNotNull && col("n_tokens") > 0)
    val l = lit(seqLen.toLong)
    Ranking.groupedExclusivePrefixSum(base, groupCol, Seq(idCol),
        "n_tokens", "tok_start", numParts)
      .select(col(groupCol), col(idCol), col("n_tokens"), col("tok_start"),
        expr(s"tok_start div ${seqLen}L").as("seq_first"),
        expr(s"(tok_start + n_tokens - 1) div ${seqLen}L").as("seq_last"),
        pmod(col("tok_start"), l).as("seq_offset"))
  }

  /** Exploded dataloader manifest: one row per (sequence, document slice) —
    * for sequence `seq_id`, take document tokens `[doc_tok_start,
    * doc_tok_end)` and place them at `seq_offset` within the sequence.
    * Reconstructing every sequence = concatenating its slices in
    * `seq_offset` order; slices tile each sequence exactly (PackingSpec
    * proves both invariants). Pure per-row explode over the coordinates —
    * no additional shuffle.
    */
  def packManifest(df: DataFrame, idCol: String, tokensCol: String,
      seqLen: Int, numParts: Int = 0): DataFrame = {
    val l = lit(seqLen.toLong)
    packCoordinates(df, idCol, tokensCol, seqLen, numParts)
      .withColumn("seq_id", explode(sequence(col("seq_first"), col("seq_last"))))
      .select(col(idCol), col("seq_id"),
        greatest(lit(0L), col("seq_id") * l - col("tok_start")).as("doc_tok_start"),
        least(col("n_tokens"), (col("seq_id") + 1) * l - col("tok_start")).as("doc_tok_end"),
        greatest(lit(0L), col("tok_start") - col("seq_id") * l).as("seq_offset"))
  }

  /** Materialized training sequences from raw text: whitespace-tokenize,
    * pack, then assemble each sequence's actual token content by joining
    * the token arrays to the per-document coordinates and concatenating
    * slices in offset order. Output: `(seq_id, n_tokens, seq_md5)` where
    * `seq_md5` hashes the space-joined sequence text — the loader-contract
    * form a downstream trainer can verify shard-by-shard without shipping
    * text through the comparison.
    *
    * Scale shape: the token arrays join the COORDINATES (one row per doc),
    * not the exploded manifest — joining the manifest would ship a
    * straddling document's full `_toks` array once per touched sequence
    * (amplification up to len/seqLen + 1, ~2× the corpus for 2·seqLen
    * docs). Here each array crosses the one id-keyed join exactly once and
    * every per-sequence slice is cut inside a single per-doc
    * transform+explode projection, so downstream rows carry only their own
    * slice content. Sequence assembly is then a groupBy(seq_id) whose
    * per-group state is the ≤seqLen tokens of ONE sequence;
    * `collect_list` of (offset, slice) structs is order-normalized with
    * `array_sort`, so the result is partition-order independent.
    */
  def materializeSequences(docs: DataFrame, idCol: String, textCol: String,
      seqLen: Int, numParts: Int = 0): DataFrame =
    materializeTokenSequences(
      docs.select(col(idCol),
        graft.functions.TextFunctions.tokens(col(textCol)).as("_toks")),
      idCol, "_toks", seqLen, numParts)

  /** Length-ordered token-budget BATCHING — the padding-minimizing batch
    * assignment a trainer's dataloader wants: sort documents by token
    * count (ties on id), run the same exclusive prefix sum, and assign
    * each document WHOLE to batch `tok_start div budget`. Documents are
    * atomic (unlike sequence packing, nothing straddles), so a batch's
    * token total is bounded by `budget + (max doc length in the batch) − 1`
    * — the standard distributed approximation of greedy sequential fill,
    * whose exact form is inherently serial (each boundary depends on the
    * running remainder). Because neighbors in the length order have
    * near-equal lengths, per-batch padding (max_len − mean_len) stays
    * small — the point of length bucketing.
    *
    * Output: (idCol, n_tokens, batch_id) plus nothing else — feed it to a
    * groupBy(batch_id) for batch manifests. Scale shape = packCoordinates'
    * (ONE range shuffle on the (n_tokens, id) sort key, two passes over
    * shared exchange lineage).
    */
  def lengthBatches(df: DataFrame, idCol: String, tokensCol: String,
      budget: Int, numParts: Int = 0): DataFrame = {
    require(budget > 0, "token budget must be positive")
    // surrogate range key: length-major, id-minor — the documented batch
    // order. 2^31 bounds doc ids of the sf tables and any test corpus;
    // callers with wider ids should pre-compose their own sort key.
    val idOk = col(idCol).cast("long").between(0L, (1L << 31) - 1)
    val keyed = df.select(col(idCol),
      col(tokensCol).cast("long").as("_n"),
      (col(tokensCol).cast("long") * (1L << 31) +
        when(idOk, col(idCol).cast("long"))
          .otherwise(raise_error(concat(lit("lengthBatches: id outside [0, 2^31): "),
            col(idCol).cast("string")))))
        .as("_lenkey"))
    packCoordinates(keyed, "_lenkey", "_n", seqLen = budget, numParts)
      // id recovers arithmetically from the surrogate key — no join back
      .select(pmod(col("_lenkey"), lit(1L << 31)).as(idCol), col("n_tokens"),
        expr(s"tok_start div ${budget}L").as("batch_id"))
  }

  /** Packing efficiency report — the shard-sizing summary a training job
    * reads before committing to a seqLen: one row of
    * `(seq_len, n_sequences, total_tokens, fill_rate, pad_tokens,
    * n_split_docs, n_docs)` where `fill_rate` = tokens over sequence
    * capacity (the tail sequence carries the only padding under the
    * greedy-concat layout) and `n_split_docs` counts documents straddling
    * a sequence boundary (the cross-attention-contamination signal).
    * Cost: the packCoordinates pass plus ONE aggregate over per-doc
    * coordinate rows — no token materialization.
    */
  def packReport(df: DataFrame, idCol: String, tokensCol: String,
      seqLen: Int, numParts: Int = 0): DataFrame = {
    val l = seqLen.toLong
    packCoordinates(df, idCol, tokensCol, seqLen, numParts)
      .agg(
        coalesce(sum(col("n_tokens")), lit(0L)).as("_tot"),
        sum(when(col("seq_last") > col("seq_first"), 1L).otherwise(0L))
          .as("n_split_docs"),
        count(lit(1)).as("n_docs"))
      .select(
        lit(l).as("seq_len"),
        expr(s"(_tot + ${l - 1}) div ${l}L").as("n_sequences"),
        col("_tot").as("total_tokens"),
        // 0-token corpus ⇒ n_sequences = 0; Divide's null must not leak
        // into the one-row report — a defined 0.0 keeps it total
        round(when(col("_tot") === 0L, 0.0)
          .otherwise(col("_tot").cast("double") /
            (expr(s"(_tot + ${l - 1}) div ${l}L") * l)), 6).as("fill_rate"),
        (expr(s"(_tot + ${l - 1}) div ${l}L") * l - col("_tot")).as("pad_tokens"),
        coalesce(col("n_split_docs"), lit(0L)).as("n_split_docs"),
        col("n_docs"))
  }

  /** Per-sequence document-boundary metadata — what a trainer needs to
    * reset position ids and block cross-document attention inside packed
    * sequences: for each sequence, the ascending list of offsets where a
    * new document slice begins (offset 0 is a boundary iff a doc starts
    * there; a straddling doc's continuation also lands at 0, which is why
    * `n_slices` can exceed the boundary count's gaps). Emitted as a
    * space-joined string so the loader contract is engine-neutral. One
    * groupBy over the manifest rows, whose per-group state is ≤
    * seqLen/1 + 1 offsets.
    */
  def sequenceBoundaries(df: DataFrame, idCol: String, tokensCol: String,
      seqLen: Int, numParts: Int = 0): DataFrame =
    packManifest(df, idCol, tokensCol, seqLen, numParts)
      .groupBy("seq_id").agg(
        count(lit(1)).as("n_slices"),
        expr("array_join(transform(array_sort(collect_list(seq_offset)), " +
          "x -> cast(x as string)), ' ')").as("boundaries"))

  /** `materializeSequences` over a PRE-TOKENIZED corpus: `toksCol` is any
    * `array<string>` token column (whitespace words, BPE pieces, token ids
    * rendered as strings — the packer is tokenizer-agnostic). This is the
    * entry point a tokenize→pack pipeline composes with `Bpe.encode`.
    * Same output and scale shape as `materializeSequences` (which now
    * delegates here after whitespace-tokenizing).
    */
  def materializeTokenSequences(pretok: DataFrame, idCol: String,
      toksCol: String, seqLen: Int, numParts: Int = 0): DataFrame = {
    val toks = pretok.select(col(idCol), col(toksCol).as("_toks"))
    val counts = toks.select(col(idCol), size(col("_toks")).cast("long").as("_n"))
    val coords = packCoordinates(counts, idCol, "_n", seqLen, numParts)
    val l = lit(seqLen.toLong)
    // per-sequence slice bounds within the doc, same arithmetic as
    // packManifest's rows — computed per doc inside one lambda so the
    // array is referenced, never duplicated per manifest row
    val slices = coords.join(toks, Seq(idCol))
      .select(explode(transform(
        sequence(col("seq_first"), col("seq_last")),
        q => {
          val sliceStart = greatest(lit(0L), q * l - col("tok_start"))
          val sliceEnd = least(col("n_tokens"), (q + 1) * l - col("tok_start"))
          struct(
            q.as("seq_id"),
            greatest(lit(0L), col("tok_start") - q * l).as("seq_offset"),
            (sliceEnd - sliceStart).as("_k"),
            concat_ws(" ", slice(col("_toks"),
              (sliceStart + 1).cast("int"),
              (sliceEnd - sliceStart).cast("int"))).as("_slice"))
        })).as("s"))
      .select(col("s.seq_id").as("seq_id"), col("s.seq_offset").as("seq_offset"),
        col("s._k").as("_k"), col("s._slice").as("_slice"))
    slices
      .groupBy("seq_id")
      .agg(sum(col("_k")).as("n_tokens"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("seq_offset"), col("_slice")))),
          s => s.getField("_slice")), " ")).as("seq_md5"))
  }

  /** NO-TRUNCATION bin packing (next-fit decreasing): documents that must
    * stay WHOLE (code files, dialogues, anything where a straddled
    * boundary poisons training) are placed into `seqLen`-capacity bins —
    * within each group, docs walk in (length desc, id) order and a doc
    * that doesn't fit the current bin's remainder OPENS a new bin. This is
    * the complement of [[packCoordinates]] (which fills 100% by splitting);
    * the price of wholeness is padding, and [[binPackReport]] quantifies
    * it against the LP lower bound.
    *
    * The walk is inherently sequential, so the packing DOMAIN is the
    * group: one bounded walk per group, run inside `flatMapGroups` —
    * exactly the shard-local discipline a dataloader uses anyway (group =
    * shard, e.g. [[graft.layout.Sharding.rendezvousAssign]]'s output, or
    * language). State per task = the group's (id, len) pairs, never the
    * corpus. Docs longer than `seqLen` fail loudly (they cannot be packed
    * whole); zero/negative lengths are excluded like every packer here.
    *
    * Output: (groupCol, idCol, n_tokens, bin, bin_offset) — bin is
    * group-local, 0-based; offsets are the in-bin token coordinates.
    */
  def nextFitDecreasing(df: DataFrame, groupCol: String, idCol: String,
      tokensCol: String, seqLen: Long): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(groupCol).cast("string").as("g"),
        col(idCol).cast("long").as("id"),
        col(tokensCol).cast("long").as("n"))
      .filter(col("n") > 0)
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (g, it) =>
        val rows = it.map { case (_, id, n) => (id, n) }.toArray
        rows.foreach { case (id, n) =>
          require(n <= seqLen,
            s"nextFitDecreasing: doc $id has $n tokens > seqLen $seqLen " +
              "(cannot be packed whole — split it or raise seqLen)")
        }
        scala.util.Sorting.stableSort(rows,
          (a: (Long, Long), b: (Long, Long)) =>
            a._2 > b._2 || (a._2 == b._2 && a._1 < b._1))
        var bin = 0L
        var used = 0L
        rows.iterator.map { case (id, n) =>
          if (used + n > seqLen) { bin += 1; used = 0L }
          val off = used
          used += n
          (g, id, n, bin, off)
        }
      }
      .toDF(groupCol, idCol, "n_tokens", "bin", "bin_offset")
  }

  /** Efficiency card for [[nextFitDecreasing]]: per group — bins used, the
    * LP lower bound ceil(Σtokens/seqLen) (no packer can beat it), fill
    * rate, and the padding fraction wholeness cost. One aggregate over the
    * packing output.
    */
  def binPackReport(packed: DataFrame, groupCol: String,
      seqLen: Long): DataFrame =
    packed.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        (max("bin") + 1).as("n_bins"),
        sum("n_tokens").as("n_tokens"))
      .select(col(groupCol), col("n_docs"), col("n_bins"), col("n_tokens"),
        ceil(col("n_tokens").cast("double") / seqLen).cast("long")
          .as("lp_bound"),
        round(col("n_tokens").cast("double") / (col("n_bins") * seqLen), 6)
          .as("fill_rate"),
        round(lit(1.0) -
          col("n_tokens").cast("double") / (col("n_bins") * seqLen), 6)
          .as("padding_frac"))
}
