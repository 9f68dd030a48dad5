package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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
  * corpus through ONE partition; instead this range-repartitions on the id,
  * cumsums within each partition, and adds per-partition offsets computed
  * from the (numPartitions)-row totals frame — one range shuffle, one tiny
  * broadcast join, everything else is a projection. Determinism does not
  * depend on partition boundaries: any range partitioning yields the same
  * global prefix sum.
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
      .withColumn("_pid", spark_partition_id())
    // within-partition INCLUSIVE cumsum; minus n_tokens = exclusive
    val local = base.withColumn("_local",
      sum(col("n_tokens")).over(
        Window.partitionBy("_pid").orderBy(idCol)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        - col("n_tokens"))
    // per-partition totals -> exclusive offsets: a (numParts)-row frame, so
    // the single-partition window and the broadcast are both O(numParts)
    val offsets = local.groupBy("_pid")
      .agg(sum("n_tokens").as("_total"))
      .withColumn("_offset",
        coalesce(sum(col("_total")).over(
          Window.orderBy("_pid")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("_pid", "_offset")
    // `div`, not `/`: Spark's `/` is double division, inexact past 2^53
    // total tokens — integer division keeps coordinates exact at any scale
    val l = lit(seqLen.toLong)
    local.join(broadcast(offsets), Seq("_pid"))
      .withColumn("tok_start", col("_offset") + col("_local"))
      .select(col(idCol), col("n_tokens"), col("tok_start"),
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
}
