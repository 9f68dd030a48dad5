package graft.streaming

import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.DataFrame

import graft.operators.Ann

/** Streaming ANN probe — the serving face of the IVF index: a STREAMING
  * query relation probes a frozen (index, centroids) pair micro-batch by
  * micro-batch, each batch running the exact batch search (zero-shuffle
  * probe selection over the broadcast centroids + cell-equi candidate
  * join + bounded per-query heaps) and appending its top-k.
  *
  * Queries are independent rows and the index is static, so the union
  * over ANY batching equals the whole-batch search exactly —
  * [[StreamAnnSpec]] pins the equality through a real multi-batch file
  * stream; q202 oracles the result against the from-first-principles
  * IVF replay (the q50 oracle) run through this path.
  *
  * Scale shape: per-batch cost is the batch search's (probe lists are
  * map-side; the candidate join touches only probed cells — partition
  * pruning territory when the index is written `partitionBy(cell)`);
  * no streaming state at all — the index IS the state, updated by
  * re-indexing offline, which is how IVF deployments roll.
  */
object StreamAnn {

  /** Drain a streaming query relation against the static index, writing
    * each micro-batch's `(query_id, neighbor_id, rank, dist)` to
    * `outPath/batch=<batchId>` as parquet (Trigger.AvailableNow: process
    * what's there, then stop — a continuous deployment starts the same
    * foreachBatch with its own trigger).
    *
    * RETRY SAFETY: foreachBatch is at-least-once — a mid-run failure
    * replays the last batch id. Each batch therefore OVERWRITES its own
    * deterministic `batch=<id>` subpath (idempotent per id, batch
    * contents are deterministic under AvailableNow), so a retry replaces
    * rather than duplicates, keeping the exact-union contract. Readers
    * see one extra `batch` partition-discovery column.
    *
    * CROSS-RUN SAFETY: the checkpoint lives under `outPath/_checkpoint`
    * (the `_` prefix hides it from parquet partition discovery, like
    * `_spark_metadata`), so a SECOND invocation over the same outPath is
    * a true RESUME — same source offsets, same batch numbering, only
    * unprocessed input drains. Without this, a rerun renumbered batches
    * from 0 with potentially different batching, and stale `batch=N`
    * dirs from the first run survived as duplicates. A non-empty outPath
    * WITHOUT a checkpoint (foreign or pre-contract output) fails loudly
    * instead of silently double-writing.
    */
  private def checkpointFor(spark: org.apache.spark.sql.SparkSession,
      outPath: String): String = {
    val conf = spark.sessionState.newHadoopConf()
    val out = new org.apache.hadoop.fs.Path(outPath)
    val fs = out.getFileSystem(conf)
    val ckpt = new org.apache.hadoop.fs.Path(out, "_checkpoint")
    if (fs.exists(out) && !fs.exists(ckpt) &&
        fs.listStatus(out).exists(_.getPath.getName.startsWith("batch=")))
      throw new IllegalStateException(
        s"$outPath contains batch output but no _checkpoint: a rerun would " +
          "renumber batches and duplicate rows. Point at a fresh outPath or " +
          "restore the original checkpoint.")
    ckpt.toString
  }

  /** Streaming INGEST into a maintained IVF index: each micro-batch of
    * arriving vectors is assigned against the FROZEN quantizer
    * ([[Ann.ivfIndexWithMeta]] — zero-shuffle map-side argmin, metadata
    * riding along) and written to `outPath/batch=<batchId>`. The persisted
    * union IS the maintained index ([[Ann.ivfAppend]]'s contract batch by
    * batch): cell assignment is per-vector, so any batching unions to the
    * from-scratch build — q238 pins that through a delete and a search.
    *
    * Same retry discipline as [[ivfSearchToPath]]: deterministic per-batch
    * subpaths overwritten idempotently. Tombstoning stays a batch-side
    * anti-join ([[Ann.ivfDelete]]) over the read-back index; quantizer
    * refresh is the offline retrain the q236 staleness card schedules.
    */
  def ivfAppendToPath(vecStream: DataFrame, centroids: DataFrame,
      outPath: String, metric: String = "COSINE", idCol: String = "vec_id",
      vecCol: String = "embedding", metaCols: Seq[String] = Nil): Unit = {
    val q = vecStream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Ann.ivfIndexWithMeta(batch, centroids, metric, idCol, vecCol, metaCols)
          .write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointFor(vecStream.sparkSession, outPath))
      .start()
    q.awaitTermination()
  }

  def ivfSearchToPath(queryStream: DataFrame, index: DataFrame,
      centroids: DataFrame, k: Int, nProbe: Int, outPath: String,
      metric: String = "COSINE", idCol: String = "vec_id",
      vecCol: String = "embedding", excludeSelf: Boolean = false): Unit = {
    val q = queryStream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Ann.ivfSearch(batch, index, centroids, k, nProbe, metric,
            idCol, vecCol, excludeSelf)
          .write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointFor(queryStream.sparkSession, outPath))
      .start()
    q.awaitTermination()
  }
}
