package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger

import graft.operators.Hnsw

/** Streaming INGEST into a maintained HNSW bundle — the graph-index twin
  * of [[StreamAnn.ivfAppendToPath]]: each micro-batch of arriving vectors
  * routes through the bundle's FROZEN quantizer and rebuilds only the
  * affected cells' graphs in place ([[Hnsw.appendToBundle]] — dynamic
  * partition overwrite, untouched `cell=` dirs never move).
  *
  * Exactly-once EFFECT from at-least-once foreachBatch: a replayed batch
  * re-appends rows the bundle already holds, and `appendToBundle`
  * deduplicates by id before rebuilding — the rebuilt graphs are
  * bit-identical to the first delivery (ascending-id insertion is
  * arrival-order-free), so retries are no-ops rather than corruption.
  *
  * The checkpoint lives under `bundlePath/_ingest_checkpoint` (the `_`
  * prefix hides it from parquet partition discovery), so a SECOND
  * invocation over the same bundle is a true RESUME: same source
  * offsets, only unprocessed vectors ingest — StreamHnswSpec drains a
  * growing source twice over one bundle and pins the final graphs equal
  * to the from-scratch build over everything.
  */
object StreamHnsw {

  def appendToBundle(vecStream: DataFrame, bundlePath: String, m: Int = 8,
      efConstruction: Int = 32, metric: String = "COSINE",
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val q = vecStream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Hnsw.appendToBundle(batch, bundlePath, m, efConstruction, metric,
          idCol, vecCol)
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$bundlePath/_ingest_checkpoint")
      .start()
    q.awaitTermination()
  }
}
