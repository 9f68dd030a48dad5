package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared materialization policy for the iterative operators (PageRank,
  * LabelProp, KCore, connectedComponents). Every round MUST materialize
  * its state frame: the state is referenced at least twice by the next
  * round (contribution join + dangling/fixpoint pass), so an
  * unmaterialized chain re-executes its whole prefix ~2^rounds times —
  * measured in PageRank.scala (q295: 5.1 s → 30.6 s when relaxed).
  *
  * Two backends:
  *  - `localCheckpoint` (the default, `checkpointDir = None`): truncates
  *    lineage into executor-memory blocks — zero external storage, right
  *    for local mode and short jobs, but NOT fault-tolerant: the blocks
  *    live only on executors, so an executor loss kills the job;
  *  - `checkpoint` into `checkpointDir` (reliable storage — HDFS/object
  *    store): the production setting for long iterative jobs on real
  *    clusters; survives executor loss at the cost of one write+read of
  *    the (id, double) state per round — 16 bytes/node, far under any
  *    shuffle budget.
  *
  * `policy` prepares the SparkContext ONCE per operator call
  * (`setCheckpointDir` creates a fresh UUID subdirectory every time it
  * is invoked, so calling it per round would litter the store) and
  * returns the per-round materializer.
  */
private[graft] object Materialize {

  /** Inherited-statistic ceiling per materialized frame: 1 TiB — far above
    * every broadcast threshold (so a frame the planner would broadcast
    * keeps its exact, honest estimate) while bounding the size-only
    * estimator's cross-round growth. Without the cap, checkpoint bakes
    * the origin plan's JOIN-MULTIPLIED sizeInBytes into each round's
    * leaf, so a state frame referenced k>=2 times per round grows its
    * stat's digit count geometrically — by round ~25 the driver burns
    * minutes multiplying million-digit BigIntegers inside
    * `rewriteStatsAndConstraints` (see Bridge.capStats).
    */
  private val StatCapBytes = 1L << 40

  /** The per-round materializer for the given backend. */
  def policy(spark: SparkSession,
      checkpointDir: Option[String]): DataFrame => DataFrame =
    checkpointDir match {
      case None =>
        df => org.apache.spark.sql.graftbridge.Bridge.capStats(
          df.localCheckpoint(true), StatCapBytes)
      case Some(dir) =>
        spark.sparkContext.setCheckpointDir(dir)
        df => org.apache.spark.sql.graftbridge.Bridge.capStats(
          df.checkpoint(true), StatCapBytes)
    }

  /** Release the executor-storage blocks of a SUPERSEDED materialized
    * frame. A `localCheckpoint` persists its RDD blocks on executors and
    * nothing frees them until the driver's ContextCleaner happens to GC
    * the dropped reference — at maxIters=50 an iterative loop holds up to
    * 50× its steady-state footprint in dead rank frames. The checkpointed
    * RDD is the `LogicalRDD` leaf of the returned frame; unpersist it
    * (non-blocking) as soon as the next round's frame is eagerly
    * materialized and the delta/convergence aggregate has read the old
    * one. Reliable `checkpoint(dir)` frames live in external storage, not
    * executor memory (the cleaner GCs the files) — no-op for them, and for
    * any frame that is not a materialized leaf.
    */
  def free(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectLeaves().foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD
          if l.rdd.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE =>
        l.rdd.unpersist(blocking = false)
      case _ =>
    }
}
