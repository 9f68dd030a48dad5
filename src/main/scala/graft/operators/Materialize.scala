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

  /** The per-round materializer for the given backend. */
  def policy(spark: SparkSession,
      checkpointDir: Option[String]): DataFrame => DataFrame =
    checkpointDir match {
      case None => _.localCheckpoint(true)
      case Some(dir) =>
        spark.sparkContext.setCheckpointDir(dir)
        _.checkpoint(true)
    }
}
