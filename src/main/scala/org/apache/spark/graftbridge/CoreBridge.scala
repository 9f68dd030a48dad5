package org.apache.spark.graftbridge

/** Core-side access bridge (the sql-side twin is
  * org.apache.spark.sql.graftbridge.Bridge): `SparkContext.unpersistRDD`
  * is `private[spark]`, so dropping a dead RDD's blocks without going
  * through `RDD.unpersist` must be re-exported from inside the
  * `org.apache.spark` namespace.
  */
object CoreBridge {

  /** Drop a SUPERSEDED RDD's storage blocks. `RDD.unpersist` on a
    * locally-checkpointed RDD logs a "cannot be recomputed after
    * unpersisting" warning on every call — correct as a caution for live
    * data, noise for Materialize.free, whose contract is exactly that the
    * frame is dead and will never be read again (the iterative loops free
    * each round's state once the next round is materialized and the
    * convergence witness has read it). Same effect as `RDD.unpersist`
    * (block removal) minus the log line; the RDD object keeps its nominal
    * storage level — a second free of the same frame just re-sends the
    * idempotent removal message, and dead frames are never recomputed.
    */
  def unpersistQuietly(rdd: org.apache.spark.rdd.RDD[_]): Unit =
    rdd.sparkContext.unpersistRDD(rdd.id, blocking = false)
}
