package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed point-in-interval join — the range-join shape Spark's
  * optimizer has no native strategy for: `p.t BETWEEN i.start AND i.end`
  * alone plans a (broadcast) nested-loop filter, O(|points|·|intervals|)
  * comparisons. Discretizing time into fixed buckets turns it into an
  * EQUI-join: each interval explodes to the buckets it covers, each point
  * maps to its one bucket, and the exact containment predicate filters
  * the bucket-collision pairs. Pair space = points × the intervals
  * sharing their bucket (and equality keys) — bounded by temporal
  * locality, not by table sizes; a (point, interval) pair can meet in at
  * most one bucket (the point's), so no dedup stage is needed.
  *
  * The bucket width is the knob: interval fanout is
  * `len/bucketWidth + 1` rows per interval, collision fanout grows the
  * other way — pick the typical interval length. Equality keys (user,
  * shard) multiply selectivity for free since they ride the same shuffle.
  */
object IntervalJoin {

  /** Inner-join `points` to every interval containing them: half-open
    * `[startCol, endCol)` containment on long-valued domains (epoch
    * micros, token offsets, ordinals), plus exact equality on `eqKeys`.
    * Output: point columns + the interval's columns (caller projects).
    * Intervals with `end <= start` are empty and match nothing.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointCol: String, startCol: String, endCol: String,
      eqKeys: Seq[String], bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val reserved = Seq("_b")
    require(!(points.columns ++ intervals.columns).exists(reserved.contains),
      "input collides with reserved column _b")
    val iv = intervals
      .filter(col(endCol).cast("long") > col(startCol).cast("long"))
      .withColumn("_b", explode(sequence(
        expr(s"cast($startCol as long) div $bucketWidth"),
        expr(s"(cast($endCol as long) - 1) div $bucketWidth"))))
    val pt = points.withColumn("_b",
      expr(s"cast($pointCol as long) div $bucketWidth"))
    pt.join(iv, eqKeys :+ "_b")
      .filter(col(pointCol).cast("long") >= col(startCol).cast("long") &&
        col(pointCol).cast("long") < col(endCol).cast("long"))
      .drop("_b")
  }
}
