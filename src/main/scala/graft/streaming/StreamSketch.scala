package graft.streaming

import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.DataFrame

import graft.functions.HashMode
import graft.operators.{Bloom, Cms}

/** Progressive-ingest sketch builds — the streaming face of the CMS and
  * Bloom BUILD step (their probes have been stream-composable since round
  * 8; the build was batch-only). Both sketches are order-free monoids —
  * counter grids merge by addition, bit arrays by OR — so a
  * `foreachBatch` that folds each micro-batch's sketch into an
  * accumulator yields EXACTLY the batch-built sketch regardless of batch
  * boundaries, arrival order, or batch count. [[StreamSketchSpec]] pins
  * the equality array-for-array; q193 oracles a threshold query through
  * the streaming build path.
  *
  * Scale shape: each micro-batch pays one treeAggregate over ITS rows
  * (no shuffle, task state = the sketch); the merge is a driver-side
  * array add/OR of the size the operator picked. State never grows with
  * corpus size — the defining property that makes sketch builds the
  * progressive-ingest form of decontamination (Bloom) and frequency
  * tracking (CMS).
  */
object StreamSketch {

  /** Mutable CMS accumulator: fold per-batch grids in with [[add]]; read
    * the merged grid at any point. Addition commutes and associates in
    * Long, so partial reads are themselves valid sketches of the data
    * ingested so far.
    */
  final class CmsAccumulator(val depth: Int, val width: Int,
      val mode: HashMode = HashMode.Md5) {
    val grid = new Array[Long](depth * width)
    def add(batch: DataFrame, termCol: String): Unit = {
      val g = Cms.build(batch, termCol, depth, width, mode)
      synchronized {
        var i = 0
        while (i < grid.length) { grid(i) += g(i); i += 1 }
      }
    }
  }

  /** Mutable Bloom accumulator: per-batch bit arrays OR in. */
  final class BloomAccumulator(val mBits: Int, val n: Int, val kProbes: Int,
      val mode: HashMode = HashMode.Md5) {
    val bits = new Array[Long](mBits / 64)
    def add(batch: DataFrame, textCol: String): Unit = {
      val b = Bloom.build(batch, textCol, n, mBits, kProbes, mode)
      synchronized {
        var i = 0
        while (i < bits.length) { bits(i) |= b(i); i += 1 }
      }
    }
  }

  /** Drain a STREAMING term relation into a merged CMS grid
    * (Trigger.AvailableNow: process everything currently available, then
    * stop — the batch-parity ingest used by q193; a continuous deployment
    * starts the same foreachBatch with its own trigger and reads
    * `acc.grid` whenever it needs the current sketch).
    */
  def cmsFromStream(terms: DataFrame, termCol: String, depth: Int, width: Int,
      mode: HashMode = HashMode.Md5): Array[Long] = {
    val acc = new CmsAccumulator(depth, width, mode)
    val q = terms.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) => acc.add(batch, termCol) }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-cms-stream").toString)
      .start()
    q.awaitTermination()
    acc.grid
  }

  /** Drain a STREAMING document relation into a merged Bloom filter. */
  def bloomFromStream(bench: DataFrame, textCol: String, n: Int = 3,
      mBits: Int = 1 << 20, kProbes: Int = 4,
      mode: HashMode = HashMode.Md5): Array[Long] = {
    val acc = new BloomAccumulator(mBits, n, kProbes, mode)
    val q = bench.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) => acc.add(batch, textCol) }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-bloom-stream").toString)
      .start()
    q.awaitTermination()
    acc.bits
  }

  /** Drain a STREAMING term relation into a merged Misra-Gries summary.
    * The summary is NOT an exact monoid — counter values depend on merge
    * order — but the mergeable-summaries rule preserves the n/(k+1)
    * superset guarantee and the exact total under ANY batching, so the
    * guaranteed-heavy OUTPUT (phase 2,
    * [[graft.operators.Freq.guaranteedHeavyFrom]]) is identical to the
    * batch build's. [[StreamSketchSpec]] pins output equality; q218
    * oracles the guaranteed set built through this path.
    */
  def mgFromStream(terms: DataFrame, termCol: String,
      k: Int): graft.operators.Freq.MgAcc = {
    val acc = new graft.operators.Freq.MgAcc(k)
    val lock = new Object
    val q = terms.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val b = graft.operators.Freq.mgSummary(batch, termCol, k)
        lock.synchronized { acc.merge(b); () }
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-mg-stream").toString)
      .start()
    q.awaitTermination()
    acc
  }

  /** Bounded weighted RESERVOIR accumulator (Efraimidis–Spirakis): keeps
    * the global top-`n` rows by the deterministic ES key
    * `ln((md5_60(key:salt)+1)/2⁶⁰) / weight` — the same key
    * [[graft.operators.Sampling.weightedSample]] orders by, recomputed
    * identically on the driver, so streaming == batch EXACTLY (the key is
    * a pure per-row function; top-n of per-batch top-ns is the global
    * top-n). Merge is idempotent under redelivery (a retried batch's
    * duplicate candidates dedupe before the cut), bounded at n rows of
    * driver state regardless of stream length.
    */
  final class ReservoirAcc(n: Int, salt: String) {
    require(n > 0, s"reservoir size must be positive, got $n")
    private var buf = Vector.empty[(Long, Long)] // (key, weight)
    private def es(key: Long, w: Long): Double =
      math.log((graft.functions.StableHash.md5Hash60(s"$key:$salt") + 1)
        .toDouble / math.pow(2, 60)) / w
    def merge(cand: Seq[(Long, Long)]): Unit = {
      buf = (buf ++ cand).distinct
        .sortBy { case (k, w) => (-es(k, w), k) }
        .take(n)
    }
    /** (key, weight, es_key) in sample order. */
    def result: Seq[(Long, Long, Double)] =
      buf.map { case (k, w) => (k, w, es(k, w)) }
  }

  /** Drain a STREAMING (key, weight) relation into a weighted sample
    * without replacement of size `n` — each micro-batch contributes its
    * own [[graft.operators.Sampling.weightedSample]] top-n, the
    * accumulator keeps the global cut. Zero-weight rows drop (the batch
    * operator's documented rule).
    */
  def weightedReservoirFromStream(rows: DataFrame, keyCol: String,
      weightCol: String, n: Int, salt: String = "wsample"): Seq[(Long, Long, Double)] = {
    val acc = new ReservoirAcc(n, salt)
    val lock = new Object
    val q = rows.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        import org.apache.spark.sql.functions.col
        val spark = batch.sparkSession
        import spark.implicits._
        val top = graft.operators.Sampling
          .weightedSample(batch, keyCol, weightCol, n, salt)
          .select(col(keyCol).cast("long"), col(weightCol).cast("long"))
          .as[(Long, Long)].collect().toSeq
        lock.synchronized { acc.merge(top); () }
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-res-stream").toString)
      .start()
    q.awaitTermination()
    acc.result
  }
}
