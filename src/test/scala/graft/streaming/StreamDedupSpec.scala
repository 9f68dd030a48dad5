package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** Streaming dedup: stream == batch for the stateful group form, and
  * cross-micro-batch first-arrival suppression for the append form.
  */
class StreamDedupSpec extends SparkSpec {
  import spark.implicits._

  private val batch1 = Seq(
    (0L, "the quick brown fox"),
    (1L, "completely different text"),
    (2L, "The  quick BROWN fox")) // normalizes to a dup of 0
  private val batch2 = Seq(
    (3L, "the quick brown fox"),  // dup of 0, later micro-batch
    (4L, "a third distinct document"))

  test("streaming dedupGroups (complete mode) equals batch over the same rows") {
    val mem = MemoryStream[(Long, String)](spark)
    val q = StreamDedup.dedupGroups(mem.toDF().toDF("doc_id", "text"))
    val query = q.writeStream.format("memory").queryName("sdg")
      .outputMode(OutputMode.Complete()).start()
    try {
      mem.addData(batch1: _*)
      query.processAllAvailable()
      mem.addData(batch2: _*)
      query.processAllAvailable()
    } finally query.stop()
    val streamed = spark.table("sdg").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val batch = StreamDedup.dedupGroups((batch1 ++ batch2).toDF("doc_id", "text"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch)
    // the dup fingerprint collapsed to canonical_id 0 with multiplicity 3
    assert(batch.exists { case (_, c, m) => c == 0L && m == 3L })
    assert(batch.size == 3)
  }

  test("watermarked firstSeen dedupes same fingerprint at DIFFERENT event times") {
    import java.sql.Timestamp
    def ts(s: Int) = Timestamp.valueOf(f"2024-01-01 10:00:$s%02d")
    val mem = MemoryStream[(Long, String, Timestamp)](spark)
    val q = StreamDedup.firstSeen(mem.toDF().toDF("doc_id", "text", "ts"),
        eventTimeCol = Some("ts"), watermark = Some("1 hour"))
      .select("doc_id", "fingerprint")
    val query = q.writeStream.format("memory").queryName("sfw")
      .outputMode(OutputMode.Append()).start()
    try {
      // doc 1 duplicates doc 0's text one second later — state must key on
      // the FINGERPRINT alone, not the (fingerprint, event-time) pair
      mem.addData((0L, "the quick brown fox", ts(0)),
        (1L, "the quick brown fox", ts(1)), (2L, "something else", ts(2)))
      query.processAllAvailable()
      mem.addData((3L, "THE  quick   brown fox", ts(30))) // dup across batches
      query.processAllAvailable()
    } finally query.stop()
    val ids = spark.table("sfw").collect().map(_.getLong(0)).toSet
    assert(ids == Set(0L, 2L), s"got $ids")
  }

  test("firstSeen suppresses duplicates across micro-batches") {
    val mem = MemoryStream[(Long, String)](spark)
    val q = StreamDedup.firstSeen(mem.toDF().toDF("doc_id", "text"))
      .select("doc_id", "fingerprint")
    val query = q.writeStream.format("memory").queryName("sfs")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(batch1: _*)
      query.processAllAvailable()
      mem.addData(batch2: _*)
      query.processAllAvailable()
    } finally query.stop()
    val rows = spark.table("sfs").collect().map(r => (r.getLong(0), r.getString(1)))
    // one row per distinct fingerprint; doc 3 (dup of 0, later batch) dropped
    assert(rows.map(_._2).distinct.length == rows.length)
    assert(rows.length == 3)
    assert(!rows.map(_._1).contains(3L))
    // batch semantics: same fingerprint set as batch distinct
    val batchFps = StreamDedup.firstSeen((batch1 ++ batch2).toDF("doc_id", "text"))
      .select("fingerprint").collect().map(_.getString(0)).toSet
    assert(rows.map(_._2).toSet == batchFps)
  }
}
