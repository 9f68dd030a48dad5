package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

import graft.functions.TextFunctions

/** Streaming deduplication for progressive corpus ingest — the streaming leg
  * of the exact-dedup family (Dedup.exactGroups is the batch form). Both
  * transforms are written against plain DataFrames so the SAME code runs in
  * batch and streaming; the spec pins stream == batch over a MemoryStream.
  *
  * At the 100 TB posture the state story is the design constraint:
  *  - `dedupGroups` keeps one state row per DISTINCT fingerprint (16-byte
  *    md5 + two longs) — ~36 bytes per distinct document; a billion distinct
  *    docs is ~36 GB of state across the cluster, shuffle-partitioned by
  *    fingerprint, which HDFS/RocksDB state stores handle. Arrival order
  *    never changes the result (min/count are order-insensitive).
  *  - `firstSeen` is the append-mode stream filter (emit a doc only if its
  *    fingerprint is new): same per-fingerprint state via the built-in
  *    dropDuplicates state store; pass a watermark + event-time column to
  *    bound state for unbounded streams (exact dedup forever requires
  *    unbounded state — that trade is inherent, not an implementation gap).
  */
object StreamDedup {

  /** (fingerprint, canonical_id, multiplicity) per distinct normalized text.
    * Batch: a plain aggregation. Streaming: stateful agg — run with
    * OutputMode.Complete (or Update for incremental sinks).
    *
    * ONE definition of exact dedup: this delegates to `Dedup.exactGroups`
    * (oracled by q44 batch-side, q92 here) so batch and streaming semantics
    * cannot drift; the id cast keeps the streaming output schema stable.
    */
  def dedupGroups(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    graft.operators.Dedup.exactGroups(
      docs.withColumn(idCol, col(idCol).cast("long")), idCol, textCol)

  /** Append-mode first-arrival filter: keep a document only if its
    * fingerprint has not been seen. `eventTimeCol`+`watermark` bound the
    * dedup state window for unbounded streams via
    * `dropDuplicatesWithinWatermark` — duplicates arriving within the
    * watermark delay of the first sighting are dropped, duplicates later
    * than the watermark may re-emit (the inherent bounded-state trade).
    * Omit both for exact global dedup (unbounded state, bounded-corpus use).
    */
  def firstSeen(docs: DataFrame,
      textCol: String = "text", eventTimeCol: Option[String] = None,
      watermark: Option[String] = None): DataFrame = {
    val withFp = docs.withColumn("fingerprint", TextFunctions.fingerprint(col(textCol)))
    (eventTimeCol, watermark) match {
      case (Some(tc), Some(w)) =>
        // NOT dropDuplicates("fingerprint", tc): that keys state on the
        // (fingerprint, time) PAIR, so a real duplicate at a different
        // event time would not be a duplicate at all
        withFp.withWatermark(tc, w).dropDuplicatesWithinWatermark("fingerprint")
      case _ =>
        withFp.dropDuplicates("fingerprint")
    }
  }
}
