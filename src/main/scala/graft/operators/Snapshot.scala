package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — the ingest-ops card between two versions of a
  * corpus: per id, `added` (new only), `removed` (old only), `changed`
  * (both, content hash differs), `unchanged`. The thing a crawl-refresh
  * pipeline reads before deciding what to re-tokenize, re-embed and
  * re-dedup — incremental processing starts from exactly the
  * added+changed slice ([[Dedup.minhashLshPairsIncremental]] is the
  * dedup leg of the same discipline).
  *
  * Scale shape: both sides reduce to (id, 128-bit content hash) at the
  * scan — the text never crosses the exchange — then ONE id-keyed full
  * outer join decides the status. Engine-neutral: md5 hex, byte-equal in
  * any engine, so the oracle replays the whole card.
  */
object Snapshot {

  /** Per-id status relation: (idCol, status). CONTRACT: ids are unique
    * within each version (the corpus primary key) — a duplicated id
    * fans out through the full outer join, exactly as SQL would.
    */
  def diff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val o = oldDf.select(col(idCol).as("_o_id"), md5(col(textCol)).as("_o_h"))
    val n = newDf.select(col(idCol).as("_n_id"), md5(col(textCol)).as("_n_h"))
    o.join(n, col("_o_id") === col("_n_id"), "full_outer")
      .select(
        coalesce(col("_o_id"), col("_n_id")).as(idCol),
        when(col("_o_id").isNull, "added")
          .when(col("_n_id").isNull, "removed")
          // null-SAFE compare: a null text on one side is a content
          // change, not silently "unchanged"
          .when(!(col("_o_h") <=> col("_n_h")), "changed")
          .otherwise("unchanged").as("status"))
  }

  /** The four-counter summary card (total over each status, zeros kept). */
  def diffCard(oldDf: DataFrame, newDf: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val d = diff(oldDf, newDf, idCol, textCol)
    val spark = d.sparkSession
    import spark.implicits._
    Seq("added", "removed", "changed", "unchanged").toDF("status")
      .join(d.groupBy("status").agg(count(lit(1)).as("n_docs")), Seq("status"), "left")
      .select(col("status"), coalesce(col("n_docs"), lit(0L)).as("n_docs"))
  }
}
