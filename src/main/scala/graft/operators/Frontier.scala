package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Crawl frontier selection — the scheduling step between link
  * extraction and the next fetch wave: scored candidate URLs (host
  * authority / PageRank from the graph layer), minus everything already
  * seen, capped PER HOST (politeness — no crawl spends its budget
  * hammering one host) and then globally budgeted.
  *
  * Spark shape: the seen-set subtraction is one LEFT ANTI hash join on
  * the url key; the per-host cap is a KEYED window (row_number
  * partitioned by host — never a global window); the global budget
  * compiles to TakeOrderedAndProject (a bounded heap per partition +
  * one merge — no full sort ever materializes). Ties break by url so
  * the selected set is deterministic, which is what makes the frontier
  * resumable (the same inputs always schedule the same wave).
  */
object Frontier {

  def select(candidates: DataFrame, seen: DataFrame, perHost: Int,
      total: Int, urlCol: String = "url",
      scoreCol: String = "score"): DataFrame = {
    require(perHost > 0, s"frontier: perHost must be positive, got $perHost")
    require(total > 0, s"frontier: total must be positive, got $total")
    val fresh = candidates.join(
      seen.select(col(urlCol)).distinct(), Seq(urlCol), "left_anti")
    val withHost = fresh.withColumn("host",
      lower(regexp_extract(col(urlCol), "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/]+)", 1)))
    val w = Window.partitionBy("host")
      .orderBy(col(scoreCol).desc, col(urlCol))
    withHost
      .withColumn("host_rank", row_number().over(w))
      .filter(col("host_rank") <= perHost)
      .orderBy(col(scoreCol).desc, col(urlCol))
      .limit(total)
  }
}
