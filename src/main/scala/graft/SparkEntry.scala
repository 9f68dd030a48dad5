package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each family object under `graft.queries` contributes `GQuery` entries:
  * a named Spark implementation plus (where SQL-expressible) a DuckDB oracle
  * over the same parquet tables. The driver runs every `queries` entry at
  * sf0.01 and hash-compares against the oracle result.
  */
object SparkEntry {

  private def families: Seq[GQuery] =
    Relational.all ++ VectorQueries.all ++ PredicateQueries.all ++ StatsQueries.all ++
      TextQueries.all ++ DedupQueries.all ++ SourceQueries.all ++ StreamQueries.all ++
      MetadataQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q03_join_revenue_by_nation")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    families.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    families.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
