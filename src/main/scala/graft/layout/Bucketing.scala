package graft.layout

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed table layout — the co-located-join leg of the 100 TB posture.
  *
  * A join between two tables bucketed (and sorted) on the join key by the
  * SAME bucket count needs NO exchange at query time: Spark's
  * `EnsureRequirements` sees both sides already hash-partitioned by the key
  * and plans a SortMergeJoin over the existing layout. For repeatedly-joined
  * big tables (facet zip-joins, codes↔metadata, index↔payload) the shuffle
  * is paid ONCE at write time instead of on every query.
  *
  * Spark constraint: bucketed layout metadata lives in the session catalog,
  * so these write via `saveAsTable` (parquet under the warehouse dir), not
  * plain `.parquet(path)`. BucketingSpec proves the no-exchange plan and
  * result parity against the shuffled join.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted table (overwrites). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      nBuckets: Int): Unit = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
  }

  def readTable(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
