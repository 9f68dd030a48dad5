package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.layout.GraftDataset

/** A3 `describe`: dataset structure summary — facet presence, record
  * counts, dimensions, attributes (reference
  * docs/user_manual/03-cli-reference.md:226-244). `--detailed` adds
  * per-facet vector stats via ProfileStats.
  */
object Describe {

  def dataset(spark: SparkSession, ds: GraftDataset, profileName: String,
      detailed: Boolean = false): DataFrame = {
    import spark.implicits._
    val prof = ds.profile(profileName)
    val rows = prof.facets.map { facetName =>
      val df = prof.facet(facetName)
      val (count, dim) = {
        val agg = df.agg(
          org.apache.spark.sql.functions.count(lit(1)),
          first(size(col("vector")))).collect()(0)
        (agg.getLong(0), if (agg.isNullAt(1)) -1 else agg.getInt(1))
      }
      val stats = if (detailed && dim > 0) {
        val s = df.agg(
          round(avg(graft.functions.VectorFunctions.vectorNorm(
            col("vector").cast("array<float>"))), 4)).collect()(0)
        s.getDouble(0)
      } else Double.NaN
      (facetName, count, dim, stats)
    }
    rows.toDF("facet", "records", "dim", "avg_norm")
      .withColumn("attributes",
        lit(ds.attributes.toSeq.sorted.map { case (k, v) => s"$k=$v" }.mkString(",")))
  }
}
