package graft.layout

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Knn
import graft.sources.xvec.XvecIO

/** The reference's flagship end-to-end workflow (`nbvectors compute knn` →
  * packaged test dataset; README.md:34-110, docs/specs/dataset_yaml_v1.md):
  * compute exact KNN ground truth and PACKAGE it as a dataset directory —
  * base/query vector facets plus `neighbor_indices` (ivec) and
  * `neighbor_distances` (fvec) answer keys, bound together by a
  * `dataset.yaml` manifest that [[GraftDataset.load]] (and the reference's
  * own readers — the formats are byte-compatible) can open.
  *
  * Spark shape: the KNN is the proven broadcast+bounded-heap plan; the
  * pivot to per-query neighbor rows is one small exchange of k-row groups
  * (|Q|·k rows — the answer key, never the base relation).
  */
object GroundTruthDataset {

  /** Compute top-k ground truth for `queries` against `base` and write the
    * four facets + manifest into `outDir`. Returns a summary frame:
    * (facet, records, dim) per written facet.
    */
  def build(spark: SparkSession, base: DataFrame, queries: DataFrame,
      k: Int, metric: String, outDir: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import spark.implicits._
    Files.createDirectories(Paths.get(outDir))

    val baseOrd = base.select(col(idCol).cast("long").as("ordinal"),
      col(vecCol).cast("array<float>").as("vector"))
    val queryOrd = queries.select(col(idCol).cast("long").as("ordinal"),
      col(vecCol).cast("array<float>").as("vector"))
    val nBase = XvecIO.write(baseOrd, s"$outDir/base.fvec")
    val nQuery = XvecIO.write(queryOrd, s"$outDir/query.fvec")

    // ground truth: neighbors ordered by (dist, id) — the deterministic
    // rank order every oracled KNN query pins
    val knn = Knn.knn(queries, base, k, metric, idCol, vecCol)
    val grouped = knn
      .groupBy(col("query_id").as("ordinal"))
      .agg(
        transform(array_sort(collect_list(struct(col("rank"), col("neighbor_id"), col("dist")))),
          e => e.getField("neighbor_id").cast("int")).as("neighbors"),
        transform(array_sort(collect_list(struct(col("rank"), col("neighbor_id"), col("dist")))),
          e => e.getField("dist").cast("float")).as("distances"))
    val nIdx = XvecIO.write(
      grouped.select(col("ordinal"), col("neighbors").as("vector")),
      s"$outDir/neighbors.ivec")
    val nDist = XvecIO.write(
      grouped.select(col("ordinal"), col("distances").as("vector")),
      s"$outDir/distances.fvec")

    val manifest =
      s"""attributes:
         |  distance_function: ${metric.toUpperCase}
         |  max_k: $k
         |  model: graft-ground-truth
         |profiles:
         |  default:
         |    base: base.fvec
         |    query: query.fvec
         |    indices: neighbors.ivec
         |    distances: distances.fvec
         |""".stripMargin
    Files.write(Paths.get(outDir, "dataset.yaml"), manifest.getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)

    val dim = baseOrd.select(size(col("vector"))).first().getInt(0)
    Seq(
      ("base_vectors", nBase, dim.toLong),
      ("query_vectors", nQuery, dim.toLong),
      ("neighbor_indices", nIdx, k.toLong),
      ("neighbor_distances", nDist, k.toLong))
      .toDF("facet", "records", "dim")
  }
}
