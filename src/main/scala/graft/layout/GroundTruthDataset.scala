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

    val baseOrd = base.select(col(idCol).cast("long").as("ordinal"),
      col(vecCol).cast("array<float>").as("vector"))
    val queryOrd = queries.select(col(idCol).cast("long").as("ordinal"),
      col(vecCol).cast("array<float>").as("vector"))

    // Validate BEFORE any file is written (no half-valid directory on bad
    // input). xvec answer keys are POSITIONAL: neighbor index i means "base
    // row i", so base ids must be dense 0-based uniques — otherwise the
    // packaged indices silently point at the wrong vectors. Query ids need
    // only be unique (their sort order defines the answer-key row order).
    def stats(df: DataFrame, what: String): (Long, Int, Long, Long) = {
      val r = df.agg(count(lit(1)), count_distinct(col("ordinal")),
        min("ordinal"), max("ordinal"),
        min(size(col("vector"))), max(size(col("vector")))).collect()(0)
      require(r.getLong(0) > 0, s"$what: empty input")
      val n = r.getLong(0)
      require(r.getLong(1) == n, s"$what: ids must be unique ($n rows, ${r.getLong(1)} distinct)")
      require(r.getInt(4) == r.getInt(5),
        s"$what: ragged vector dims ${r.getInt(4)}..${r.getInt(5)}")
      (n, r.getInt(4), r.getLong(2), r.getLong(3))
    }
    val (nBase, dimB, minB, maxB) = stats(baseOrd, "base")
    val (nQuery, dimQ, _, _) = stats(queryOrd, "query")
    require(dimB == dimQ, s"dim mismatch: base $dimB vs query $dimQ")
    require(minB == 0L && maxB == nBase - 1,
      s"base ids must be dense 0-based ordinals (got [$minB..$maxB] for $nBase rows): " +
        "positional neighbor indices would point at the wrong vectors")
    require(nBase >= k,
      s"k=$k exceeds base size $nBase: answer-key rows would hold fewer than k " +
        "neighbors while the manifest's max_k still advertised k")

    Files.createDirectories(Paths.get(outDir))
    XvecIO.write(baseOrd, s"$outDir/base.fvec")
    XvecIO.write(queryOrd, s"$outDir/query.fvec")

    // ground truth: neighbors ordered by (dist, id) — the deterministic
    // rank order every oracled KNN query pins. The |Q|·k answer key is
    // tiny; cache it so the expensive KNN job runs ONCE for both facets.
    val knn = Knn.knn(queries, base, k, metric, idCol, vecCol)
    val grouped = knn
      .groupBy(col("query_id").as("ordinal"))
      .agg(array_sort(collect_list(struct(col("rank"), col("neighbor_id"), col("dist"))))
        .as("sorted"))
      .select(col("ordinal"),
        transform(col("sorted"), e => e.getField("neighbor_id").cast("int")).as("neighbors"),
        transform(col("sorted"), e => e.getField("dist").cast("float")).as("distances"))
      .cache()
    val (nIdx, nDist) =
      try {
        (XvecIO.write(grouped.select(col("ordinal"), col("neighbors").as("vector")),
          s"$outDir/neighbors.ivec"),
          XvecIO.write(grouped.select(col("ordinal"), col("distances").as("vector")),
            s"$outDir/distances.fvec"))
      } finally grouped.unpersist()

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

    Seq(
      ("base_vectors", nBase, dimB.toLong),
      ("query_vectors", nQuery, dimQ.toLong),
      ("neighbor_indices", nIdx, k.toLong),
      ("neighbor_distances", nDist, k.toLong))
      .toDF("facet", "records", "dim")
  }
}
