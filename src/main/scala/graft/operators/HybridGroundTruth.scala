package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, Row}

import graft.functions.TopKPairs.topKPairs
import graft.functions.VectorFunctions
import graft.predicates.{PNode, PNodeCodec, PNodeEvaluator}

/** Hybrid-query ground truth with PER-QUERY predicate trees (SURVEY.md J2,
  * §3.2; reference specs/ordinal_predicate_writers_v1.md:23-30: "Predicate
  * index 0 corresponds to query vector 0" — each query ordinal carries its
  * own predicate, and its neighbor set is restricted to base records whose
  * metadata matches that predicate).
  *
  * Spark shape: the query side carries framed PNode blobs (the wire format,
  * decoded per-executor once via a deserialized-tree cache); the base side
  * carries its metadata columns as a struct; a row-level evaluator applies
  * query-specific trees inside the broadcast-join pair stream, before the
  * bounded-heap top-k. Everything else (broadcast, partial agg) is exactly
  * the Knn plan.
  */
object HybridGroundTruth {

  /** Decode-and-evaluate: matches(predicateBlob, metadataStruct). The tree
    * cache avoids re-decoding the blob for every base row.
    */
  private val matchesUdf = udf { (blob: Array[Byte], meta: Row) =>
    if (blob == null) true
    else {
      val tree = TreeCache.get(blob)
      val fields = meta.schema.fieldNames
      val m = fields.iterator.zipWithIndex.map { case (f, i) => f -> meta.get(i) }.toMap
      PNodeEvaluator.matches(tree, m)
    }
  }

  /** Per-executor decoded-tree cache keyed by blob bytes. */
  private object TreeCache {
    private val cache = new java.util.concurrent.ConcurrentHashMap[Seq[Byte], PNode]()
    def get(blob: Array[Byte]): PNode =
      cache.computeIfAbsent(blob.toSeq, _ => PNodeCodec.decodeFramed(blob))
  }

  /** Top-k per query restricted by the query's own predicate over the base
    * metadata columns.
    *
    * @param queries (idCol, vecCol, predicateCol BINARY — framed PNode; null = unfiltered)
    * @param base    (idCol, vecCol, metadataCols...)
    * @return (query_id, neighbor_id, rank, dist)
    */
  def knnWithPerQueryPredicates(
      queries: DataFrame,
      base: DataFrame,
      k: Int,
      metric: String = "COSINE",
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      predicateCol: String = "predicate",
      metadataCols: Seq[String] = Nil,
      excludeSelf: Boolean = false): DataFrame = {

    val q = queries.select(
      col(idCol).cast("long").as("query_id"),
      col(vecCol).as("q_vec"),
      col(predicateCol).as("q_pred"))
    val b = base.select(
      (Seq(col(idCol).cast("long").as("neighbor_id"), col(vecCol).as("b_vec")) ++
        metadataCols.map(c => col(c))): _*)

    var pairs = b.crossJoin(broadcast(q))
    if (excludeSelf) pairs = pairs.filter(col("neighbor_id") =!= col("query_id"))
    val metaStruct = struct(metadataCols.map(col): _*)
    pairs = pairs.filter(matchesUdf(col("q_pred"), metaStruct))

    pairs
      .groupBy("query_id")
      .agg(topKPairs(
        VectorFunctions.distance(col("q_vec"), col("b_vec"), metric),
        col("neighbor_id"), k).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "pair")))
      .select(col("query_id"), col("pair.id").as("neighbor_id"),
        (col("pos") + 1).as("rank"), col("pair.dist").as("dist"))
  }

  /** Build the four predicate-dataset facets (§3.2's logical tables) from a
    * computed ground truth: `predicates` (ordinal, blob), `result_indices`
    * (ordinal, neighbor array), plus the metadata layout/content from the
    * base side. Facets share the query ordinal (zip-join discipline).
    */
  def buildPackage(
      queries: DataFrame,
      groundTruth: DataFrame,
      idCol: String = "vec_id",
      predicateCol: String = "predicate"): (DataFrame, DataFrame) = {
    val predicates = queries.select(
      col(idCol).cast("long").as("ordinal"), col(predicateCol).as("blob"))
    val resultIndices = groundTruth
      .groupBy(col("query_id").as("ordinal"))
      .agg(sort_array(collect_list(struct(col("rank"), col("neighbor_id"))))
        .getField("neighbor_id").as("neighbors"))
    (predicates, resultIndices)
  }
}
