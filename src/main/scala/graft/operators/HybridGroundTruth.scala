package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Row}

import graft.predicates.{ConjugateNode, PNode, PNodeCodec, PNodeEvaluator, PredicateNode}

/** Hybrid-query ground truth with PER-QUERY predicate trees (SURVEY.md J2,
  * §3.2; reference specs/ordinal_predicate_writers_v1.md:23-30: "Predicate
  * index 0 corresponds to query vector 0" — each query ordinal carries its
  * own predicate, and its neighbor set is restricted to base records whose
  * metadata matches that predicate).
  *
  * Spark shape: the query side carries framed PNode blobs; the base side
  * carries its metadata columns as a struct; a row-level evaluator applies
  * query-specific trees inside Knn.knn's pair stream (same broadcast +
  * bounded-heap plan — this operator only supplies the pairPredicate).
  */
object HybridGroundTruth {

  /** Per-executor decoded-tree cache (keyed by blob bytes): lock-free
    * ConcurrentHashMap reads with FIFO size-bounding (misses enqueue their
    * key; over-budget inserts evict the oldest — not strict LRU, but
    * bounded, and the hot path never takes a lock). Each entry memoizes the
    * last StructType REFERENCE it validated against: within one query every
    * Row carries the same schema instance, so validation collapses to one
    * `eq` check per row; an unseen instance just re-validates (exact — no
    * hash-collision false positives — and merely costs the optimization).
    */
  private final class TreeEntry(val tree: PNode, val fields: Set[String]) {
    // identity REFERENCES of schema instances this tree was validated
    // against (bounded): concurrent tasks each carry their own deserialized
    // StructType, so a single slot would thrash — a small eq-scanned list
    // accepts one instance per task. Races may drop a prepend (benign:
    // re-validation is correct, just unmemoized for that row).
    @volatile var validatedSchemas: List[AnyRef] = Nil
    def isValidated(schema: AnyRef): Boolean = validatedSchemas.exists(_ eq schema)
    def markValidated(schema: AnyRef): Unit =
      validatedSchemas = (schema :: validatedSchemas).take(64)
  }

  private object TreeCache {
    private val MaxEntries = 10000
    private val cache = new java.util.concurrent.ConcurrentHashMap[Seq[Byte], TreeEntry]()
    private val insertion = new java.util.concurrent.ConcurrentLinkedQueue[Seq[Byte]]()
    def get(blob: Array[Byte]): TreeEntry = {
      val key: Seq[Byte] = scala.collection.immutable.ArraySeq.unsafeWrapArray(blob)
      val hit = cache.get(key)
      if (hit != null) return hit
      val entry = cache.computeIfAbsent(key, _ => {
        // decode BEFORE enqueueing: a throwing decode must not leave a
        // phantom key desyncing the FIFO from the cache
        val tree = PNodeCodec.decodeFramed(blob)
        insertion.add(key)
        new TreeEntry(tree, fieldsOf(tree))
      })
      while (cache.size() > MaxEntries) {
        val oldest = insertion.poll()
        if (oldest == null) return entry
        cache.remove(oldest)
      }
      entry
    }
    private def fieldsOf(n: PNode): Set[String] = n match {
      case ConjugateNode(_, cs) => cs.flatMap(fieldsOf).toSet
      case p: PredicateNode     => Set(p.effectiveName)
    }
  }

  /** Decode-and-evaluate against the metadata struct. A tree referencing a
    * field that is not in the struct fails LOUDLY — the reference's
    * missing-field-behaves-as-null semantics would silently produce an
    * empty "ground truth" when the caller forgets a metadata column.
    */
  private val matchesUdf = udf { (blob: Array[Byte], meta: Row) =>
    if (blob == null) true
    else {
      val entry = TreeCache.get(blob)
      val schema = meta.schema
      if (!entry.isValidated(schema)) {
        val names = schema.fieldNames
        val missing = entry.fields.filterNot(names.contains)
        if (missing.nonEmpty) {
          throw new IllegalArgumentException(
            s"predicate references fields ${missing.mkString(",")} not present in " +
              s"metadataCols ${names.mkString("[", ",", "]")}")
        }
        entry.markValidated(schema)
      }
      PNodeEvaluator.matchesRow(entry.tree, meta)
    }
  }

  /** The decoded-and-cached per-pair predicate matcher as a Column — the
    * same evaluator the exact hybrid path runs, exposed so the FILTERED
    * approximate path ([[Ann.ivfSearchFiltered]]) applies identical
    * semantics (null blob = unfiltered; missing metadata field = loud
    * failure) to candidates before its distance kernel.
    */
  def matchesColumn(blob: org.apache.spark.sql.Column,
      metaStruct: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    matchesUdf(blob, metaStruct)

  /** Top-k per query restricted by the query's own predicate over the base
    * metadata columns. Delegates the physical plan to Knn.knn.
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
    val metaStruct = struct(metadataCols.map(c => col(s"b_$c").as(c)): _*)
    Knn.knn(queries, base, k, metric, idCol, vecCol,
      queryExtra = Seq(predicateCol),
      baseExtra = metadataCols,
      pairPredicate = Some(matchesUdf(col(s"q_$predicateCol"), metaStruct)),
      excludeSelf = excludeSelf)
  }

  /** Build the predicate-dataset facets (§3.2's logical tables) from a
    * computed ground truth: `predicates` (ordinal, blob) and
    * `result_indices` (ordinal, neighbor array). Facets share the query
    * ordinal positionally — a query with NO matching neighbors still gets
    * its row (empty array), preserving the zip-join discipline.
    */
  def buildPackage(
      queries: DataFrame,
      groundTruth: DataFrame,
      idCol: String = "vec_id",
      predicateCol: String = "predicate"): (DataFrame, DataFrame) = {
    val predicates = queries.select(
      col(idCol).cast("long").as("ordinal"), col(predicateCol).as("blob"))
    val nonEmpty = groundTruth
      .groupBy(col("query_id").as("ordinal"))
      .agg(sort_array(collect_list(struct(col("rank"), col("neighbor_id"))))
        .getField("neighbor_id").as("neighbors"))
    val resultIndices = predicates.select("ordinal")
      .join(nonEmpty, Seq("ordinal"), "left")
      .select(col("ordinal"),
        coalesce(col("neighbors"), array().cast("array<bigint>")).as("neighbors"))
    (predicates, resultIndices)
  }
}
