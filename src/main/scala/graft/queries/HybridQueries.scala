package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.HybridGroundTruth
import graft.predicates._

/** Per-query predicate ground truth (the reference's real hybrid-query
  * discipline — each query ordinal carries its own predicate tree,
  * ordinal_predicate_writers_v1.md:23-30). Three predicate shapes cycle by
  * query id; each is a wire-encoded framed PNode decoded and evaluated
  * against base metadata inside the pair stream. The oracle replays the
  * cycle with a CASE filter.
  */
object HybridQueries {
  import Comparand._

  // query_id % 3 == 0 -> label IN (0,1,2,3); == 1 -> label >= 5; == 2 -> all
  private def treeFor(mod: Long): PNode = mod match {
    case 0 => PredicateNode.namedTyped("label", OpType.IN,
      IntVal(0), IntVal(1), IntVal(2), IntVal(3))
    case 1 => PredicateNode.namedTyped("label", OpType.GE, IntVal(5))
    case _ => ConjugateNode.and() // empty AND = true
  }

  private def blobFor(mod: Long): Array[Byte] =
    PNodeCodec.encodeFramed(treeFor(mod), PNodeCodec.Mode.NamedTyped)

  val all: Seq[GQuery] = Seq(
    GQuery(
      "q56_hybrid_per_query_pred",
      """WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 30),
        |d AS (
        |  SELECT q.qid, b.vec_id AS nid,
        |    1.0 - list_sum(list_transform(range(1, len(q.qe)+1),
        |            i -> q.qe[i]::DOUBLE * b.embedding[i]::DOUBLE))
        |        / (sqrt(list_sum(list_transform(q.qe, x -> x::DOUBLE*x::DOUBLE))) *
        |           sqrt(list_sum(list_transform(b.embedding, x -> x::DOUBLE*x::DOUBLE)))) AS dist
        |  FROM q CROSS JOIN embeddings b
        |  WHERE b.vec_id <> q.qid
        |    AND CASE q.qid % 3
        |          WHEN 0 THEN b.label IN (0, 1, 2, 3)
        |          WHEN 1 THEN b.label >= 5
        |          ELSE TRUE END)
        |SELECT qid AS query_id, nid AS neighbor_id, rank FROM (
        |  SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY dist, nid) AS rank
        |  FROM d)
        |WHERE rank <= 5""".stripMargin) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val blobUdf = udf((qid: Long) => blobFor(qid % 3))
      val queries = emb.filter(col("vec_id") < 30)
        .withColumn("predicate", blobUdf(col("vec_id")))
      HybridGroundTruth.knnWithPerQueryPredicates(
          queries, emb, k = 5, metric = "COSINE",
          metadataCols = Seq("label"), excludeSelf = true)
        .select(col("query_id"), col("neighbor_id"), col("rank").cast("long").as("rank"))
    },
  )
}
