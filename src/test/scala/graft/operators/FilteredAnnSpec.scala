package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.predicates._

/** Filtered (hybrid) approximate search: per-query wire predicates through
  * IVF and IVF-PQ with PRE-FILTER semantics. Pins:
  *  - exhaustive-probe filtered IVF == the exact hybrid ground truth
  *    (predicate semantics identical to the exact path's evaluator)
  *  - ivfIndexWithMeta assigns cells bit-identically to ivfIndex
  *  - null-predicate filtered searches == their unfiltered counterparts
  *  - every returned neighbor satisfies its query's predicate
  *  - a predicate naming a missing metadata column fails LOUDLY
  */
class FilteredAnnSpec extends SparkSpec {
  import spark.implicits._
  import Comparand._

  private val dim = 16
  private def vec(i: Long): Array[Float] =
    Array.tabulate(dim)(j =>
      ((graft.functions.StableHash.fnv64(s"f:$i:$j") >>> 12).toDouble / (1L << 52) * 2 - 1).toFloat)
  private lazy val base = (0L until 200L).map(i => (i, vec(i).toSeq, i % 10))
    .toDF("vec_id", "embedding", "label")
  private lazy val centroids = base.filter(col("vec_id") < 8)

  private def blobFor(mod: Long): Array[Byte] = {
    val tree: PNode = mod match {
      case 0 => PredicateNode.namedTyped("label", OpType.IN,
        IntVal(0), IntVal(1), IntVal(2))
      case 1 => PredicateNode.namedTyped("label", OpType.GE, IntVal(7))
      case _ => null
    }
    if (tree == null) null else PNodeCodec.encodeFramed(tree, PNodeCodec.Mode.NamedTyped)
  }
  private lazy val blobUdf = udf((qid: Long) => blobFor(qid % 3))
  private lazy val queries = base.filter(col("vec_id") >= 150)
    .withColumn("predicate", blobUdf(col("vec_id")))

  private def key(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Int)] =
    df.select(col("query_id"), col("neighbor_id"), col("rank").cast("int"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("exhaustive-probe filtered IVF equals the exact hybrid ground truth") {
    val want = key(HybridGroundTruth.knnWithPerQueryPredicates(
      queries, base, k = 5, metadataCols = Seq("label"), excludeSelf = true))
    val index = Ann.ivfIndexWithMeta(base, centroids, metaCols = Seq("label"))
    val got = key(Ann.ivfSearchFiltered(queries, index, centroids,
      k = 5, nProbe = 8, metadataCols = Seq("label"), excludeSelf = true))
    assert(got == want)
  }

  test("ivfIndexWithMeta cell assignment is identical to ivfIndex") {
    val plain = Ann.ivfIndex(base, centroids)
      .select("id", "cell").as[(Long, Long)].collect().toMap
    val withMeta = Ann.ivfIndexWithMeta(base, centroids, metaCols = Seq("label"))
      .select(col("id"), col("cell")).as[(Long, Long)].collect().toMap
    assert(withMeta == plain)
  }

  test("null predicates: filtered IVF == unfiltered IVF at every probe width") {
    val nullQ = base.filter(col("vec_id") >= 150)
      .withColumn("predicate", lit(null).cast("binary"))
    val index = Ann.ivfIndexWithMeta(base, centroids, metaCols = Seq("label"))
    val plainIndex = Ann.ivfIndex(base, centroids)
    for (np <- Seq(1, 3, 8)) {
      val got = key(Ann.ivfSearchFiltered(nullQ, index, centroids,
        k = 4, nProbe = np, metadataCols = Seq("label"), excludeSelf = true))
      val want = key(Ann.ivfSearch(base.filter(col("vec_id") >= 150), plainIndex,
        centroids, k = 4, nProbe = np, excludeSelf = true))
      assert(got == want, s"nProbe=$np")
    }
  }

  test("every filtered-IVF neighbor satisfies its query's predicate") {
    val index = Ann.ivfIndexWithMeta(base, centroids, metaCols = Seq("label"))
    val out = Ann.ivfSearchFiltered(queries, index, centroids,
        k = 5, nProbe = 3, metadataCols = Seq("label"), excludeSelf = true)
      .join(base.select(col("vec_id").as("neighbor_id"), col("label")), "neighbor_id")
      .select(col("query_id"), col("label")).as[(Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (qid, lab) =>
      qid % 3 match {
        case 0 => assert(Set(0L, 1L, 2L).contains(lab), s"q$qid -> label $lab")
        case 1 => assert(lab >= 7L, s"q$qid -> label $lab")
        case _ =>
      }
    }
  }

  test("filtered IVF-PQ: null predicates == unfiltered; predicates respected") {
    val cbs = Pq.subsetCodebooks(base.filter(col("vec_id") < 16), m = 4)
    val index = Pq.ivfPqIndex(base, centroids, cbs)
      .join(base.select(col("vec_id").as("id"), col("label")), Seq("id"))
    val nullQ = base.filter(col("vec_id") >= 150)
      .withColumn("predicate", lit(null).cast("binary"))
    val got = key(Pq.ivfPqSearchFiltered(nullQ, index, centroids, cbs,
      k = 4, nProbe = 3, metadataCols = Seq("label"), excludeSelf = true)
      .withColumnRenamed("adc_dist", "dist"))
    val want = key(Pq.ivfPqSearch(base.filter(col("vec_id") >= 150),
      index.drop("label"), centroids, cbs, k = 4, nProbe = 3, excludeSelf = true))
    assert(got == want)

    val filtered = Pq.ivfPqSearchFiltered(queries, index, centroids, cbs,
        k = 4, nProbe = 3, metadataCols = Seq("label"), excludeSelf = true)
      .join(base.select(col("vec_id").as("neighbor_id"), col("label")), "neighbor_id")
      .select(col("query_id"), col("label")).as[(Long, Long)].collect()
    assert(filtered.nonEmpty)
    filtered.foreach { case (qid, lab) =>
      qid % 3 match {
        case 0 => assert(Set(0L, 1L, 2L).contains(lab))
        case 1 => assert(lab >= 7L)
        case _ =>
      }
    }
  }

  test("predicate naming a missing metadata column fails loudly") {
    val badBlob = PNodeCodec.encodeFramed(
      PredicateNode.namedTyped("nope", OpType.GE, IntVal(1)),
      PNodeCodec.Mode.NamedTyped)
    val q = base.filter(col("vec_id") >= 195).withColumn("predicate",
      udf(() => badBlob).apply())
    val index = Ann.ivfIndexWithMeta(base, centroids, metaCols = Seq("label"))
    val ex = intercept[Exception] {
      Ann.ivfSearchFiltered(q, index, centroids, k = 3, nProbe = 2,
        metadataCols = Seq("label")).collect()
    }
    assert(ex.getMessage != null)
  }
}
