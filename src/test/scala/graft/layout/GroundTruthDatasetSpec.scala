package graft.layout

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Knn

/** Package-and-reload round trip for the ground-truth dataset builder. */
class GroundTruthDatasetSpec extends SparkSpec {
  import spark.implicits._

  private def vec(i: Long): Array[Float] =
    Array.tabulate(8)(j =>
      ((graft.functions.StableHash.fnv64(s"gt:$i:$j") >>> 12).toDouble / (1L << 52) * 2 - 1).toFloat)

  test("build writes 4 facets + manifest; reload reproduces the exact answer key") {
    val base = (0L until 50L).map(i => (i, vec(i).toSeq)).toDF("vec_id", "embedding")
    val queries = base.filter(col("vec_id") < 5)
    val out = Files.createTempDirectory("graft-gt").toString

    val summary = GroundTruthDataset.build(spark, base, queries, k = 3,
        metric = "COSINE", outDir = out)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(summary == Map(
      "base_vectors" -> ((50L, 8L)), "query_vectors" -> ((5L, 8L)),
      "neighbor_indices" -> ((5L, 3L)), "neighbor_distances" -> ((5L, 3L))))

    val ds = GraftDataset.load(spark, out)
    assert(ds.attributes("distance_function") == "COSINE")
    val p = ds.profile("default")
    val packaged = p.facet("indices")
      .select(col("ordinal"), posexplode(col("vector")).as(Seq("pos", "nid")))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet

    val direct = Knn.knn(queries, base, k = 3, metric = "COSINE")
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank") - 1,
        r.getAs[Long]("neighbor_id").toInt))
      .toSet
    assert(packaged == direct)

    // distances facet is rank-aligned and non-decreasing per query
    val dists = p.facet("distances")
      .select(col("ordinal"), col("vector").cast("array<double>"))
      .as[(Long, Array[Double])].collect().toMap
    dists.values.foreach(d => assert(d.zip(d.tail).forall { case (a, b) => a <= b }))
  }

  test("build rejects non-dense base ids and empty inputs BEFORE writing") {
    val base = (0L until 50L).map(i => (i, vec(i).toSeq)).toDF("vec_id", "embedding")
    val out = Files.createTempDirectory("graft-gt-bad").toString
    // gappy ids: positional neighbor indices would dereference wrong rows
    val e = intercept[IllegalArgumentException] {
      GroundTruthDataset.build(spark, base.filter(col("vec_id") % 2 === 0),
        base.limit(2), k = 2, metric = "COSINE", outDir = s"$out/gappy")
    }
    assert(e.getMessage.contains("dense"))
    assert(!Files.exists(java.nio.file.Paths.get(s"$out/gappy/base.fvec")))
    intercept[IllegalArgumentException] {
      GroundTruthDataset.build(spark, base.limit(0), base.limit(2),
        k = 2, metric = "COSINE", outDir = s"$out/empty")
    }
  }
}
