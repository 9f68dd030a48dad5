package graft

import java.nio.file.{Files, Paths}

import graft.sources.xvec.XvecIO
import org.apache.spark.sql.functions._

/** Smoke coverage for every Main subcommand (X2): each dispatches onto the
  * already-tested operator and returns a sane frame.
  */
class CliSpec extends SparkSpec {

  private lazy val dir: String = {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-cli").toString
    val rnd = new scala.util.Random(5)
    val vecs = (0L until 100L).map(i => (i, Array.fill(16)(rnd.nextGaussian().toFloat)))
    XvecIO.write(vecs.toDF("ordinal", "vector"), s"$d/base.fvec")
    XvecIO.write(vecs.take(10).toDF("ordinal", "vector"), s"$d/query.fvec")
    Files.write(Paths.get(d, "dataset.yaml"),
      """attributes: {distance_function: COSINE}
        |profiles:
        |  default:
        |    base: base.fvec
        |    query: query.fvec
        |""".stripMargin.getBytes("UTF-8"))
    Files.write(Paths.get(d, "lines.txt"), "alpha\nbeta\ngamma\n".getBytes("UTF-8"))
    d
  }

  test("describe") {
    val r = Main.run(spark, Seq("describe", "--dataset", dir, "--detailed"))
    val rows = r.collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(rows == Map("base_vectors" -> 100L, "query_vectors" -> 10L))
  }

  test("knn") {
    val r = Main.run(spark, Seq("knn", "--base", s"$dir/base.fvec",
      "--query", s"$dir/query.fvec", "--k", "5"))
    assert(r.count() == 50)
    assert(r.columns.toSet == Set("query_id", "neighbor_id", "rank", "dist"))
  }

  test("verify_knn: identical metrics → recall 1") {
    val r = Main.run(spark, Seq("verify_knn", "--base", s"$dir/base.fvec",
      "--query", s"$dir/query.fvec", "--k", "5", "--metric", "COSINE,COSINE"))
    assert(r.collect()(0).getDouble(0) == 1.0)
  }

  test("analyze-profile") {
    val r = Main.run(spark, Seq("analyze-profile", "--input", s"$dir/base.fvec"))
    assert(r.count() == 16)
  }

  test("generate") {
    val out = s"$dir/gen.fvec"
    val r = Main.run(spark, Seq("generate", "--count", "50", "--dim", "8",
      "--out", out))
    assert(r.collect()(0).getLong(0) == 50L)
    assert(XvecIO.read(spark, out).count() == 50)
  }

  test("slab import → analyze → export") {
    val slab = s"$dir/slab"
    val imp = Main.run(spark, Seq("slab-import", "--slab", slab, "--ns", "t",
      "--file", s"$dir/lines.txt"))
    assert(imp.collect()(0).getLong(1) == 3L)
    val an = Main.run(spark, Seq("slab-analyze", "--slab", slab))
    assert(an.count() == 1)
    Main.run(spark, Seq("slab-export", "--slab", slab, "--ns", "t",
      "--out", s"$dir/exported"))
    val lines = spark.read.text(s"$dir/exported")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(lines == Seq("alpha", "beta", "gamma"))
  }

  test("unknown command fails with usage") {
    val e = intercept[IllegalArgumentException](Main.run(spark, Seq("frobnicate")))
    assert(e.getMessage.contains("usage"))
  }
}
