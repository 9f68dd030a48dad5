package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GeneratorsCleanupSpec extends SparkSpec {
  import spark.implicits._

  test("gaussianVectors is deterministic regardless of partitioning") {
    val a = Generators.gaussianVectors(spark, 200, 8, seed = 42)
      .repartition(7).orderBy("ordinal").collect()
    val b = Generators.gaussianVectors(spark, 200, 8, seed = 42)
      .repartition(2).orderBy("ordinal").collect()
    assert(a.map(_.getSeq[Float](1)).toSeq == b.map(_.getSeq[Float](1)).toSeq)
  }

  test("gaussianVectors injects zeroes and duplicates at roughly the asked proportions") {
    val df = Generators.gaussianVectors(spark, 2000, 4, seed = 1,
      zeroesProportion = 0.05, duplicatesProportion = 0.05).cache()
    val zeros = df.filter(Cleanup.isZeroVector(col("vector"))).count()
    assert(zeros > 40 && zeros < 220, s"zeros=$zeros")
    val dups = Cleanup.duplicateGroups(df, "vector")
      .agg(sum(col("multiplicity") - 1)).collect()(0).getLong(0)
    assert(dups > 20 && dups < 220, s"dups=$dups")
  }

  test("gaussian components look standard-normal (mean~0, std~1)") {
    val stats = ProfileStats.perDimStats(
      Generators.gaussianVectors(spark, 5000, 4, seed = 7), "vector").collect()
    stats.foreach { r =>
      assert(math.abs(r.getAs[Double]("mean")) < 0.1)
      assert(math.abs(r.getAs[Double]("std") - 1.0) < 0.1)
    }
  }

  test("lehmerGaussian matches a direct scala computation") {
    val got = spark.range(50).select(Generators.lehmerGaussian(col("id")))
      .collect().map(_.getDouble(0))
    val want = (0 until 50).map { id =>
      val m = 2147483647L; val a = 48271L
      val x1 = (id + 1) * a % m
      val x2 = x1 * a % m
      math.sqrt(-2.0 * math.log(x1.toDouble / m)) * math.cos(2.0 * math.Pi * x2.toDouble / m)
    }
    got.zip(want).foreach { case (g, w) => assert(math.abs(g - w) < 1e-12) }
  }

  test("clean drops zero vectors and keeps lowest-id duplicate representative") {
    val df = Seq(
      (0L, Seq(1.0f, 2.0f)),
      (1L, Seq(0.0f, 0.0f)), // zero -> dropped
      (2L, Seq(1.0f, 2.0f)), // dup of 0 -> dropped
      (3L, Seq(3.0f, 4.0f))).toDF("id", "vec")
    val kept = Cleanup.clean(df, "id", "vec").select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(0L, 3L))
    assert(Cleanup.countZeros(df, "vec").collect()(0).getLong(0) == 1)
  }

  test("fromModel samples stay inside a uniform model's bounds") {
    val models = Seq(
      DistributionFit.Uniform(-1.0, 1.0),
      DistributionFit.Normal(5.0, 0.1))
    val rows = Generators.fromModel(spark, 300, models).collect()
    rows.foreach { r =>
      val v = r.getSeq[Float](1)
      assert(v(0) >= -1.001f && v(0) <= 1.001f)
      assert(v(1) > 4.0f && v(1) < 6.0f)
    }
  }
}
