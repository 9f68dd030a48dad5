package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Sampling

/** Streaming weighted reservoir: multi-batch == batch exactly, redelivery
  * idempotence, bounded state.
  */
class ReservoirSpec extends SparkSpec {
  import spark.implicits._

  private def rows = (1L to 400L).map(i => (i, 1L + i % 7)).toDF("id", "w")

  private def batchSample(n: Int): Set[(Long, Long, Double)] =
    Sampling.weightedSample(rows, "id", "w", n)
      .select(col("id"), col("w"), col("es_key"))
      .as[(Long, Long, Double)].collect().toSet

  test("multi-batch stream (4 files) equals the batch sample exactly") {
    val dir = java.nio.file.Files.createTempDirectory("res-spec").toString
    (0 until 4).foreach { p =>
      rows.filter(pmod(col("id"), lit(4)) === p)
        .write.mode("overwrite").parquet(s"$dir/part-$p")
    }
    val stream = spark.readStream.schema(rows.schema)
      .option("maxFilesPerTrigger", "1") // forces >= 4 micro-batches
      .option("recursiveFileLookup", "true")
      .parquet(dir)
    val got = StreamSketch.weightedReservoirFromStream(stream, "id", "w", n = 30)
      .map { case (k, w, es) =>
        (k, w, BigDecimal(es).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.toSet
    assert(got == batchSample(30))
  }

  test("redelivered batches do not perturb the sample (idempotent merge)") {
    val acc = new StreamSketch.ReservoirAcc(10, "wsample")
    val all = rows.as[(Long, Long)].collect().toSeq
    val (b1, b2) = all.splitAt(150)
    acc.merge(Sampling.weightedSample(b1.toDF("id", "w"), "id", "w", 10)
      .select(col("id"), col("w")).as[(Long, Long)].collect().toSeq)
    val once = acc.result
    // redeliver the same batch twice, then the second batch twice
    val b1Top = Sampling.weightedSample(b1.toDF("id", "w"), "id", "w", 10)
      .select(col("id"), col("w")).as[(Long, Long)].collect().toSeq
    acc.merge(b1Top); acc.merge(b1Top)
    assert(acc.result == once)
    val b2Top = Sampling.weightedSample(b2.toDF("id", "w"), "id", "w", 10)
      .select(col("id"), col("w")).as[(Long, Long)].collect().toSeq
    acc.merge(b2Top); acc.merge(b2Top)
    val fin = acc.result.map { case (k, w, es) =>
      (k, w, BigDecimal(es).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSet
    assert(fin == batchSample(10))
    assert(acc.result.size <= 10)
  }
}
