package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.layout.{Durations, GraftDataset}
import graft.operators.{Describe, Merkle, Prebuffer}
import graft.sources.xvec.{XvecFormat, XvecIO}

class MiscSourcesSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String = {
    Files.createDirectories(Paths.get("target", "tmp-misc"))
    s"target/tmp-misc/$name-${System.nanoTime()}"
  }

  test("CsvJsonArray: auto-detects the vector column and the header row") {
    val p = tmp("vecs") + ".csv"
    Files.write(Paths.get(p),
      """id,label,embedding
        |1,cat,"[0.1, 0.2, 0.3]"
        |2,dog,"[0.4, 0.5, 0.6]"
        |""".stripMargin.getBytes)
    val det = CsvJsonArray.detect(spark, p)
    assert(det.hasHeader && det.vectorColumn == 2)
    val df = CsvJsonArray.read(spark, p)
    assert(df.count() == 2)
    val row = df.filter(col("id") === "1").select("vector").collect()(0).getSeq[Float](0)
    assert(row == Seq(0.1f, 0.2f, 0.3f))
  }

  test("CsvJsonArray: headerless file and multi-array rejection") {
    val p = tmp("nohead") + ".csv"
    Files.write(Paths.get(p), "1,\"[1.0, 2.0]\"\n2,\"[3.0, 4.0]\"\n".getBytes)
    val det = CsvJsonArray.detect(spark, p)
    assert(!det.hasHeader && det.vectorColumn == 1)

    val bad = tmp("two") + ".csv"
    Files.write(Paths.get(bad), "\"[1.0]\",\"[2.0]\"\n".getBytes)
    intercept[IllegalArgumentException](CsvJsonArray.detect(spark, bad))
  }

  test("VectorSinks: json/csv/yaml forms round-trip content") {
    val df = (0 until 10).map(i => (i.toLong, Seq(i.toFloat, i + 0.5f))).toDF("ordinal", "vector")
    val jsonPath = tmp("json")
    VectorSinks.writeJson(df, jsonPath)
    val back = spark.read.json(jsonPath)
    assert(back.count() == 10)

    val csvPath = tmp("csv")
    VectorSinks.writeCsv(df, csvPath)
    val csv = spark.read.csv(csvPath).collect()
    assert(csv.length == 10 && csv.forall(_.getString(1).startsWith("[")))

    val yamlPath = tmp("yaml") + ".yaml"
    VectorSinks.writeYaml(df, yamlPath)
    val lines = scala.io.Source.fromFile(yamlPath).getLines().toSeq
    assert(lines.size == 10 && lines.head == "- [0.0, 0.5]")
  }

  test("Durations: compound specs and unit labels (F3)") {
    assert(Durations.nanosFor("1h30m").contains(5400L * 1000000000L))
    assert(Durations.millisFor("250ms").contains(250L))
    assert(Durations.secondsFor("90").contains(90L))
    assert(Durations.microsFor("5µs").contains(5L))
    assert(Durations.minutesFor("2h").contains(120L))
    assert(Durations.nanosFor("1w").contains(604800L * 1000000000L))
    assert(Durations.nanosFor("garbage").isEmpty)
  }

  test("Prebuffer: fetch+verify+cache with corruption detection (T1/T2)") {
    // build a source file + its merkle leaf hashes
    val src = tmp("src") + ".bin"
    val content = Array.tabulate(3000)(i => (i % 157).toByte)
    Files.write(Paths.get(src), content)
    val (shape, chunks) = Merkle.chunkFile(spark, src)
    val leaves = Merkle.leafHashes(chunks).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap

    val cache = tmp("cache") + ".bin"
    val result = Prebuffer.prebuffer(spark, s"file://$src", cache, leaves,
      offset = 0, length = content.length.toLong)
    val rows = result.collect()
    assert(rows.forall(_.getBoolean(1)), rows.mkString(","))
    assert(Files.readAllBytes(Paths.get(cache)).toSeq == content.toSeq)

    // corrupt expectation -> verification must fail, cache untouched for that chunk
    val cache2 = tmp("cache2") + ".bin"
    val badLeaves = leaves.map { case (k, _) => k -> ("0" * 64) }
    val bad = Prebuffer.prebuffer(spark, s"file://$src", cache2, badLeaves,
      offset = 0, length = content.length.toLong).collect()
    assert(bad.forall(r => !r.getBoolean(1) && r.getString(2).contains("hash mismatch")))
  }

  test("Describe: facet summary over a dataset dir (A3)") {
    val dir = Paths.get("target", "ds-desc-" + System.nanoTime())
    Files.createDirectories(dir)
    XvecFormat.writeLocal(s"$dir/base.fvec", XvecFormat.Fvec,
      (0 until 30).map(i => Seq[Any](i.toFloat, i * 2f, 0f)).iterator)
    Files.write(dir.resolve("dataset.yaml"),
      """attributes:
        |  distance_function: COSINE
        |profiles:
        |  default:
        |    base: base.fvec
        |""".stripMargin.getBytes)
    val ds = GraftDataset.load(spark, dir.toString)
    val desc = Describe.dataset(spark, ds, "default", detailed = true).collect()
    assert(desc.length == 1)
    val r = desc(0)
    assert(r.getString(0) == "base_vectors" && r.getLong(1) == 30 && r.getInt(2) == 3)
    assert(!r.getDouble(3).isNaN)
    assert(r.getString(4).contains("distance_function=COSINE"))
  }
}
