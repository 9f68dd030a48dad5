package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.SparkSpec

/** Streaming crawl-ingest contracts: a bounded shard directory drains to
  * exactly the batch read (AvailableNow), a second drain over the same
  * checkpoint picks up ONLY newly-landed shards (exactly-once),
  * maxFilesPerTrigger bounds micro-batches at the shard granularity, and
  * a shard violating the sorted-arrival contract fails loudly.
  */
class WarcStreamSpec extends SparkSpec {
  import spark.implicits._

  private def shard(dir: String, name: String, tag: String, n: Int): Unit =
    WarcIO.write((0 until n).map(i =>
      (s"http://example.com/$tag/$i",
        s"<p>Shard $tag record $i with enough characters to matter.</p>"))
      .toDF("url", "payload"), s"$dir/$name")

  private def drain(dir: String, ckpt: String, sink: String,
      options: Map[String, String] = Map.empty): Unit = {
    var reader = spark.readStream.format("warc")
    options.foreach { case (k, v) => reader = reader.option(k, v) }
    val q = reader.load(dir)
      .selectExpr("url", "text")
      .writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "AvailableNow drain timed out")
  }

  test("AvailableNow drain over a bounded shard directory equals the batch read") {
    val base = Files.createTempDirectory("graft-warcstream").toString
    val dir = s"$base/in"; Files.createDirectories(java.nio.file.Paths.get(dir))
    shard(dir, "a.warc", "a", 5)
    shard(dir, "b.warc", "b", 7)
    drain(dir, s"$base/ckpt", s"$base/out")
    val streamed = spark.read.parquet(s"$base/out")
      .collect().map(r => r.getString(0) -> r.getString(1)).toSet
    val batch = WarcIO.read(spark, dir).selectExpr("url", "text")
      .collect().map(r => r.getString(0) -> r.getString(1)).toSet
    assert(streamed == batch)
    assert(streamed.size == 12)
  }

  test("second drain on the same checkpoint reads ONLY the new shard (exactly-once)") {
    val base = Files.createTempDirectory("graft-warcstream2").toString
    val dir = s"$base/in"; Files.createDirectories(java.nio.file.Paths.get(dir))
    shard(dir, "s0.warc", "x", 4)
    drain(dir, s"$base/ckpt", s"$base/out")
    // a new shard lands (name sorts after the consumed one)
    shard(dir, "s1.warc", "y", 6)
    drain(dir, s"$base/ckpt", s"$base/out")
    val rows = spark.read.parquet(s"$base/out")
      .collect().map(_.getString(0))
    assert(rows.length == 10, s"exactly-once: 4 + 6 rows, got ${rows.length}")
    assert(rows.distinct.length == 10, "no record delivered twice")
  }

  test("maxFilesPerTrigger bounds each micro-batch at the shard granularity") {
    val base = Files.createTempDirectory("graft-warcstream3").toString
    val dir = s"$base/in"; Files.createDirectories(java.nio.file.Paths.get(dir))
    (0 until 4).foreach(i => shard(dir, s"p$i.warc", s"p$i", 3))
    val q = spark.readStream.format("warc")
      .option("maxFilesPerTrigger", "1").load(dir)
      .selectExpr("url")
      .writeStream.format("memory").queryName("warc_mft")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000))
    assert(spark.table("warc_mft").count() == 12)
    val nonEmpty = q.recentProgress.filter(_.numInputRows > 0)
    assert(nonEmpty.length == 4, s"one shard per micro-batch: " +
      nonEmpty.map(_.numInputRows).mkString(","))
    assert(nonEmpty.forall(_.numInputRows == 3))
  }

  test("a shard sorting into the consumed prefix fails loudly") {
    val base = Files.createTempDirectory("graft-warcstream4").toString
    val dir = s"$base/in"; Files.createDirectories(java.nio.file.Paths.get(dir))
    shard(dir, "m.warc", "m", 2)
    val q1 = spark.readStream.format("warc").load(dir).selectExpr("url")
      .writeStream.format("memory").queryName("warc_guard")
      .option("checkpointLocation", s"$base/ckpt")
      .outputMode(OutputMode.Append()).start()
    try {
      q1.processAllAvailable()
      // violates the contract: sorts BEFORE the consumed m.warc
      shard(dir, "a.warc", "early", 2)
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q1.processAllAvailable()
        q1.awaitTermination(10000)
      }
      assert(e.getMessage.contains("non-append-only") ||
        Option(e.getCause).exists(_.getMessage.contains("non-append-only")))
    } finally q1.stop()
  }

  test("batch read through the same table equals WarcIO.read") {
    val base = Files.createTempDirectory("graft-warcstream5").toString
    val dir = s"$base/in"; Files.createDirectories(java.nio.file.Paths.get(dir))
    shard(dir, "a.warc", "a", 3)
    val viaSource = spark.read.format("warc").load(dir)
      .selectExpr("url", "text", "offset").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val viaIo = WarcIO.read(spark, dir).selectExpr("url", "text", "offset")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(viaSource == viaIo)
  }
}
