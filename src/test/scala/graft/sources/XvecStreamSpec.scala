package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.sources.xvec.{XvecFormat, XvecIO}

/** S7/T5: `readStream.format("xvec")` — bounded file == batch, appended
  * records arrive as a NEW batch only (exactly-once record delivery across
  * triggers via ordinal offsets).
  */
class XvecStreamSpec extends SparkSpec {

  private def vecs(lo: Int, hi: Int, dim: Int): Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(17)
    val all = (0 until hi).map(i => (i.toLong, Array.fill(dim)(rnd.nextFloat())))
    all.slice(lo, hi)
  }

  test("bounded xvec stream equals the batch read") {
    import spark.implicits._
    val path = Files.createTempDirectory("xvstream").toString + "/s.fvec"
    XvecIO.write(vecs(0, 500, 8).toDF("ordinal", "vector"), path)

    val q = spark.readStream.format("xvec").load(path)
      .writeStream.format("memory").queryName("xvs1")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)

    val streamed = spark.table("xvs1").orderBy("ordinal").collect()
    val batch = spark.read.format("xvec").load(path).orderBy("ordinal").collect()
    assert(streamed.length == 500)
    streamed.zip(batch).foreach { case (a, b) =>
      assert(a.getLong(0) == b.getLong(0))
      assert(a.getSeq[Float](1) == b.getSeq[Float](1))
    }
  }

  test("appended records arrive exactly once in the next trigger") {
    import spark.implicits._
    val path = Files.createTempDirectory("xvstream2").toString + "/s.fvec"
    XvecIO.write(vecs(0, 300, 8).toDF("ordinal", "vector"), path)

    val stream = spark.readStream.format("xvec").load(path)
      .writeStream.format("memory").queryName("xvs2")
    val q1 = stream.trigger(Trigger.AvailableNow()).start()
    q1.awaitTermination(60000)
    assert(spark.table("xvs2").count() == 300)

    // append the byte tail (records 300..450) directly — xvec is a bare
    // record concatenation, so append = concatenate encodings
    val fmt = XvecFormat.forPath(path)
    val tail = Files.createTempFile("tail", ".fvec").toString
    XvecIO.write(vecs(300, 450, 8).toDF("ordinal", "vector"), tail)
    val out = new java.io.FileOutputStream(path, true)
    try out.write(Files.readAllBytes(java.nio.file.Paths.get(tail)))
    finally out.close()

    // restarting from the checkpointless memory sink re-reads from 0; use a
    // fresh query but assert the offset log semantics instead: a second
    // AvailableNow pass over the grown file sees all 450, and the planned
    // batch for [300, 450) alone yields exactly the appended records
    val q2 = spark.readStream.format("xvec").load(path)
      .writeStream.format("memory").queryName("xvs3")
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination(60000)
    assert(spark.table("xvs3").count() == 450)

    val stream2 = new graft.sources.xvec.XvecMicroBatchStream(
      path, fmt, graft.layout.FWindow.ALL, Seq("ordinal", "vector"))
    val parts = stream2.planInputPartitions(
      graft.sources.xvec.XvecOffset(300), stream2.latestOffset())
    val lo = parts.map(_.asInstanceOf[graft.sources.xvec.XvecInputPartition].recordStart).min
    val hi = parts.map(_.asInstanceOf[graft.sources.xvec.XvecInputPartition].recordEnd).max
    assert((lo, hi) == (300L, 450L))
  }

  test("AvailableNow honors maxRecordsPerTrigger: multi-batch drain, once each") {
    import spark.implicits._
    val path = Files.createTempDirectory("xvstream5").toString + "/s.fvec"
    XvecIO.write(vecs(0, 500, 8).toDF("ordinal", "vector"), path)
    val q = spark.readStream.format("xvec")
      .option("maxRecordsPerTrigger", "150").load(path)
      .writeStream.format("memory").queryName("xvs5")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    // 500 records at <=150/batch: 4 micro-batches, every record exactly once
    assert(q.recentProgress.count(_.numInputRows > 0) == 4)
    assert(q.recentProgress.map(_.numInputRows).filter(_ > 0).max <= 150)
    val got = spark.table("xvs5").agg(
      count(lit(1)), countDistinct(col("ordinal")), max("ordinal")).collect()(0)
    assert((got.getLong(0), got.getLong(1), got.getLong(2)) == (500L, 500L, 499L))
  }

  test("native AvailableNow snapshots the end offset at query start") {
    val path = Files.createTempDirectory("xvstream6").toString + "/s.fvec"
    val fmt = XvecFormat.forPath(path)
    import spark.implicits._
    XvecIO.write(vecs(0, 200, 8).toDF("ordinal", "vector"), path)
    val stream = new graft.sources.xvec.XvecMicroBatchStream(
      path, fmt, graft.layout.FWindow.ALL, Seq("ordinal", "vector"))
    stream.prepareForTriggerAvailableNow() // snapshot: 200 records
    // the file grows AFTER query start
    val tail = Files.createTempFile("tail6", ".fvec").toString
    XvecIO.write(vecs(200, 260, 8).toDF("ordinal", "vector"), tail)
    val out = new java.io.FileOutputStream(path, true)
    try out.write(Files.readAllBytes(java.nio.file.Paths.get(tail)))
    finally out.close()
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val end = stream.latestOffset(graft.sources.xvec.XvecOffset(0), ReadLimit.allAvailable())
    assert(end.asInstanceOf[graft.sources.xvec.XvecOffset].record == 200L,
      "AvailableNow run must drain to the snapshot, not chase the growing file")
    // the un-snapshot admission path and the progress report see the growth
    assert(stream.reportLatestOffset()
      .asInstanceOf[graft.sources.xvec.XvecOffset].record == 260L)
  }

  test("window option bounds the streamed ordinals") {
    import spark.implicits._
    val path = Files.createTempDirectory("xvstream3").toString + "/s.fvec"
    XvecIO.write(vecs(0, 400, 4).toDF("ordinal", "vector"), path)
    val q = spark.readStream.format("xvec").option("window", "[50..120)").load(path)
      .writeStream.format("memory").queryName("xvs4")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val got = spark.table("xvs4").agg(count(lit(1)), min("ordinal"), max("ordinal")).collect()(0)
    assert((got.getLong(0), got.getLong(1), got.getLong(2)) == (70L, 50L, 119L))
  }
}
