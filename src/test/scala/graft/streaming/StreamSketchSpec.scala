package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.SparkSpec
import graft.functions.HashMode
import graft.operators.{Bloom, Cms}

/** The sketch monoid property under streaming ingest: a foreachBatch
  * merge of per-micro-batch grids/bit-arrays equals the one-shot batch
  * build ARRAY-FOR-ARRAY, however the rows are batched — and a probe
  * against the merged sketch equals the batch probe.
  */
class StreamSketchSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = (0L until 90L).map { i =>
    (i, if (i % 3 == 0) "alpha beta gamma common common"
        else s"unique u$i v${i % 7} w${i % 11} tail words")
  }

  private def drainBatches[A](acc: (org.apache.spark.sql.DataFrame, Long) => Unit,
      batches: Seq[Seq[(Long, String)]]): Unit = {
    val mem = MemoryStream[(Long, String)](spark)
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch(acc)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
  }

  test("streamed CMS grid merge equals the batch build, any batching") {
    for (mode <- Seq(HashMode.Md5, HashMode.Xx64)) {
      val batchToks = corpus.toDF("doc_id", "text")
        .select(explode(split(lower(col("text")), " ")).as("term"))
        .filter(col("term") =!= "")
      val want = Cms.build(batchToks, "term", depth = 3, width = 256, mode)
      for (split3 <- Seq(Seq(corpus), Seq(corpus.take(1), corpus.drop(1)),
          Seq(corpus.take(30), corpus.slice(30, 31), corpus.drop(31)))) {
        val acc = new StreamSketch.CmsAccumulator(3, 256, mode)
        drainBatches((b, _) => acc.add(
          b.select(explode(org.apache.spark.sql.functions.split(
            lower(col("text")), " ")).as("term")).filter(col("term") =!= ""),
          "term"), split3)
        assert(acc.grid.toSeq == want.toSeq,
          s"mode=${mode.name} batching=${split3.map(_.size)}")
      }
    }
  }

  test("streamed Misra-Gries build yields the identical guaranteed-heavy set, any batching") {
    import graft.operators.Freq
    val toks = corpus.toDF("doc_id", "text")
      .select(explode(split(lower(col("text")), " ")).as("term"))
      .filter(col("term") =!= "")
    val k = 4
    val want = Freq.guaranteedHeavy(toks, "term", k)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for (split3 <- Seq(Seq(corpus), Seq(corpus.take(7), corpus.drop(7)),
        Seq(corpus.take(30), corpus.slice(30, 31), corpus.drop(31)))) {
      val acc = new Freq.MgAcc(k)
      drainBatches((b, _) => {
        val t = b.select(explode(org.apache.spark.sql.functions.split(
          lower(col("text")), " ")).as("term")).filter(col("term") =!= "")
        acc.merge(Freq.mgSummary(t, "term", k)); ()
      }, split3)
      assert(acc.n == toks.count())
      val got = Freq.guaranteedHeavyFrom(acc, toks, "term", k)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == want, s"batching=${split3.map(_.size)}")
    }
  }

  test("streamed Bloom bit merge equals the batch build; probes agree") {
    val want = Bloom.build(corpus.toDF("doc_id", "text"), "text",
      n = 3, mBits = 1 << 12, kProbes = 3)
    val acc = new StreamSketch.BloomAccumulator(1 << 12, 3, 3)
    drainBatches((b, _) => acc.add(b, "text"),
      Seq(corpus.take(40), corpus.drop(40)))
    assert(acc.bits.toSeq == want.toSeq)
    // a containment probe against the merged filter == against the batch one
    val probeDocs = Seq((500L, "alpha beta gamma common probe")).toDF("doc_id", "text")
    val a = Bloom.containmentScores(probeDocs, acc.bits, "doc_id", "text",
      n = 3, kProbes = 3).collect().map(_.toSeq).toSeq
    val bScores = Bloom.containmentScores(probeDocs, want, "doc_id", "text",
      n = 3, kProbes = 3).collect().map(_.toSeq).toSeq
    assert(a == bScores)
  }

  test("cmsFromStream/bloomFromStream drain a file stream to batch parity") {
    val dir = java.nio.file.Files.createTempDirectory("sketch-stream").toString
    corpus.toDF("doc_id", "text").write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val grid = StreamSketch.cmsFromStream(
      stream.select(explode(split(lower(col("text")), " ")).as("term"))
        .filter(col("term") =!= ""),
      "term", depth = 3, width = 256)
    val batchToks = spark.read.parquet(dir)
      .select(explode(split(lower(col("text")), " ")).as("term"))
      .filter(col("term") =!= "")
    assert(grid.toSeq == Cms.build(batchToks, "term", 3, 256).toSeq)
    val bits = StreamSketch.bloomFromStream(
      spark.readStream.schema(schema).parquet(dir), "text",
      n = 3, mBits = 1 << 12, kProbes = 3)
    assert(bits.toSeq == Bloom.build(spark.read.parquet(dir), "text",
      3, 1 << 12, 3).toSeq)
  }
}
