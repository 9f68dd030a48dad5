package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Ann

/** Streaming IVF probe == batch IVF search, under any batching of the
  * query stream (queries are independent; the index is frozen).
  */
class StreamAnnSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb =
    graft.Tables.embeddings(spark, "/root/testdata/sf0.001").cache()

  test("multi-batch file-streamed probes union to the exact batch search") {
    val centroids = emb.filter(col("vec_id") < 8)
    val index = Ann.ivfIndex(emb, centroids)
    val queries = emb.filter(col("vec_id") >= 50 && col("vec_id") < 70)

    val want = Ann.ivfSearch(queries, index, centroids, k = 4, nProbe = 3,
        excludeSelf = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

    // 4 separate files => 4 micro-batches under maxFilesPerTrigger=1
    val inDir = java.nio.file.Files.createTempDirectory("ann-stream-in").toString
    val outDir = java.nio.file.Files.createTempDirectory("ann-stream-out").toString + "/r"
    (0 until 4).foreach { i =>
      queries.filter(col("vec_id") % 4 === i)
        .coalesce(1).write.parquet(s"$inDir/part$i")
    }
    val stream = spark.readStream.schema(emb.schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(inDir)
    StreamAnn.ivfSearchToPath(stream, index, centroids, k = 4, nProbe = 3,
      outPath = outDir, excludeSelf = true)

    val got = spark.read.parquet(outDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == want)
  }

  test("multi-batch streamed ingest builds exactly the batch index (with metadata)") {
    val centroids = emb.filter(col("vec_id") < 8)
    val want = Ann.ivfIndexWithMeta(emb, centroids, metaCols = Seq("label"))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getInt(3))).toSet

    val inDir = java.nio.file.Files.createTempDirectory("ivf-append-in").toString
    val outDir = java.nio.file.Files.createTempDirectory("ivf-append-out").toString + "/ix"
    (0 until 3).foreach { i =>
      emb.filter(col("vec_id") % 3 === i).coalesce(1).write.parquet(s"$inDir/part$i")
    }
    val stream = spark.readStream.schema(emb.schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(inDir)
    StreamAnn.ivfAppendToPath(stream, centroids, outDir, metaCols = Seq("label"))

    val got = spark.read.parquet(outDir)
      .select("id", "cell", "label")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == want)

    // a replayed batch overwrites its own subpath: rerunning batch 0's
    // write must leave the index row set unchanged (retry idempotence)
    val b0 = emb.filter(col("vec_id") % 3 === 0)
    Ann.ivfIndexWithMeta(b0, centroids, metaCols = Seq("label"))
      .write.mode("overwrite").parquet(s"$outDir/batch=0")
    val again = spark.read.parquet(outDir)
      .select("id", "cell", "label")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(again == want)
  }

  test("second invocation over the same outPath after a partial drain RESUMES batch numbering") {
    val centroids = emb.filter(col("vec_id") < 8)
    val inDir = java.nio.file.Files.createTempDirectory("ivf-resume-in").toString
    val outDir = java.nio.file.Files.createTempDirectory("ivf-resume-out").toString + "/ix"
    def stream() = spark.readStream.schema(emb.schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(inDir)

    // run 1: drain the first two thirds (two files => batches 0 and 1)
    (0 until 2).foreach { i =>
      emb.filter(col("vec_id") % 3 === i).coalesce(1).write.parquet(s"$inDir/part$i")
    }
    StreamAnn.ivfAppendToPath(stream(), centroids, outDir, metaCols = Seq("label"))
    val afterFirst = spark.read.parquet(outDir)
      .select("batch").distinct().as[Long].collect().toSet
    assert(afterFirst == Set(0L, 1L))

    // run 2 over the SAME outPath: the checkpoint under outPath/_checkpoint
    // makes this a resume — already-drained files are NOT replayed, the new
    // file lands as batch 2, and the union equals the from-scratch index.
    emb.filter(col("vec_id") % 3 === 2).coalesce(1).write.parquet(s"$inDir/part2")
    StreamAnn.ivfAppendToPath(stream(), centroids, outDir, metaCols = Seq("label"))
    val batches = spark.read.parquet(outDir)
      .select("batch").distinct().as[Long].collect().toSet
    assert(batches == Set(0L, 1L, 2L),
      s"rerun must continue numbering, not restart from 0: $batches")
    val got = spark.read.parquet(outDir)
      .select("id", "cell", "label")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val want = Ann.ivfIndexWithMeta(emb, centroids, metaCols = Seq("label"))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getInt(3))).toSet
    assert(got == want)

    // batch output without a checkpoint fails loudly instead of renumbering
    val foreign = java.nio.file.Files.createTempDirectory("ivf-foreign").toString + "/ix"
    spark.read.parquet(s"$outDir/batch=0").write.parquet(s"$foreign/batch=0")
    val e = intercept[IllegalStateException](
      StreamAnn.ivfAppendToPath(stream(), centroids, foreign))
    assert(e.getMessage.contains("no _checkpoint"))
  }
}
