package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Hnsw

/** Streaming HNSW ingest contracts: any batching of arriving vectors
  * rebuilds the bundle into exactly the from-scratch build over
  * everything ingested so far (ascending-id insertion is
  * arrival-order-free); a second drain over the same bundle RESUMES from
  * the checkpoint (only new files ingest); and a replayed append is a
  * no-op (the dedup-by-id idempotency the at-least-once foreachBatch
  * contract needs).
  */
class StreamHnswSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 16

  private def vec(i: Long): Array[Float] = {
    val c = (i % 4).toInt
    Array.tabulate(dim) { j =>
      val center = if (j == c) 4f else 0f
      val jit = ((graft.functions.StableHash.fnv64(s"shnsw:$i:$j") >>> 12).toDouble /
        (1L << 52) * 2 - 1).toFloat
      center + 0.3f * jit
    }
  }

  private def frame(ids: Seq[Long]) =
    ids.map(i => (i, vec(i).toSeq)).toDF("vec_id", "embedding")

  private lazy val centroids = (0 until 4)
    .map(c => (c.toLong, Array.tabulate(dim)(j => if (j == c) 4f else 0f).toSeq))
    .toDF("vec_id", "embedding")

  private def canon(df: org.apache.spark.sql.DataFrame) = df
    .select(col("cell").cast("long"), col("id"), col("nbrs"))
    .collect().map(r => (r.getLong(0), r.getLong(1),
      r.getAs[Seq[Long]](2).sorted.mkString(","))).toSet

  test("growing-source resume: two drains over one bundle == from-scratch build") {
    val inDir = java.nio.file.Files.createTempDirectory("hnsw-stream-in").toString
    val bundle = java.nio.file.Files.createTempDirectory("hnsw-stream-b").toString + "/b"
    // seed the bundle with the first 40 vectors, then stream two waves
    Hnsw.writeBundle(
      Hnsw.hnswIndex(frame(0L until 40L), centroids, m = 4, efConstruction = 16),
      centroids, bundle)
    def stream() = spark.readStream.schema(frame(Seq(0L)).schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(inDir)
    frame(40L until 70L).coalesce(1).write.parquet(s"$inDir/w1")
    StreamHnsw.appendToBundle(stream(), bundle, m = 4, efConstruction = 16)
    assert(canon(spark.read.parquet(s"$bundle/cells")) ==
      canon(Hnsw.hnswIndex(frame(0L until 70L), centroids, m = 4,
        efConstruction = 16)), "first drain diverged from from-scratch")
    // the source GROWS; the second drain must ingest ONLY the new wave
    // (checkpoint resume — a re-ingest of w1 would still be idempotent,
    // but offsets prove the resume)
    frame(70L until 100L).coalesce(1).write.parquet(s"$inDir/w2")
    StreamHnsw.appendToBundle(stream(), bundle, m = 4, efConstruction = 16)
    assert(canon(spark.read.parquet(s"$bundle/cells")) ==
      canon(Hnsw.hnswIndex(frame(0L until 100L), centroids, m = 4,
        efConstruction = 16)), "resume drain diverged from from-scratch")
  }

  test("replayed append is a no-op (idempotency under at-least-once delivery)") {
    val bundle = java.nio.file.Files.createTempDirectory("hnsw-replay").toString + "/b"
    Hnsw.writeBundle(
      Hnsw.hnswIndex(frame(0L until 40L), centroids, m = 4, efConstruction = 16),
      centroids, bundle)
    val slice = frame(40L until 60L)
    Hnsw.appendToBundle(slice, bundle, m = 4, efConstruction = 16)
    val once = canon(spark.read.parquet(s"$bundle/cells"))
    Hnsw.appendToBundle(slice, bundle, m = 4, efConstruction = 16) // replay
    val twice = canon(spark.read.parquet(s"$bundle/cells"))
    assert(once == twice, "replayed append changed the bundle")
    assert(once == canon(Hnsw.hnswIndex(frame(0L until 60L), centroids,
      m = 4, efConstruction = 16)))
  }
}
