package graft.operators

import java.nio.channels.FileChannel
import java.nio.file.{Paths, StandardOpenOption}
import java.nio.ByteBuffer
import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Read-through cache materialization (SURVEY.md T1/T2/T6; reference
  * MAFileChannel / streaming_and_caching.md:21-37): resolve a byte range to
  * merkle chunks, fetch the missing chunks, SHA-256-verify each against the
  * reference tree, and write verified bytes into a sparse local cache file.
  *
  * The Spark shape (§3.3): one batch job per prebuffer — executors fetch
  * DISJOINT chunk ranges (positioned writes never overlap), verification
  * failures come back as rows, and the returned validity frame is the
  * BitSet analogue. The transport here is the file:// range fetcher
  * (FileByteRangeFetcher.java); an HTTP fetcher would implement the same
  * `fetchRange` seam (zero-egress container: not exercised).
  */
object Prebuffer {

  /** The ChunkedTransportClient seam (ChunkedTransportIO.java:49). */
  trait RangeFetcher extends Serializable {
    def size(): Long
    def fetchRange(offset: Long, length: Int): Array[Byte]
  }

  final class FileRangeFetcher(path: String) extends RangeFetcher {
    def size(): Long = java.nio.file.Files.size(Paths.get(path))
    def fetchRange(offset: Long, length: Int): Array[Byte] = {
      val ch = FileChannel.open(Paths.get(path), StandardOpenOption.READ)
      try {
        val buf = ByteBuffer.allocate(length)
        var read = 0
        while (read < length) {
          val r = ch.read(buf, offset + read)
          require(r > 0, s"unexpected EOF at $offset+$read")
          read += r
        }
        buf.array()
      } finally ch.close()
    }
  }

  /** URI-scheme dispatch (S15, ChunkedTransportIO.create). */
  def fetcherFor(url: String): RangeFetcher = {
    val file = if (url.startsWith("file://")) url.stripPrefix("file://") else url
    require(!url.contains("://") || url.startsWith("file://"),
      s"unsupported transport scheme in $url (zero-egress build: file only)")
    new FileRangeFetcher(file)
  }

  /** Prebuffer [offset, offset+length) of `url` into `cachePath`:
    * chunk-resolve via the merkle shape, fetch+verify+write each needed
    * chunk, return (chunk_idx, valid, error). Chunks already marked valid
    * in `alreadyValid` are skipped (the read-through fast path).
    */
  def prebuffer(
      spark: SparkSession,
      url: String,
      cachePath: String,
      refLeafHashes: Map[Int, String],
      offset: Long,
      length: Long,
      alreadyValid: Set[Int] = Set.empty): DataFrame = {

    val fetcher = fetcherFor(url)
    val totalSize = fetcher.size()
    val shape = Merkle.shapeFor(totalSize)
    val lo = (offset / shape.chunkSize).toInt
    val hi = math.min(shape.chunkCount - 1L, (offset + length - 1) / shape.chunkSize).toInt
    val needed = (lo to hi).filterNot(alreadyValid)

    // pre-size the sparse cache file
    val raf = new java.io.RandomAccessFile(cachePath, "rw")
    try raf.setLength(totalSize) finally raf.close()

    import spark.implicits._
    val hashesB = spark.sparkContext.broadcast(refLeafHashes)
    needed.toDS().repartition(math.max(1, math.min(needed.size, 32)))
      .map { idx =>
        try {
          val start = idx.toLong * shape.chunkSize
          val len = math.min(shape.chunkSize, totalSize - start).toInt
          val bytes = fetcher.fetchRange(start, len)
          val hash = MessageDigest.getInstance("SHA-256").digest(bytes)
            .map("%02x".format(_)).mkString
          val expected = hashesB.value.get(idx)
          if (!expected.contains(hash)) {
            (idx, false, s"hash mismatch: got $hash expected ${expected.getOrElse("?")}")
          } else {
            val ch = FileChannel.open(Paths.get(cachePath), StandardOpenOption.WRITE)
            try ch.write(ByteBuffer.wrap(bytes), start) finally ch.close()
            (idx, true, null: String)
          }
        } catch {
          case e: Exception => (idx, false, e.toString)
        }
      }
      .toDF("chunk_idx", "valid", "error")
  }
}
