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

  /** S13 HTTP(S) range transport (reference HttpByteRangeFetcher.java:61,
    * 140-229): HEAD size probe, `Range: bytes=a-b` fetch expecting 206, and
    * bounded exponential-backoff retry on transient failures. Serializable:
    * executors open their own connections.
    */
  final class HttpRangeFetcher(url: String, maxRetries: Int = 3,
      baseBackoffMs: Long = 50L) extends RangeFetcher {

    /** Retries ONLY transient failures — IOException (connect/read/timeout/
      * truncation) and 5xx responses (rethrown as IOException below). 4xx
      * statuses and argument/shape errors (IllegalArgumentException from
      * require) are permanent: they surface immediately with their real
      * cause instead of paying the backoff ladder.
      */
    private def withRetry[A](what: String)(f: => A): A = {
      var attempt = 0
      var lastErr: java.io.IOException = null
      while (attempt <= maxRetries) {
        try return f
        catch {
          case e: java.io.IOException =>
            lastErr = e
            attempt += 1
            if (attempt <= maxRetries) Thread.sleep(baseBackoffMs << (attempt - 1))
        }
      }
      throw new java.io.IOException(
        s"$what failed after ${maxRetries + 1} attempts: $lastErr", lastErr)
    }

    /** 5xx → IOException (retryable); anything else unexpected → permanent. */
    private def checkStatus(code: Int, ok: Int => Boolean, what: String): Unit = {
      if (code >= 500) throw new java.io.IOException(s"$what: HTTP $code")
      require(ok(code), s"$what: HTTP $code")
    }

    def size(): Long = withRetry(s"HEAD $url") {
      val conn = new java.net.URL(url).openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      try {
        conn.setRequestMethod("HEAD")
        conn.setConnectTimeout(5000)
        conn.setReadTimeout(10000)
        checkStatus(conn.getResponseCode, _ == 200, s"HEAD $url")
        val len = conn.getContentLengthLong
        require(len >= 0, s"HEAD $url: no Content-Length")
        len
      } finally conn.disconnect()
    }

    def fetchRange(offset: Long, length: Int): Array[Byte] = withRetry(
      s"GET $url [$offset..${offset + length})") {
      val conn = new java.net.URL(url).openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      try {
        conn.setRequestProperty("Range", s"bytes=$offset-${offset + length - 1}")
        conn.setConnectTimeout(5000)
        conn.setReadTimeout(30000)
        val code = conn.getResponseCode
        checkStatus(code, c => c == 206 || c == 200,
          s"GET $url (no range support?)")
        val in = conn.getInputStream
        try {
          // a 200 means the server ignored the Range header and is sending
          // the FULL body from byte 0 — skip up to `offset` or the returned
          // window would silently be the file head, not the requested range.
          // Truncation mid-stream is transient (server dropped us) →
          // IOException, retried.
          if (code == 200) {
            var toSkip = offset
            while (toSkip > 0) {
              val s = in.skip(toSkip)
              if (s <= 0) throw new java.io.IOException(
                s"GET $url: EOF while skipping to offset $offset")
              toSkip -= s
            }
          }
          val buf = new Array[Byte](length)
          var read = 0
          while (read < length) {
            val r = in.read(buf, read, length - read)
            if (r <= 0) throw new java.io.IOException(s"GET $url: EOF at $offset+$read")
            read += r
          }
          buf
        } finally in.close()
      } finally conn.disconnect()
    }
  }

  /** URI-scheme dispatch (S15, ChunkedTransportIO.create). HTTP is only ever
    * exercised against loopback fixtures in this build (zero-egress sandbox),
    * but the transport itself is the real ranged-fetch client.
    */
  def fetcherFor(url: String): RangeFetcher =
    if (url.startsWith("http://") || url.startsWith("https://"))
      new HttpRangeFetcher(url)
    else if (url.startsWith("file://")) new FileRangeFetcher(url.stripPrefix("file://"))
    else {
      require(!url.contains("://"), s"unsupported transport scheme in $url")
      new FileRangeFetcher(url)
    }

  /** Chunk-scheduling strategies (T3; reference merklev2/schedulers,
    * SCHEDULER_DESIGN.md): in Spark the strategy collapses into "how many
    * consecutive chunks ride one range request" — the requests-vs-bytes
    * trade the reference's four schedulers tune.
    */
  sealed trait ChunkPolicy { def maxRunChunks(totalNeeded: Int): Int }
  object ChunkPolicy {
    /** balanced: small multi-chunk runs */
    case object Default extends ChunkPolicy { def maxRunChunks(n: Int) = 4 }
    /** minimize request count: long runs (may fetch more per failure) */
    case object Aggressive extends ChunkPolicy { def maxRunChunks(n: Int) = 16 }
    /** minimize wasted bytes: one chunk per request */
    case object Conservative extends ChunkPolicy { def maxRunChunks(n: Int) = 1 }
    /** scale run length with the backlog */
    case object Adaptive extends ChunkPolicy {
      def maxRunChunks(n: Int) = math.max(1, math.min(16, n / 32))
    }
  }

  /** Consecutive chunk indices coalesced into runs of at most `maxRun`. */
  def coalesceRuns(needed: Seq[Int], maxRun: Int): Seq[(Int, Int)] = {
    val runs = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    needed.sorted.foreach { idx =>
      runs.lastOption match {
        case Some((s, e)) if idx == e + 1 && (e - s + 1) < maxRun =>
          runs(runs.size - 1) = (s, idx)
        case _ => runs += ((idx, idx))
      }
    }
    runs.toSeq
  }

  /** Prebuffer [offset, offset+length) of `url` into `cachePath`:
    * chunk-resolve via the merkle shape, coalesce needed chunks into range
    * requests per `policy`, fetch+verify+write, return (chunk_idx, valid,
    * error). Chunks in `alreadyValid` are skipped (read-through fast path).
    */
  def prebuffer(
      spark: SparkSession,
      url: String,
      cachePath: String,
      refLeafHashes: Map[Int, String],
      offset: Long,
      length: Long,
      alreadyValid: Set[Int] = Set.empty,
      policy: ChunkPolicy = ChunkPolicy.Default): DataFrame = {

    val fetcher = fetcherFor(url)
    val totalSize = fetcher.size()
    val shape = Merkle.shapeFor(totalSize)
    val lo = (offset / shape.chunkSize).toInt
    val hi = math.min(shape.chunkCount - 1L, (offset + length - 1) / shape.chunkSize).toInt
    val needed = (lo to hi).filterNot(alreadyValid)
    val runs = coalesceRuns(needed, policy.maxRunChunks(needed.size))

    // pre-size the sparse cache file
    val raf = new java.io.RandomAccessFile(cachePath, "rw")
    try raf.setLength(totalSize) finally raf.close()

    import spark.implicits._
    val hashesB = spark.sparkContext.broadcast(refLeafHashes)
    runs.toDS().repartition(math.max(1, math.min(runs.size, 32)))
      .flatMap { case (first, last) =>
        // one range request per run, then per-chunk verify + positioned write
        val start = first.toLong * shape.chunkSize
        val end = math.min((last + 1).toLong * shape.chunkSize, totalSize)
        val fetched: Either[String, Array[Byte]] =
          try Right(fetcher.fetchRange(start, (end - start).toInt))
          catch { case e: Exception => Left(e.toString) }
        (first to last).map { idx =>
          fetched match {
            case Left(err) => (idx, false, s"fetch failed: $err")
            case Right(bytes) =>
              try {
                val cStart = idx.toLong * shape.chunkSize
                val cLen = (math.min(cStart + shape.chunkSize, totalSize) - cStart).toInt
                val chunk = java.util.Arrays.copyOfRange(
                  bytes, (cStart - start).toInt, (cStart - start).toInt + cLen)
                val hash = MessageDigest.getInstance("SHA-256").digest(chunk)
                  .map("%02x".format(_)).mkString
                val expected = hashesB.value.get(idx)
                if (!expected.contains(hash)) {
                  (idx, false, s"hash mismatch: got $hash expected ${expected.getOrElse("?")}")
                } else {
                  val ch = FileChannel.open(Paths.get(cachePath), StandardOpenOption.WRITE)
                  try ch.write(ByteBuffer.wrap(chunk), cStart) finally ch.close()
                  (idx, true, null: String)
                }
              } catch {
                case e: Exception => (idx, false, e.toString)
              }
          }
        }
      }
      .toDF("chunk_idx", "valid", "error")
  }
}
