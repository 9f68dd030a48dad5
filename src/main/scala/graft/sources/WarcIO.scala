package graft.sources

import java.io.{BufferedInputStream, ByteArrayOutputStream, FileInputStream}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** WARC (ISO 28500 — the Common Crawl container format) read/write: the
  * ingestion seam in front of [[graft.operators.HtmlExtract]], so a raw
  * crawl goes WARC → main text → quality/dedup entirely in-engine.
  *
  * Record grammar (public spec): a version line `WARC/1.0`, CRLF-
  * terminated `Name: value` headers (`WARC-Type`, `WARC-Target-URI`,
  * `Content-Length`, …), one blank line, `Content-Length` payload bytes,
  * and a CRLF CRLF record separator. `response` payloads are full HTTP
  * messages — the reader strips the HTTP status line + headers when the
  * payload starts with `HTTP/`, handing back the body a curation
  * pipeline wants.
  *
  * Scale shape: crawl corpora ship as MANY ~1 GB WARC files, so
  * FILE-level parallelism is the natural distribution — the reader
  * parallelizes the file list and each task scans its file sequentially
  * (records are variable-length and must be walked; Common Crawl's own
  * tooling does the same). Per-record gzip members (`.warc.gz`) are
  * decompressed via the JDK GZIPInputStream's multi-member mode.
  * Malformed trailing garbage fails LOUDLY (a truncated crawl shard must
  * not silently shorten the corpus).
  */
object WarcIO {

  final case class WarcRecord(file: String, warc_type: String, url: String,
      content_length: Long, payload: String)

  private def readRecords(path: String): Iterator[WarcRecord] = {
    val raw = new BufferedInputStream(new FileInputStream(path), 1 << 16)
    val in: java.io.InputStream =
      if (path.endsWith(".gz"))
        new java.util.zip.GZIPInputStream(raw, 1 << 16)
      else raw

    // line reader over the stream that leaves payload bytes untouched
    def readLine(): String = {
      val buf = new ByteArrayOutputStream(128)
      var b = in.read()
      if (b < 0) return null
      while (b >= 0 && b != '\n') { buf.write(b); b = in.read() }
      val s = buf.toString(StandardCharsets.UTF_8.name())
      if (s.endsWith("\r")) s.dropRight(1) else s
    }

    def readFully(n: Long): Array[Byte] = {
      require(n <= Int.MaxValue, s"$path: record payload too large ($n)")
      val out = new Array[Byte](n.toInt)
      var off = 0
      while (off < n) {
        val r = in.read(out, off, n.toInt - off)
        require(r > 0, s"$path: EOF inside a $n-byte payload at $off")
        off += r
      }
      out
    }

    new Iterator[WarcRecord] {
      private var nextRec: WarcRecord = advance()
      private def advance(): WarcRecord = {
        // skip inter-record blank lines
        var line = readLine()
        while (line != null && line.isEmpty) line = readLine()
        if (line == null) { in.close(); return null }
        require(line.startsWith("WARC/"),
          s"$path: expected a WARC version line, got: ${line.take(60)}")
        var wtype = ""
        var url = ""
        var len = -1L
        var h = readLine()
        while (h != null && h.nonEmpty) {
          val i = h.indexOf(':')
          require(i > 0, s"$path: malformed WARC header: ${h.take(60)}")
          val (k, v) = (h.substring(0, i).trim.toLowerCase, h.substring(i + 1).trim)
          k match {
            case "warc-type" => wtype = v
            case "warc-target-uri" => url = v
            case "content-length" => len = v.toLong
            case _ =>
          }
          h = readLine()
        }
        require(len >= 0, s"$path: record without Content-Length")
        val body = readFully(len)
        var payload = new String(body, StandardCharsets.UTF_8)
        // response records carry a full HTTP message — strip its envelope
        if (payload.startsWith("HTTP/")) {
          val sep = payload.indexOf("\r\n\r\n")
          if (sep >= 0) payload = payload.substring(sep + 4)
        }
        WarcRecord(path, wtype, url, len, payload)
      }
      def hasNext: Boolean = nextRec != null
      def next(): WarcRecord = {
        val r = nextRec; nextRec = advance(); r
      }
    }
  }

  /** Read one or more WARC files (a directory lists `*.warc`/`*.warc.gz`)
    * into (file, warc_type, url, content_length, payload) — one task per
    * file, the crawl corpus's natural parallelism.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val f = new java.io.File(path)
    val files: Seq[String] =
      if (f.isDirectory)
        f.listFiles().filter(x => x.getName.endsWith(".warc") ||
          x.getName.endsWith(".warc.gz")).map(_.getPath).sorted.toSeq
      else Seq(path)
    require(files.nonEmpty, s"no WARC files under $path")
    spark.sparkContext.parallelize(files, files.size)
      .flatMap(readRecords)
      .toDF()
  }

  /** Write (url, payload) rows as one WARC file of `response` records
    * with a minimal HTTP 200 envelope (the round-trip twin of [[read]];
    * single local file — the xvec writer convention, one partition in
    * flight via toLocalIterator).
    */
  def write(df: DataFrame, path: String,
      urlCol: String = "url", payloadCol: String = "payload"): Long = {
    val it = df.select(col(urlCol), col(payloadCol)).toLocalIterator()
    val out = new java.io.BufferedOutputStream(
      Files.newOutputStream(Paths.get(path)), 1 << 16)
    var n = 0L
    try {
      while (it.hasNext) {
        val r = it.next()
        val body = r.getString(1).getBytes(StandardCharsets.UTF_8)
        val http = ("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n" +
          s"Content-Length: ${body.length}\r\n\r\n").getBytes(StandardCharsets.UTF_8)
        val head = (s"WARC/1.0\r\nWARC-Type: response\r\n" +
          s"WARC-Target-URI: ${r.getString(0)}\r\n" +
          s"Content-Length: ${http.length + body.length}\r\n\r\n")
          .getBytes(StandardCharsets.UTF_8)
        out.write(head); out.write(http); out.write(body)
        out.write("\r\n\r\n".getBytes(StandardCharsets.UTF_8))
        n += 1
      }
    } finally out.close()
    n
  }
}
