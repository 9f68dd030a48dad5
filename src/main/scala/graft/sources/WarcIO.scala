package graft.sources

import java.io.{BufferedInputStream, ByteArrayOutputStream, FileInputStream}
import java.nio.charset.{Charset, StandardCharsets}
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

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
  * pipeline wants, and KEEPS the envelope's `Content-Type` (real crawls
  * are ~40% non-HTML: images, PDFs, non-UTF-8 pages — the content type
  * is what routes each record to the right downstream seam).
  *
  * Output columns: `payload BINARY` (the exact body bytes — images and
  * PDFs route untouched to the [[graft.operators.MediaCodecs]] /
  * [[graft.operators.Multimodal]] seam) and `text STRING` — the payload
  * decoded via the content-type's DECLARED charset (fallback UTF-8) for
  * text-shaped types, null for binary types; jusText-class extractors
  * sniff `Content-Type` for exactly this reason (a latin-1 page decoded
  * as UTF-8 mangles silently).
  *
  * Scale shape: crawl corpora ship as MANY ~1 GB WARC files, so
  * FILE-level parallelism is the natural distribution — the reader
  * parallelizes the file list and each task scans its file sequentially
  * (records are variable-length and must be walked; Common Crawl's own
  * tooling does the same). Per-record gzip members (`.warc.gz`) are
  * decompressed via the JDK GZIPInputStream's multi-member mode.
  * Malformed trailing garbage fails LOUDLY (a truncated crawl shard must
  * not silently shorten the corpus). Writing mirrors it:
  * [[writeShards]] emits one WARC file PER PARTITION (how crawls
  * actually shard); [[write]] is the single-file twin for fixtures and
  * exports.
  */
object WarcIO {

  final case class WarcRecord(file: String, warc_type: String, url: String,
      content_type: String, content_length: Long, warc_date: String,
      offset: Long, length: Long, payload: Array[Byte], text: String)

  /** Diagnostic counters for descriptor hygiene: sequential-scan streams
    * and random-access channels opened/closed. A reader abandoning an
    * iterator early (a LIMIT, a killed task) must still release its
    * descriptor — specs assert closed == opened through these.
    */
  private[sources] val scanStreamsOpened = new java.util.concurrent.atomic.AtomicLong
  private[sources] val scanStreamsClosed = new java.util.concurrent.atomic.AtomicLong
  private[sources] val fetchChannelsOpened = new java.util.concurrent.atomic.AtomicLong

  /** Content types whose payload decodes to the `text` column. Anything
    * else (images, application/pdf, octet-stream …) keeps `text` null
    * and routes through `payload` to the codec seam.
    */
  private def isTextType(mime: String): Boolean =
    mime.startsWith("text/") || mime == "application/xhtml+xml" ||
      mime == "application/json" || mime == "application/xml" ||
      mime.endsWith("+xml") || mime.endsWith("+json")

  /** `charset=` parameter of a Content-Type value; UTF-8 when absent,
    * unsupported, or malformed (decode must degrade, never throw —
    * one bad crawl page must not kill the task).
    */
  private[sources] def charsetOf(contentType: String): Charset = {
    val m = "(?i)charset=\"?([^;\\s\"']+)".r.findFirstMatchIn(
      Option(contentType).getOrElse(""))
    m.map(_.group(1)).filter { name =>
      try Charset.isSupported(name)
      catch { case _: IllegalArgumentException => false }
    }.map(Charset.forName).getOrElse(StandardCharsets.UTF_8)
  }

  /** Decode one payload: (content type from the HTTP envelope or the
    * WARC header, body bytes after envelope strip, charset-decoded text
    * or null). HTTP headers themselves are latin-1-safe per RFC 9110.
    */
  private def splitPayload(body: Array[Byte], warcContentType: String)
      : (String, Array[Byte], String) = {
    val (ctype, payload) =
      if (body.length >= 5 &&
          new String(body, 0, 5, StandardCharsets.US_ASCII) == "HTTP/") {
        // find the CRLF CRLF header/body split on the raw bytes
        var sep = -1
        var i = 0
        while (sep < 0 && i + 3 < body.length) {
          if (body(i) == '\r' && body(i + 1) == '\n' &&
              body(i + 2) == '\r' && body(i + 3) == '\n') sep = i
          i += 1
        }
        if (sep < 0) (warcContentType, body)
        else {
          val head = new String(body, 0, sep, StandardCharsets.ISO_8859_1)
          val ct = head.split("\r\n").iterator
            .filter(_.toLowerCase.startsWith("content-type:"))
            .map(_.substring("content-type:".length).trim)
            .nextOption().getOrElse("")
          (ct, java.util.Arrays.copyOfRange(body, sep + 4, body.length))
        }
      } else (warcContentType, body)
    val mime = Option(ctype).getOrElse("").takeWhile(_ != ';').trim.toLowerCase
    // no declared type → the pre-binary reader's behavior: treat as text
    val text = if (mime.isEmpty || isTextType(mime))
      new String(payload, charsetFor(ctype, payload)) else null
    (ctype, payload, text)
  }

  private val MetaCharset =
    "(?i)<meta[^>]+charset\\s*=\\s*[\"']?([A-Za-z0-9_\\-]+)".r

  /** Charset resolution with the HTML5 prescan fallback: the HTTP
    * header's declared charset wins; when the header declares NONE, the
    * first 1024 payload bytes are scanned for a `<meta charset=…>` /
    * `<meta http-equiv … charset=…>` declaration (exactly what browsers
    * and production extractors do — many latin-1/windows-1251 pages
    * declare their encoding only in the markup). UTF-8 when neither
    * declares, or the name is unsupported.
    */
  private def charsetFor(contentType: String, payload: Array[Byte]): Charset = {
    val headerDeclared = "(?i)charset=".r
      .findFirstIn(Option(contentType).getOrElse("")).isDefined
    if (headerDeclared) charsetOf(contentType)
    else {
      val prefix = new String(payload, 0, math.min(1024, payload.length),
        StandardCharsets.ISO_8859_1)
      MetaCharset.findFirstMatchIn(prefix).map(_.group(1)).filter { name =>
        try Charset.isSupported(name)
        catch { case _: IllegalArgumentException => false }
      }.map(Charset.forName).getOrElse(StandardCharsets.UTF_8)
    }
  }

  /** Byte-position-aware stream wrapper — record offsets are what the
    * CDX index stores, and what random access re-reads from.
    */
  private final class CountingInputStream(in: java.io.InputStream)
      extends java.io.FilterInputStream(in) {
    var count: Long = 0L
    override def read(): Int = {
      val b = super.read(); if (b >= 0) count += 1; b
    }
    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      val r = super.read(b, off, len); if (r > 0) count += r; r
    }
  }

  /** One-record-at-a-time WARC parser over a counting stream. Offsets
    * are positions in the stream as read: raw file bytes for `.warc`,
    * DECOMPRESSED positions for `.warc.gz` (random access by offset is
    * therefore a plain-`.warc` capability — Common Crawl solves gz
    * random access with per-record gzip members; this reader documents
    * the same limitation instead of faking it).
    */
  private final class RecordScanner(path: String, val in: CountingInputStream,
      counted: Boolean = false) {

    // idempotent close (clean EOF, an abandoning reader and the task-
    // completion listener may each call it; the descriptor counter must
    // move exactly once)
    private var closed = false
    def close(): Unit = if (!closed) {
      closed = true
      if (counted) scanStreamsClosed.incrementAndGet()
      in.close()
    }

    // line reader over the stream that leaves payload bytes untouched
    private def readLine(): String = {
      val buf = new ByteArrayOutputStream(128)
      var b = in.read()
      if (b < 0) return null
      while (b >= 0 && b != '\n') { buf.write(b); b = in.read() }
      val s = buf.toString(StandardCharsets.UTF_8.name())
      if (s.endsWith("\r")) s.dropRight(1) else s
    }

    private def readFully(n: Long): Array[Byte] = {
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

    /** Parse the next record; null at clean EOF. `offset` is the byte
      * position of the record's version line; `length` spans version
      * line through payload end (the trailing blank separator excluded).
      */
    def next(): WarcRecord = {
      // skip inter-record blank lines, remembering where each line began
      var lineStart = in.count
      var line = readLine()
      while (line != null && line.isEmpty) { lineStart = in.count; line = readLine() }
      if (line == null) { close(); return null }
      val offset = lineStart
      require(line.startsWith("WARC/"),
        s"$path: expected a WARC version line, got: ${line.take(60)}")
      var wtype = ""
      var url = ""
      var warcCt = ""
      var wdate = ""
      var len = -1L
      var h = readLine()
      while (h != null && h.nonEmpty) {
        val i = h.indexOf(':')
        require(i > 0, s"$path: malformed WARC header: ${h.take(60)}")
        val (k, v) = (h.substring(0, i).trim.toLowerCase, h.substring(i + 1).trim)
        k match {
          case "warc-type" => wtype = v
          case "warc-target-uri" => url = v
          case "content-type" => warcCt = v
          case "warc-date" => wdate = v
          case "content-length" => len = v.toLong
          case _ =>
        }
        h = readLine()
      }
      require(len >= 0, s"$path: record without Content-Length")
      val body = readFully(len)
      // the WARC-level content type of a response record describes the
      // ENVELOPE (application/http); the payload's type lives inside it
      val (ctype, payload, text) = splitPayload(body,
        if (warcCt.toLowerCase.startsWith("application/http")) "" else warcCt)
      WarcRecord(path, wtype, url, ctype, len, wdate, offset,
        in.count - offset, payload, text)
    }
  }

  private def openScanner(path: String): RecordScanner = {
    val raw = new BufferedInputStream(new FileInputStream(path), 1 << 16)
    val in: java.io.InputStream =
      if (path.endsWith(".gz"))
        new java.util.zip.GZIPInputStream(raw, 1 << 16)
      else raw
    scanStreamsOpened.incrementAndGet()
    new RecordScanner(path, new CountingInputStream(in), counted = true)
  }

  /** Record iterator over one file that is also Closeable — the contract
    * the DSv2 reader's close() and an early-abandoning consumer need.
    */
  private[sources] trait CloseableRecords
      extends Iterator[WarcRecord] with java.io.Closeable

  /** Sequential record iterator over one file (the per-task scan both the
    * batch reader and the `warc` streaming source run). The stream closes
    * at clean EOF; for EARLY abandonment (a LIMIT, a killed task) it also
    * closes via the registered task-completion listener — and the DSv2
    * reader threads its close() here, so descriptors never wait for GC.
    */
  private[sources] def recordsOf(path: String): CloseableRecords = {
    val scanner = openScanner(path)
    Option(org.apache.spark.TaskContext.get()).foreach(
      _.addTaskCompletionListener[Unit](_ => scanner.close()))
    new CloseableRecords {
      private var nextRec: WarcRecord = scanner.next()
      def hasNext: Boolean = nextRec != null
      def next(): WarcRecord = {
        val r = nextRec; nextRec = scanner.next(); r
      }
      def close(): Unit = scanner.close()
    }
  }

  /** RANDOM ACCESS: parse the single record at `offset`. For an
    * uncompressed `.warc`, `offset` is the record's raw byte position
    * (O(1) seek + one record's bytes). For `.warc.gz` written with
    * PER-RECORD gzip members (the Common Crawl convention — [[write]]
    * produces it), `offset`/`length` are the COMPRESSED member span:
    * one slice read + one member inflated; `length` is then required.
    */
  /** One counted channel open — the seam [[graft.sources.CdxIO.fetchRecords]]'
    * coalesced batch path reuses per (file, partition) instead of paying
    * an open/close per record (the slab multi-get discipline; reference
    * analogue SlabReader.java:268-344 sorts and coalesces its point
    * reads the same way).
    */
  private[sources] def openFetchChannel(path: String): java.nio.channels.FileChannel = {
    fetchChannelsOpened.incrementAndGet()
    java.nio.channels.FileChannel.open(Paths.get(path))
  }

  private def readSliceVia(ch: java.nio.channels.FileChannel, path: String,
      offset: Long, length: Long): Array[Byte] = {
    require(length <= Int.MaxValue, s"$path: member too large ($length)")
    val buf = java.nio.ByteBuffer.allocate(length.toInt)
    var read = 0
    while (read < length) {
      val r = ch.read(buf, offset + read)
      require(r > 0, s"$path: EOF reading member at $offset+$read")
      read += r
    }
    buf.array()
  }

  private def readSlice(path: String, offset: Long, length: Long): Array[Byte] = {
    val ch = openFetchChannel(path)
    try readSliceVia(ch, path, offset, length) finally ch.close()
  }

  /** Parse one gzip member's record; `expectSingle` guards the index
    * scan (a member holding several records means the file is NOT
    * per-record framed — indexing it would silently drop records).
    */
  private def parseMember(path: String, offset: Long, length: Long,
      expectSingle: Boolean): WarcRecord =
    parseMemberBytes(path, readSlice(path, offset, length), offset, length,
      expectSingle)

  private def parseMemberBytes(path: String, bytes: Array[Byte], offset: Long,
      length: Long, expectSingle: Boolean): WarcRecord = {
    val member = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(bytes), 1 << 16)
    try {
      val scanner = new RecordScanner(path, new CountingInputStream(member))
      val rec = scanner.next()
      require(rec != null, s"$path: no record in member at $offset")
      if (expectSingle)
        require(scanner.next() == null,
          s"$path: gzip member at $offset holds MULTIPLE records — this file " +
            "is whole-stream-gzipped, not per-record framed; rewrite it with " +
            "WarcIO.write (which emits one member per record) to index it")
      rec.copy(offset = offset, length = length)
    } finally member.close() // release the Inflater promptly (one per fetch)
  }

  /** Random access through an ALREADY-OPEN channel — the coalesced batch
    * form: `length` is required (the CDX index carries it for both
    * `.warc` record spans and `.warc.gz` member spans), so every fetch is
    * exactly one ranged read + one parse, and the caller amortizes the
    * channel open over all of a file's fetches in its partition.
    */
  private[sources] def fetchRecordVia(ch: java.nio.channels.FileChannel,
      path: String, offset: Long, length: Long): WarcRecord = {
    require(length > 0,
      s"fetchRecordVia needs the record/member byte length from the index: " +
        s"$path @ $offset")
    val bytes = readSliceVia(ch, path, offset, length)
    if (path.endsWith(".gz"))
      parseMemberBytes(path, bytes, offset, length, expectSingle = false)
    else {
      val scanner = new RecordScanner(path,
        new CountingInputStream(new java.io.ByteArrayInputStream(bytes)))
      val rec = scanner.next()
      require(rec != null, s"$path: no record at offset $offset")
      rec.copy(offset = offset, length = rec.length)
    }
  }

  def fetchRecord(path: String, offset: Long, length: Long = -1L): WarcRecord = {
    if (path.endsWith(".gz")) {
      require(length > 0,
        s"fetchRecord on .warc.gz needs the member's compressed length " +
          s"(the CDX index carries it): $path @ $offset")
      parseMember(path, offset, length, expectSingle = false)
    } else {
      val raw = new FileInputStream(path)
      try {
        var toSkip = offset
        while (toSkip > 0) {
          val s = raw.skip(toSkip)
          require(s > 0, s"$path: cannot seek to $offset")
          toSkip -= s
        }
        val scanner = new RecordScanner(path,
          new CountingInputStream(new BufferedInputStream(raw, 1 << 16)))
        val rec = scanner.next()
        require(rec != null, s"$path: no record at offset $offset")
        // the scanner's count started at the seek point
        rec.copy(offset = offset, length = rec.length)
      } finally raw.close()
    }
  }

  /** Records of a per-record-member `.warc.gz` with COMPRESSED member
    * spans as offset/length — the index-building scan for gz shards
    * (sequential [[recordsOf]] over a gz reports decompressed positions,
    * which cannot seed random access). Loud when a member holds more
    * than one record (a whole-file-gzipped warc is not indexable — the
    * reason the per-record convention exists).
    */
  private[sources] def memberRecords(path: String): Iterator[WarcRecord] = {
    val spans = GzipMembers.spans(path)
    if (spans.isEmpty) return Iterator.empty
    // ONE channel for the whole shard: a 1 GB shard holds ~100k members,
    // and an open/close per member would dominate the index-build scan
    // (the same coalescing discipline as CdxIO.fetchRecords)
    val ch = openFetchChannel(path)
    Option(org.apache.spark.TaskContext.get()).foreach(
      _.addTaskCompletionListener[Unit](_ => ch.close()))
    var remaining = spans.size
    spans.iterator.map { case (off, len) =>
      val rec = parseMemberBytes(path, readSliceVia(ch, path, off, len),
        off, len, expectSingle = true)
      remaining -= 1
      if (remaining == 0) ch.close() // eager close at clean exhaustion
      rec
    }
  }

  /** Read one or more WARC files (a directory lists `*.warc`/`*.warc.gz`)
    * into (file, warc_type, url, content_type, content_length,
    * payload BINARY, text) — one task per file, the crawl corpus's
    * natural parallelism. `text` is charset-decoded for text-shaped
    * content types, null for binary ones (those route through `payload`
    * to the codec seam).
    */
  private def listWarcFiles(path: String): Seq[String] = {
    val f = new java.io.File(path)
    val files: Seq[String] =
      if (f.isDirectory)
        f.listFiles().filter(x => x.getName.endsWith(".warc") ||
          x.getName.endsWith(".warc.gz")).map(_.getPath).sorted.toSeq
      else Seq(path)
    require(files.nonEmpty, s"no WARC files under $path")
    files
  }

  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val files = listWarcFiles(path)
    spark.sparkContext.parallelize(files, files.size)
      .flatMap(recordsOf)
      .toDF()
  }

  /** [[read]] with RANDOM-ACCESS-USABLE offsets: for `.warc` files the
    * sequential scan's raw positions (identical to [[read]]); for
    * `.warc.gz` the COMPRESSED member spans (requires per-record gzip
    * framing — [[write]] emits it; whole-stream-gzipped files fail
    * loudly rather than index only each member's first record). The
    * scan [[graft.sources.CdxIO.index]] builds from.
    */
  def readIndexed(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val files = listWarcFiles(path)
    spark.sparkContext.parallelize(files, files.size)
      .flatMap(f => if (f.endsWith(".gz")) memberRecords(f) else recordsOf(f))
      .toDF()
  }

  private val DefaultContentType = "text/html; charset=utf-8"

  /** Default WARC-Date when the caller supplies none: the epoch, the
    * honest "no capture time known" value (ISO 28500 REQUIRES the header;
    * CDX timestamps then read 19700101000000 instead of a zero-pad).
    */
  private[sources] val EpochDate = "1970-01-01T00:00:00Z"

  /** Mandatory-per-ISO-28500 record headers: WARC-Record-ID (urn:uuid —
    * NAME-BASED from url+date+payload, so a rewritten corpus is
    * byte-reproducible; RFC 4122 v3 semantics) and WARC-Date.
    */
  private def mandatoryHeaders(url: String, date: String,
      body: Array[Byte]): String = {
    val digest = java.security.MessageDigest.getInstance("SHA-1")
    digest.update(url.getBytes(StandardCharsets.UTF_8))
    digest.update(0.toByte)
    digest.update(date.getBytes(StandardCharsets.UTF_8))
    digest.update(0.toByte)
    digest.update(body)
    val id = java.util.UUID.nameUUIDFromBytes(digest.digest())
    s"WARC-Record-ID: <urn:uuid:$id>\r\nWARC-Date: $date\r\n"
  }

  /** One `response` record with a minimal HTTP 200 envelope. */
  private def writeRecord(out: java.io.OutputStream, url: String,
      contentType: String, body: Array[Byte],
      date: String = EpochDate): Unit = {
    val ct = Option(contentType).filter(_.nonEmpty).getOrElse(DefaultContentType)
    val http = (s"HTTP/1.1 200 OK\r\nContent-Type: $ct\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes(StandardCharsets.UTF_8)
    val head = (s"WARC/1.0\r\nWARC-Type: response\r\n" +
      s"WARC-Target-URI: $url\r\n" +
      mandatoryHeaders(url, date, body) +
      s"Content-Type: application/http; msgtype=response\r\n" +
      s"Content-Length: ${http.length + body.length}\r\n\r\n")
      .getBytes(StandardCharsets.UTF_8)
    out.write(head); out.write(http); out.write(body)
    out.write("\r\n\r\n".getBytes(StandardCharsets.UTF_8))
  }

  /** One WET-style `conversion` record: extracted text, no HTTP envelope
    * (ISO 28500 conversion semantics — the derived-text twin of a
    * response record; what Common Crawl's .wet files carry).
    */
  private def writeConversionRecord(out: java.io.OutputStream, url: String,
      text: String, date: String = EpochDate): Unit = {
    val body = Option(text).getOrElse("").getBytes(StandardCharsets.UTF_8)
    val head = (s"WARC/1.0\r\nWARC-Type: conversion\r\n" +
      s"WARC-Target-URI: $url\r\n" +
      mandatoryHeaders(url, date, body) +
      s"Content-Type: text/plain; charset=utf-8\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n")
      .getBytes(StandardCharsets.UTF_8)
    out.write(head); out.write(body)
    out.write("\r\n\r\n".getBytes(StandardCharsets.UTF_8))
  }

  /** Emit one record, as its OWN gzip member when the target is `.gz`
    * (the Common Crawl framing — exactly what makes the compressed file
    * random-accessible through [[graft.sources.CdxIO]]).
    */
  private def emitRecord(out: java.io.OutputStream, gzip: Boolean)
      (writeOne: java.io.OutputStream => Unit): Unit =
    if (gzip) {
      // close() (not just finish()) so each member's native Deflater is
      // released promptly — one member per record means thousands of
      // deflaters per shard if left to finalization. The shield keeps
      // the underlying stream open across members.
      val shield = new java.io.FilterOutputStream(out) {
        override def write(b: Array[Byte], off: Int, len: Int): Unit =
          out.write(b, off, len)
        override def close(): Unit = flush()
      }
      val g = new java.util.zip.GZIPOutputStream(shield, 1 << 16)
      writeOne(g)
      g.close()
    } else writeOne(out)

  /** Bytes of one row's payload column: BINARY passes through exactly;
    * STRING encodes UTF-8 (write a non-UTF-8 page as binary).
    */
  private def payloadBytes(r: Row, i: Int): Array[Byte] = r.get(i) match {
    case b: Array[Byte] => b
    case s: String => s.getBytes(StandardCharsets.UTF_8)
    case null => Array.emptyByteArray
    case other => throw new IllegalArgumentException(
      s"payload column must be STRING or BINARY, got ${other.getClass}")
  }

  /** Write (url, payload[, content_type]) rows as ONE WARC file of
    * `response` records (the round-trip twin of [[read]]; single local
    * file — the xvec writer convention, one partition in flight via
    * toLocalIterator). Payload may be STRING (UTF-8) or BINARY (exact
    * bytes); `contentTypeCol` (optional) sets each record's HTTP
    * Content-Type, default `text/html; charset=utf-8`. For corpus-sized
    * output use [[writeShards]] — this form funnels through the driver.
    */
  def write(df: DataFrame, path: String,
      urlCol: String = "url", payloadCol: String = "payload",
      contentTypeCol: Option[String] = None,
      dateCol: Option[String] = None): Long = {
    val cols = Seq(col(urlCol), col(payloadCol)) ++ contentTypeCol.map(col) ++
      dateCol.map(col)
    val dateIdx = 2 + (if (contentTypeCol.isDefined) 1 else 0)
    val it = df.select(cols: _*).toLocalIterator()
    val gz = path.endsWith(".gz")
    val out = new java.io.BufferedOutputStream(
      Files.newOutputStream(Paths.get(path)), 1 << 16)
    var n = 0L
    try {
      while (it.hasNext) {
        val r = it.next()
        emitRecord(out, gz)(writeRecord(_, r.getString(0),
          if (contentTypeCol.isDefined) r.getString(2) else null,
          payloadBytes(r, 1),
          if (dateCol.isDefined) r.getString(dateIdx) else EpochDate))
        n += 1
      }
    } finally out.close()
    n
  }

  /** WET export: (url, text) rows as `conversion` records (extracted
    * text, no HTTP envelope) — the derived-text artifact real crawl
    * pipelines persist next to the raw WARC. Same single-file and `.gz`
    * per-record-member conventions as [[write]].
    */
  def writeWet(df: DataFrame, path: String,
      urlCol: String = "url", textCol: String = "text",
      dateCol: Option[String] = None): Long = {
    val cols = Seq(col(urlCol), col(textCol)) ++ dateCol.map(col)
    val it = df.select(cols: _*).toLocalIterator()
    val gz = path.endsWith(".gz")
    val out = new java.io.BufferedOutputStream(
      Files.newOutputStream(Paths.get(path)), 1 << 16)
    var n = 0L
    try {
      while (it.hasNext) {
        val r = it.next()
        emitRecord(out, gz)(writeConversionRecord(_, r.getString(0),
          r.getString(1),
          if (dateCol.isDefined) r.getString(2) else EpochDate))
        n += 1
      }
    } finally out.close()
    n
  }

  /** One `revisit` record (ISO 28500 identical-payload-digest profile):
    * the crawl re-fetched `url`, the payload's digest matched a prior
    * capture, and the record keeps PROOF of the visit without storing
    * the bytes twice — Common Crawl's cross-crawl payload dedup form.
    */
  private def writeRevisitRecord(out: java.io.OutputStream, url: String,
      date: String, digestB32: String, refersToUri: String): Unit = {
    val head = ("WARC/1.0\r\nWARC-Type: revisit\r\n" +
      s"WARC-Target-URI: $url\r\n" +
      mandatoryHeaders(url, date, Array.emptyByteArray) +
      s"WARC-Payload-Digest: sha1:$digestB32\r\n" +
      s"WARC-Refers-To-Target-URI: $refersToUri\r\n" +
      "WARC-Profile: http://netpreservation.org/warc/1.0/revisit/" +
      "identical-payload-digest\r\n" +
      "Content-Length: 0\r\n\r\n")
      .getBytes(StandardCharsets.UTF_8)
    out.write(head)
    out.write("\r\n\r\n".getBytes(StandardCharsets.UTF_8))
  }

  /** Distributed shard writer with CROSS-CRAWL payload dedup: rows whose
    * payload digest (SHA-1, the CDX `digest` convention) appears in
    * `seenDigests` — `(digest, url)` rows from a PRIOR crawl's index,
    * [[graft.sources.CdxIO.index]] output shape — are written as `revisit`
    * records (headers only, zero payload bytes) pointing at the prior
    * capture's URL; everything else writes as a full `response`. This is
    * how a continuous crawl's storage stays sublinear in fetches: at
    * Common Crawl scale, ~half of each month's fetches are byte-identical
    * to the previous month's.
    *
    * Shape: one digest projection per row (per-row map), ONE hash join on
    * the 20-byte digest key against the prior index's (digest, url)
    * projection, then the same per-partition shard writer as
    * [[writeShards]]. Receipt: (shard, records, revisits) per non-empty
    * partition. Intra-batch duplicates are NOT collapsed here — that's
    * the exact-dedup pass's job; this operator implements the
    * cross-crawl contract.
    *
    * Note on indexing the OUTPUT: a revisit record stores no payload, so
    * [[graft.sources.CdxIO.index]] over the written shard digests the
    * EMPTY body for those rows (the record itself carries the original
    * payload's digest in its `WARC-Payload-Digest` header). Cross-crawl
    * digest lookups should therefore consult the PRIOR crawl's index —
    * the same frame this writer takes as `seenDigests`.
    */
  def writeShardsWithRevisits(df: DataFrame, dir: String,
      seenDigests: DataFrame, urlCol: String = "url",
      payloadCol: String = "payload", contentTypeCol: Option[String] = None,
      gzip: Boolean = false, dateCol: Option[String] = None): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    Files.createDirectories(Paths.get(dir))
    val dig = udf((b: Array[Byte]) =>
      CdxIO.sha1B32(Option(b).getOrElse(Array.emptyByteArray)))
    // min(url) per digest: deterministic refers-to when several prior
    // captures share a payload (mirror pages)
    val seen = seenDigests.groupBy(col("digest").as("_digest"))
      .agg(min(col("url")).as("_refers_to"))
    val cols = Seq(col(urlCol).as("_url"), col(payloadCol).as("_payload")) ++
      contentTypeCol.map(c => col(c).as("_ct")) ++
      dateCol.map(c => col(c).as("_date"))
    val hasCt = contentTypeCol.isDefined
    val dateIdx = 2 + (if (hasCt) 1 else 0)
    val marked = df.select(cols: _*)
      // string payloads digest over their UTF-8 bytes — the exact bytes
      // the writer emits (cast to binary is that encoding)
      .withColumn("_digest", dig(col("_payload").cast("binary")))
      .join(seen, Seq("_digest"), "left")
    val shards = marked.rdd
      .mapPartitionsWithIndex { (idx, rows) =>
        if (!rows.hasNext) Iterator.empty
        else {
          val ext = if (gzip) "warc.gz" else "warc"
          val path = f"$dir/part-$idx%05d.$ext"
          val out = new java.io.BufferedOutputStream(
            Files.newOutputStream(Paths.get(path)), 1 << 16)
          var n = 0L
          var nRev = 0L
          try {
            rows.foreach { r =>
              // join put _digest first: (_digest, _url, _payload, [_ct],
              // [_date], _refers_to)
              val url = r.getString(1)
              val date = if (dateCol.isDefined) r.getString(1 + dateIdx)
                else EpochDate
              val refersTo = r.getString(r.length - 1)
              emitRecord(out, gzip) { o =>
                if (refersTo != null) {
                  nRev += 1
                  writeRevisitRecord(o, url, date, r.getString(0), refersTo)
                } else writeRecord(o, url,
                  if (hasCt) r.getString(3) else null,
                  payloadBytes(r, 2), date)
              }
              n += 1
            }
          } finally out.close()
          Iterator((path, n, nRev))
        }
      }
      .collect()
    shards.toSeq.toDF("shard", "records", "revisits")
  }

  /** Distributed WET writer: one `part-NNNNN.wet.warc[.gz]` shard PER
    * PARTITION (the [[writeShards]] convention applied to conversion
    * records — a full-crawl WET is corpus-sized and must never funnel
    * through the driver). Same shared-filesystem precondition; receipt =
    * (shard, records), one row per non-empty partition, collected so the
    * write is eager and failures surface here.
    */
  def writeWetShards(df: DataFrame, dir: String,
      urlCol: String = "url", textCol: String = "text",
      dateCol: Option[String] = None, gzip: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    Files.createDirectories(Paths.get(dir))
    val cols = Seq(col(urlCol), col(textCol)) ++ dateCol.map(col)
    val hasDate = dateCol.isDefined
    val shards = df.select(cols: _*).rdd
      .mapPartitionsWithIndex { (idx, rows) =>
        if (!rows.hasNext) Iterator.empty
        else {
          val ext = if (gzip) "wet.warc.gz" else "wet.warc"
          val path = f"$dir/part-$idx%05d.$ext"
          val out = new java.io.BufferedOutputStream(
            Files.newOutputStream(Paths.get(path)), 1 << 16)
          var n = 0L
          try {
            rows.foreach { r =>
              emitRecord(out, gzip)(writeConversionRecord(_, r.getString(0),
                r.getString(1), if (hasDate) r.getString(2) else EpochDate))
              n += 1
            }
          } finally out.close()
          Iterator((path, n))
        }
      }
      .collect()
    shards.toSeq.toDF("shard", "records")
  }

  /** Distributed writer: one WARC shard file PER PARTITION (exactly how
    * crawl corpora ship — many ~1 GB files), written executor-side via
    * mapPartitionsWithIndex into `dir/part-NNNNN.warc`. Requires `dir`
    * on a filesystem all executors share (same precondition as any
    * Spark file sink); on local mode that is trivially true. Returns
    * (shard, records) — one row per non-empty partition; the receipt is
    * collected so the write runs eagerly and failures surface here.
    */
  def writeShards(df: DataFrame, dir: String,
      urlCol: String = "url", payloadCol: String = "payload",
      contentTypeCol: Option[String] = None, gzip: Boolean = false,
      dateCol: Option[String] = None): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    Files.createDirectories(Paths.get(dir))
    val cols = Seq(col(urlCol), col(payloadCol)) ++ contentTypeCol.map(col) ++
      dateCol.map(col)
    val hasCt = contentTypeCol.isDefined
    val dateIdx = 2 + (if (hasCt) 1 else 0)
    val hasDate = dateCol.isDefined
    val shards = df.select(cols: _*).rdd
      .mapPartitionsWithIndex { (idx, rows) =>
        if (!rows.hasNext) Iterator.empty
        else {
          val ext = if (gzip) "warc.gz" else "warc"
          val path = f"$dir/part-$idx%05d.$ext"
          val out = new java.io.BufferedOutputStream(
            Files.newOutputStream(Paths.get(path)), 1 << 16)
          var n = 0L
          try {
            rows.foreach { r =>
              emitRecord(out, gzip)(writeRecord(_, r.getString(0),
                if (hasCt) r.getString(2) else null, payloadBytes(r, 1),
                if (hasDate) r.getString(dateIdx) else EpochDate))
              n += 1
            }
          } finally out.close()
          Iterator((path, n))
        }
      }
      .collect()
    shards.toSeq.toDF("shard", "records")
  }
}
