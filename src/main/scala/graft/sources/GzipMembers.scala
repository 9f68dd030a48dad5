package graft.sources

import java.io.{BufferedInputStream, FileInputStream, PushbackInputStream}

/** Member spans of a multi-member gzip file — the framing that makes
  * `.warc.gz` RANDOM-ACCESSIBLE (the Common Crawl convention: one gzip
  * member per WARC record, so an index can store COMPRESSED offsets and
  * a reader can pull one record by inflating one member; RFC 1952 is
  * the public member grammar).
  *
  * One sequential pass, streaming (no whole-file buffering): each
  * member's header is parsed (magic, flags, optional extra/name/
  * comment/hcrc fields), its deflate body inflated to exhaustion with a
  * raw-position counter, unconsumed read-ahead pushed back, and the
  * 8-byte CRC/ISIZE trailer accounted — yielding exact (offset, length)
  * spans over the RAW file bytes.
  */
object GzipMembers {

  /** (offset, compressedLength) of every member, in file order. Fails
    * loudly on a malformed stream — a corrupt crawl shard must not
    * silently lose records.
    */
  def spans(path: String): Seq[(Long, Long)] = {
    val in = new PushbackInputStream(
      new BufferedInputStream(new FileInputStream(path), 1 << 16), 1 << 16)
    var pos = 0L
    def readByte(): Int = { val b = in.read(); if (b >= 0) pos += 1; b }
    def mustByte(what: String): Int = {
      val b = readByte()
      require(b >= 0, s"$path: EOF inside gzip $what at $pos")
      b
    }
    def skip(n: Int, what: String): Unit = (0 until n).foreach(_ => mustByte(what))
    def skipZeroTerminated(what: String): Unit = {
      var b = mustByte(what)
      while (b != 0) b = mustByte(what)
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    try {
      var first = readByte()
      while (first >= 0) {
        val start = pos - 1
        require(first == 0x1f && mustByte("magic") == 0x8b,
          s"$path: bad gzip magic at $start")
        require(mustByte("method") == 8, s"$path: unsupported gzip method at $start")
        val flg = mustByte("flags")
        skip(6, "header") // MTIME(4) XFL OS
        if ((flg & 0x04) != 0) { // FEXTRA
          val xlen = mustByte("xlen") | (mustByte("xlen") << 8)
          skip(xlen, "extra")
        }
        if ((flg & 0x08) != 0) skipZeroTerminated("name")    // FNAME
        if ((flg & 0x10) != 0) skipZeroTerminated("comment") // FCOMMENT
        if ((flg & 0x02) != 0) skip(2, "hcrc")               // FHCRC
        // inflate the raw deflate body to exhaustion, tracking raw bytes
        val inf = new java.util.zip.Inflater(true)
        val buf = new Array[Byte](1 << 16)
        val sink = new Array[Byte](1 << 16)
        var lastN = 0
        while (!inf.finished()) {
          if (inf.needsInput()) {
            lastN = in.read(buf)
            require(lastN > 0, s"$path: EOF inside deflate body at $pos")
            pos += lastN
            inf.setInput(buf, 0, lastN)
          }
          val w = inf.inflate(sink)
          require(w > 0 || inf.finished() || inf.needsInput(),
            s"$path: stalled deflate stream at $pos")
        }
        val rem = inf.getRemaining
        inf.end()
        if (rem > 0) { // push back the over-read tail
          in.unread(buf, lastN - rem, rem)
          pos -= rem
        }
        skip(8, "trailer") // CRC32 + ISIZE
        out += ((start, pos - start))
        first = readByte()
      }
    } finally in.close()
    out.toSeq
  }
}
