package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** CDX(J) crawl index — the lookup structure that makes a 100 TB WARC
  * corpus RANDOM-ACCESSIBLE (the public convention Common Crawl ships
  * beside its WARCs: one sorted text line per record, `urlkey timestamp
  * {json}`, where the json carries the record's byte offset + length in
  * its WARC file). Without it, touching one page means scanning a ~1 GB
  * shard; with it, a lookup is one sorted-index probe plus ONE ranged
  * read ([[WarcIO.fetchRecord]]).
  *
  * Spark shape: index building is [[WarcIO.read]]'s file-parallel scan
  * plus a per-row projection (urlkey/digest/timestamp — zero shuffle
  * beyond the write's order); the index itself is small (a fixed-width
  * line per record, ~1/10000th of the corpus) so the sorted CDXJ file
  * writes driver-side like the other text sinks. `fetchRecords` is the
  * distributed read path: a frame of (filename, offset) rows fans out,
  * each task seeking directly to its records — the corpus is never
  * scanned.
  *
  * Format notes (public convention): `urlkey` is the SURT form
  * (reversed, comma-joined host labels + ")" + path) so one host's pages
  * sort together; `digest` is SHA1 of the payload in RFC 4648 base32 —
  * the cross-crawl dedup key; `timestamp` is 14-digit UTC from the
  * record's WARC-Date (epoch when the record carries none).
  */
object CdxIO {

  /** SURT url key: lowercase host, `www.` and default ports dropped,
    * labels reversed and comma-joined, then `)` + path — the sort form
    * where `com,example)/a` and `com,example)/b` are neighbors.
    */
  def surtKey(url: String): String = {
    val noScheme = url.replaceFirst("^[a-zA-Z][a-zA-Z0-9+.-]*://", "")
    val slash = noScheme.indexOf('/')
    val (hostPort, path) =
      if (slash < 0) (noScheme, "/")
      else (noScheme.substring(0, slash), noScheme.substring(slash))
    val host = hostPort.toLowerCase
      .stripSuffix(":80").stripSuffix(":443")
      .stripPrefix("www.")
    host.split('.').reverse.mkString(",") + ")" + path
  }

  private val B32 = "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567"

  /** SHA-1 of the payload in RFC 4648 base32 (20 bytes → 32 chars, no
    * padding) — the digest convention CDX files carry.
    */
  def sha1B32(bytes: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("SHA-1").digest(bytes)
    val sb = new StringBuilder(32)
    var buffer = 0L
    var bits = 0
    d.foreach { b =>
      buffer = (buffer << 8) | (b & 0xffL); bits += 8
      while (bits >= 5) {
        bits -= 5
        sb.append(B32(((buffer >> bits) & 0x1f).toInt))
      }
    }
    if (bits > 0) sb.append(B32(((buffer << (5 - bits)) & 0x1f).toInt))
    sb.toString
  }

  /** Build the index frame for one WARC file or a directory of them:
    * (urlkey, timestamp, url, mime, digest, length, offset, filename).
    * File-parallel scan + per-row projection; zero shuffle. `.warc.gz`
    * shards index their COMPRESSED member spans (per-record gzip
    * framing, the Common Crawl convention — [[WarcIO.readIndexed]]), so
    * [[fetchRecords]] random access works on compressed shards too.
    */
  def index(spark: SparkSession, warcPath: String): DataFrame = {
    val surt = udf((u: String) => surtKey(u))
    val dig = udf((p: Array[Byte]) => sha1B32(p))
    WarcIO.readIndexed(spark, warcPath).select(
      surt(col("url")).as("urlkey"),
      // WARC-Date ISO-8601 → the CDX 14-digit form; epoch when absent
      rpad(substring(regexp_replace(col("warc_date"), "[^0-9]", ""), 1, 14),
        14, "0").as("timestamp"),
      col("url"),
      lower(substring_index(col("content_type"), ";", 1)).as("mime"),
      dig(col("payload")).as("digest"),
      col("length"), col("offset"),
      col("file").as("filename"))
  }

  /** Write an index frame as one SORTED CDXJ file (`urlkey timestamp
    * {json}` per line, ordered by urlkey then timestamp — the order that
    * makes host-range probes a binary search). Driver-side single text
    * file, the index-artifact convention.
    */
  def writeCdxj(cdx: DataFrame, path: String): Long = {
    val lines = cdx.select(concat_ws(" ", col("urlkey"), col("timestamp"),
        to_json(struct(col("url"), col("mime"), col("digest"),
          col("length"), col("offset"), col("filename")))).as("line"))
      .orderBy(col("line"))
      .toLocalIterator()
    val out = new java.io.BufferedOutputStream(
      Files.newOutputStream(Paths.get(path)), 1 << 16)
    var n = 0L
    try {
      while (lines.hasNext) {
        out.write(lines.next().getString(0).getBytes(StandardCharsets.UTF_8))
        out.write('\n')
        n += 1
      }
    } finally out.close()
    n
  }

  /** Parse a CDXJ file back into the index frame (the [[index]] schema). */
  def readCdxj(spark: SparkSession, path: String): DataFrame =
    spark.read.textFile(path).toDF("line")
      .filter(length(trim(col("line"))) > 0)
      .select(
        regexp_extract(col("line"), "^(\\S+) (\\S+) (.*)$", 1).as("urlkey"),
        regexp_extract(col("line"), "^(\\S+) (\\S+) (.*)$", 2).as("timestamp"),
        regexp_extract(col("line"), "^(\\S+) (\\S+) (.*)$", 3).as("json"))
      .select(col("urlkey"), col("timestamp"),
        get_json_object(col("json"), "$.url").as("url"),
        get_json_object(col("json"), "$.mime").as("mime"),
        get_json_object(col("json"), "$.digest").as("digest"),
        get_json_object(col("json"), "$.length").cast("long").as("length"),
        get_json_object(col("json"), "$.offset").cast("long").as("offset"),
        get_json_object(col("json"), "$.filename").as("filename"))

  /** DISTRIBUTED random access: for each (filename, offset) row, seek
    * directly to that record ([[WarcIO.fetchRecord]]) — the index-driven
    * read path where only the selected records' bytes move, never the
    * shard. Returns [[WarcIO.WarcRecord]] rows.
    */
  def fetchRecords(cdx: DataFrame, fileCol: String = "filename",
      offsetCol: String = "offset", lengthCol: String = "length"): DataFrame = {
    val spark = cdx.sparkSession
    import spark.implicits._
    cdx.select(col(fileCol).cast("string"), col(offsetCol).cast("long"),
        col(lengthCol).cast("long"))
      .as[(String, Long, Long)]
      .mapPartitions(_.map { case (f, o, l) => WarcIO.fetchRecord(f, o, l) })
      .toDF()
  }
}
