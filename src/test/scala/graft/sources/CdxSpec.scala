package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** CDX(J) index contracts: SURT keys, the SHA1-base32 digest vector,
  * index ↔ CDXJ text round trip (sorted), and index-driven random access
  * equal to the full scan — the property that makes a 100 TB crawl
  * addressable without re-scanning shards.
  */
class CdxSpec extends SparkSpec {
  import spark.implicits._

  test("surtKey: scheme/www/default-port drop, host reversal, path kept") {
    assert(CdxIO.surtKey("https://www.Example.COM:443/A/b?x=1") ==
      "com,example)/A/b?x=1")
    assert(CdxIO.surtKey("http://sub.host.org/") == "org,host,sub)/")
    assert(CdxIO.surtKey("http://host.org") == "org,host)/")
    assert(CdxIO.surtKey("host.org/p") == "org,host)/p")
  }

  test("sha1B32 matches the public vectors") {
    assert(CdxIO.sha1B32(Array.emptyByteArray) ==
      "3I42H3S6NNFQ2MSVX7XZKYAYSCX5QBYJ")
    assert(CdxIO.sha1B32("hello world".getBytes("UTF-8")) ==
      "FKXGYNOJJ7H3IFO35FPUBC445EPOQRXN")
  }

  private def writeFixture(n: Int): (String, String) = {
    val d = Files.createTempDirectory("graft-cdx").toString
    val rows = (0 until n).map(i =>
      (s"http://site$i.example.com/page/$i",
        s"<html><body><p>Indexed page number $i with enough text to matter.</p></body></html>"))
    WarcIO.write(rows.toDF("url", "payload"), s"$d/shard.warc")
    (d, s"$d/shard.warc")
  }

  test("index -> writeCdxj -> readCdxj round-trips every column, sorted") {
    val (d, warc) = writeFixture(15)
    val idx = CdxIO.index(spark, warc)
    assert(CdxIO.writeCdxj(idx, s"$d/shard.cdxj") == 15)
    val back = CdxIO.readCdxj(spark, s"$d/shard.cdxj")
    // names + types round-trip (nullability legitimately widens through text)
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      idx.schema.map(f => (f.name, f.dataType)))
    val a = idx.collect().map(_.toSeq).toSet
    val b = back.collect().map(_.toSeq).toSet
    assert(a == b, s"round trip changed rows:\n${a.diff(b)}\n${b.diff(a)}")
    // the text artifact is sorted by line (urlkey-first)
    val lines = Files.readAllLines(java.nio.file.Paths.get(s"$d/shard.cdxj"))
    assert(lines.size == 15)
    assert((0 until lines.size - 1).forall(i => lines.get(i) <= lines.get(i + 1)),
      "CDXJ must be sorted for binary-search probes")
  }

  test("fetchRecords via stored offsets equals the full scan (never rescans)") {
    val (d, warc) = writeFixture(20)
    val idx = CdxIO.index(spark, warc)
    val subset = idx.filter(
      regexp_extract(col("url"), "/page/(\\d+)$", 1).cast("long") % 4 === 0)
    val fetched = CdxIO.fetchRecords(subset)
      .select("url", "text").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val scanned = WarcIO.read(spark, warc).select("url", "text").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(fetched.size == 5)
    fetched.foreach { case (u, t) => assert(scanned(u) == t, s"offset read differs for $u") }
  }

  test("digest is the payload sha1 (same payload -> same digest, the dedup key)") {
    val d = Files.createTempDirectory("graft-cdx-dig").toString
    val rows = Seq(
      ("http://a.example.com/x", "identical body text here"),
      ("http://b.example.com/y", "identical body text here"),
      ("http://c.example.com/z", "a different body text"))
    WarcIO.write(rows.toDF("url", "payload"), s"$d/s.warc")
    val digs = CdxIO.index(spark, s"$d/s.warc")
      .select("url", "digest").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(digs("http://a.example.com/x") == digs("http://b.example.com/y"))
    assert(digs("http://a.example.com/x") != digs("http://c.example.com/z"))
    assert(digs("http://a.example.com/x") ==
      CdxIO.sha1B32("identical body text here".getBytes("UTF-8")))
  }

  test("fetchRecord on .warc.gz fails loudly (offsets are a plain-warc capability)") {
    val (d, warc) = writeFixture(2)
    val bytes = Files.readAllBytes(java.nio.file.Paths.get(warc))
    val gz = new java.util.zip.GZIPOutputStream(
      Files.newOutputStream(java.nio.file.Paths.get(s"$d/shard.warc.gz")))
    gz.write(bytes); gz.close()
    val e = intercept[IllegalArgumentException] {
      WarcIO.fetchRecord(s"$d/shard.warc.gz", 0L)
    }
    assert(e.getMessage.contains("uncompressed"))
  }
}
