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

  test("per-record-member .warc.gz: members tile the file, index-driven fetch works") {
    val d = Files.createTempDirectory("graft-cdx-gz").toString
    val rows = (0 until 12).map(i =>
      (s"http://gz.example.com/page/$i",
        s"<p>Compressed page $i with enough characters to matter here.</p>"))
    import spark.implicits._
    val gz = s"$d/shard.warc.gz"
    WarcIO.write(rows.toDF("url", "payload"), gz)
    // the member framing is exact: spans are contiguous and tile the file
    val spans = GzipMembers.spans(gz)
    assert(spans.size == 12)
    assert(spans.head._1 == 0L)
    spans.sliding(2).foreach { case Seq((o1, l1), (o2, _)) =>
      assert(o1 + l1 == o2, "members must be contiguous")
    }
    assert(spans.last._1 + spans.last._2 ==
      Files.size(java.nio.file.Paths.get(gz)))
    // index stores COMPRESSED member spans; fetch inflates ONE member
    val idx = CdxIO.index(spark, gz)
    val fetched = CdxIO.fetchRecords(
        idx.filter(col("url").endsWith("/page/7")))
      .select("url", "text").collect()
    assert(fetched.length == 1)
    assert(fetched.head.getString(1).contains("Compressed page 7"))
    // sequential read handles the multi-member stream identically
    assert(WarcIO.read(spark, gz).count() == 12)
  }

  test("whole-stream-gzipped warc refuses to index (would silently drop records)") {
    val (d, warc) = writeFixture(3)
    val bytes = Files.readAllBytes(java.nio.file.Paths.get(warc))
    val gz = new java.util.zip.GZIPOutputStream(
      Files.newOutputStream(java.nio.file.Paths.get(s"$d/whole.warc.gz")))
    gz.write(bytes); gz.close()
    val e = intercept[org.apache.spark.SparkException] {
      CdxIO.index(spark, s"$d/whole.warc.gz").count()
    }
    val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("MULTIPLE records"), msg.take(300))
    // targeted fetch without a length is also loud
    val e2 = intercept[IllegalArgumentException] {
      WarcIO.fetchRecord(s"$d/whole.warc.gz", 0L)
    }
    assert(e2.getMessage.contains("compressed length"))
  }

  test("surtKey: port strip is scheme-aware; spaces percent-encode") {
    // stripping :443 off an http URL would collide it with https://host —
    // only the scheme's OWN default port drops
    assert(CdxIO.surtKey("http://host.org:443/x") == "org,host:443)/x")
    assert(CdxIO.surtKey("https://host.org:80/x") == "org,host:80)/x")
    assert(CdxIO.surtKey("http://host.org:80/x") == "org,host)/x")
    assert(CdxIO.surtKey("https://host.org:443/x") == "org,host)/x")
    // a literal space would truncate the space-delimited CDXJ line on
    // read-back (urlkey cut, every field shifted) — encode, loudly not
    assert(CdxIO.surtKey("http://host.org/a b/c") == "org,host)/a%20b/c")
    // and the round trip through the text format survives such a key
    val d = Files.createTempDirectory("graft-cdxsp").toString
    WarcIO.write(Seq(("http://host.org/a b/c", "<p>spaced</p>"))
      .toDF("url", "payload"), s"$d/sp.warc")
    val idx = CdxIO.index(spark, s"$d/sp.warc")
    CdxIO.writeCdxj(idx, s"$d/sp.cdxj")
    val back = CdxIO.readCdxj(spark, s"$d/sp.cdxj")
      .select("urlkey", "url", "mime").collect()
    assert(back.length == 1)
    assert(back.head.getString(0) == "org,host)/a%20b/c")
    assert(back.head.getString(1) == "http://host.org/a b/c",
      "the json field still carries the original url")
    assert(back.head.getString(2) == "text/html")
  }

  test("fetchRecords coalesces: ONE channel per file per partition, " +
      "records still byte-exact") {
    // two shards, interleaved request order — the partition-local sort
    // must group by file so each file opens exactly once
    val d = Files.createTempDirectory("graft-cdxco").toString
    def mk(tag: String, n: Int) = {
      val rows = (0 until n).map(i =>
        (s"http://$tag.example.com/page/$i",
          s"<html><body><p>Coalesced $tag page $i body text.</p></body></html>"))
      WarcIO.write(rows.toDF("url", "payload"), s"$d/$tag.warc")
    }
    mk("aa", 12); mk("bb", 12)
    val idx = CdxIO.index(spark, d)
    // shuffle request order, single partition: the worst case for a
    // per-record opener (alternating files), the trivial case for the
    // sorted+coalesced one
    val requests = idx.orderBy(rand(7)).coalesce(1)
    val opened0 = WarcIO.fetchChannelsOpened.get()
    val got = CdxIO.fetchRecords(requests).select("url", "text").collect()
    val opened = WarcIO.fetchChannelsOpened.get() - opened0
    assert(got.length == 24)
    assert(opened == 2, s"2 files, 1 partition -> 2 channel opens, got $opened")
    val want = WarcIO.read(spark, d).select("url", "text").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    got.foreach(r => assert(want(r.getString(0)) == r.getString(1)))
  }
}
