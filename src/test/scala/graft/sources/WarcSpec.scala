package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** WARC container contracts: write→read round trip with the HTTP
  * envelope stripped, gzip members, directory fan-out (one task per
  * file), loud failure on truncation, binary payloads routed untouched
  * (text null), declared-charset decode, and the per-partition shard
  * writer.
  */
class WarcSpec extends SparkSpec {
  import spark.implicits._

  private def rows(n: Int, tag: String) = (0 until n).map(i =>
    (s"http://example.com/$tag/$i",
      s"<html><body><p>Document $tag number $i with enough text to matter.</p></body></html>"))

  test("write then read round-trips urls and payloads, envelope stripped") {
    val d = Files.createTempDirectory("graft-warc").toString
    val n = WarcIO.write(rows(20, "a").toDF("url", "payload"), s"$d/a.warc")
    assert(n == 20)
    val back = WarcIO.read(spark, s"$d/a.warc")
      .select("url", "text", "warc_type", "content_type").collect()
    assert(back.length == 20)
    assert(back.forall(_.getString(2) == "response"))
    assert(back.forall(_.getString(3) == "text/html; charset=utf-8"))
    val byUrl = back.map(r => r.getString(0) -> r.getString(1)).toMap
    rows(20, "a").foreach { case (u, p) =>
      assert(byUrl(u) == p, s"payload mismatch for $u")
    }
  }

  test("binary payload round-trips byte-exact; text is null (codec-seam routing)") {
    val d = Files.createTempDirectory("graft-warcbin").toString
    // bytes that are NOT valid UTF-8 (0xFF 0xFE) and contain CRLF CRLF —
    // a text-decoding reader would mangle the former and a naive
    // envelope-search could split on the latter
    val img = Array[Byte](0xFF.toByte, 0xFE.toByte, '\r', '\n', '\r', '\n',
      0, 1, 2, 3, 127, 0x80.toByte)
    val df = Seq(("http://example.com/img/1", img, "image/x-portable-pixmap"))
      .toDF("url", "payload", "content_type")
    WarcIO.write(df, s"$d/b.warc", contentTypeCol = Some("content_type"))
    val back = WarcIO.read(spark, s"$d/b.warc")
      .select("content_type", "payload", "text").collect()
    assert(back.length == 1)
    assert(back.head.getString(0) == "image/x-portable-pixmap")
    assert(java.util.Arrays.equals(back.head.getAs[Array[Byte]](1), img),
      "binary payload must round-trip byte-exact")
    assert(back.head.isNullAt(2), "non-text content type must not decode to text")
  }

  test("declared charset decodes non-UTF-8 pages; unsupported charset falls back") {
    val d = Files.createTempDirectory("graft-warccs").toString
    val s1 = "café résumé ±°ß"
    val df = Seq(
      ("http://example.com/l1", s1.getBytes(StandardCharsets.ISO_8859_1),
        "text/plain; charset=iso-8859-1"),
      ("http://example.com/u8", s1.getBytes(StandardCharsets.UTF_8),
        "text/plain; charset=utf-8"),
      ("http://example.com/bad", "plain ascii page".getBytes(StandardCharsets.UTF_8),
        "text/plain; charset=no-such-charset"))
      .toDF("url", "payload", "content_type")
    WarcIO.write(df, s"$d/c.warc", contentTypeCol = Some("content_type"))
    val back = WarcIO.read(spark, s"$d/c.warc")
      .select("url", "text").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(back("http://example.com/l1") == s1, "latin-1 page must decode via declared charset")
    assert(back("http://example.com/u8") == s1)
    assert(back("http://example.com/bad") == "plain ascii page",
      "unsupported charset falls back to UTF-8 instead of throwing")
  }

  test("charsetOf: declared, quoted, absent, unsupported, malformed") {
    assert(WarcIO.charsetOf("text/html; charset=iso-8859-1").name == "ISO-8859-1")
    assert(WarcIO.charsetOf("text/html; CHARSET=\"UTF-16BE\"").name == "UTF-16BE")
    assert(WarcIO.charsetOf("text/html").name == "UTF-8")
    assert(WarcIO.charsetOf(null).name == "UTF-8")
    assert(WarcIO.charsetOf("text/html; charset=bogus!!").name == "UTF-8")
  }

  test("writeWet: conversion records round-trip extracted text, no HTTP envelope") {
    val d = Files.createTempDirectory("graft-wet").toString
    val texts = (0 until 8).map(i =>
      (s"http://example.com/w/$i", s"Extracted main text of page $i."))
    val n = WarcIO.writeWet(texts.toDF("url", "text"), s"$d/x.wet.warc.gz")
    assert(n == 8)
    val back = WarcIO.read(spark, s"$d/x.wet.warc.gz")
      .select("url", "warc_type", "content_type", "text").collect()
    assert(back.length == 8)
    assert(back.forall(_.getString(1) == "conversion"))
    assert(back.forall(_.getString(2) == "text/plain; charset=utf-8"))
    val byUrl = back.map(r => r.getString(0) -> r.getString(3)).toMap
    texts.foreach { case (u, t) => assert(byUrl(u) == t) }
    // per-record gzip framing: the WET file is randomly addressable too
    val idx = CdxIO.index(spark, s"$d/x.wet.warc.gz")
    val one = CdxIO.fetchRecords(idx.filter(col("url").endsWith("/w/3")))
      .select("text").collect()
    assert(one.length == 1 && one.head.getString(0) == "Extracted main text of page 3.")
  }

  test("gzipped warc (.warc.gz) reads identically") {
    val d = Files.createTempDirectory("graft-warcgz").toString
    WarcIO.write(rows(7, "g").toDF("url", "payload"), s"$d/g.warc")
    val bytes = Files.readAllBytes(Paths.get(s"$d/g.warc"))
    val gz = new java.util.zip.GZIPOutputStream(
      Files.newOutputStream(Paths.get(s"$d/g.warc.gz")))
    gz.write(bytes); gz.close()
    val back = WarcIO.read(spark, s"$d/g.warc.gz")
    assert(back.count() == 7)
    assert(back.filter(col("url") === "http://example.com/g/3").count() == 1)
  }

  test("a directory of warc files reads with one task per file") {
    val d = Files.createTempDirectory("graft-warcdir").toString
    WarcIO.write(rows(5, "x").toDF("url", "payload"), s"$d/x.warc")
    WarcIO.write(rows(6, "y").toDF("url", "payload"), s"$d/y.warc")
    val back = WarcIO.read(spark, d)
    assert(back.count() == 11)
    assert(back.select("file").distinct().count() == 2)
    assert(back.rdd.getNumPartitions == 2, "one task per file")
  }

  test("writeShards: one WARC per partition, directory read round-trips") {
    val d = Files.createTempDirectory("graft-warcshards").toString + "/out"
    val receipt = WarcIO.writeShards(
      rows(23, "s").toDF("url", "payload").repartition(4), d).collect()
    assert(receipt.length == 4, "one shard row per non-empty partition")
    assert(receipt.map(_.getLong(1)).sum == 23)
    assert(receipt.forall(r => r.getString(0).matches(".*/part-\\d{5}\\.warc")))
    val back = WarcIO.read(spark, d)
    assert(back.count() == 23)
    assert(back.rdd.getNumPartitions == 4, "one read task per shard")
    val byUrl = back.select("url", "text").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    rows(23, "s").foreach { case (u, p) => assert(byUrl(u) == p) }
  }

  test("offsets are byte-exact: fetchRecord(offset) equals the scanned record") {
    val d = Files.createTempDirectory("graft-warcoff").toString
    WarcIO.write(rows(9, "o").toDF("url", "payload"), s"$d/o.warc")
    val scanned = WarcIO.read(spark, s"$d/o.warc")
      .select("url", "offset", "length", "text").collect()
    // offsets strictly increase and lengths tile the record spans
    val offs = scanned.map(_.getLong(1)).sorted
    assert(offs.head == 0L)
    assert(offs.distinct.length == 9, "distinct record offsets")
    scanned.foreach { r =>
      val rec = WarcIO.fetchRecord(s"$d/o.warc", r.getLong(1))
      assert(rec.url == r.getString(0), s"offset ${r.getLong(1)} fetched wrong record")
      assert(rec.text == r.getString(3))
      assert(rec.length == r.getLong(2))
    }
  }

  test("meta-charset prescan: header without charset defers to <meta charset>") {
    val d = Files.createTempDirectory("graft-warcmeta").toString
    val s1 = "café résumé ±°ß"
    val metaPage = s"""<html><head><meta charset="iso-8859-1"></head>""" +
      s"<body><p>$s1</p></body></html>"
    val equivPage = "<html><head><meta http-equiv=\"Content-Type\" " +
      "content=\"text/html; charset=ISO-8859-1\"></head>" +
      s"<body><p>$s1</p></body></html>"
    val df = Seq(
      ("http://example.com/meta", metaPage.getBytes(StandardCharsets.ISO_8859_1),
        "text/html"), // header declares NO charset -> prescan finds the meta
      ("http://example.com/equiv", equivPage.getBytes(StandardCharsets.ISO_8859_1),
        "text/html"),
      // header charset WINS over a lying meta tag (the HTTP precedence rule)
      ("http://example.com/hdr", s"<p>$s1</p>".getBytes(StandardCharsets.UTF_8),
        "text/html; charset=utf-8"))
      .toDF("url", "payload", "content_type")
    WarcIO.write(df, s"$d/m.warc", contentTypeCol = Some("content_type"))
    val back = WarcIO.read(spark, s"$d/m.warc").select("url", "text").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(back("http://example.com/meta").contains(s1),
      s"meta charset must drive the decode: ${back("http://example.com/meta")}")
    assert(back("http://example.com/equiv").contains(s1))
    assert(back("http://example.com/hdr").contains(s1))
  }

  test("truncated payload fails loudly, never silently shortens the corpus") {
    val d = Files.createTempDirectory("graft-warctrunc").toString
    WarcIO.write(rows(3, "t").toDF("url", "payload"), s"$d/t.warc")
    val bytes = Files.readAllBytes(Paths.get(s"$d/t.warc"))
    Files.write(Paths.get(s"$d/trunc.warc"), bytes.dropRight(40))
    val e = intercept[org.apache.spark.SparkException] {
      WarcIO.read(spark, s"$d/trunc.warc").count()
    }
    assert(e.getMessage.contains("EOF inside") ||
      Option(e.getCause).exists(_.getMessage.contains("EOF inside")))
  }

  test("ISO 28500 conformance: every written record carries WARC-Record-ID " +
      "and WARC-Date; CDX timestamps stop degrading to zero") {
    val d = Files.createTempDirectory("graft-warchdr").toString
    val df = Seq(
      ("http://example.com/h/1", "<p>one</p>", "2026-08-16T12:34:56Z"),
      ("http://example.com/h/2", "<p>two</p>", "2026-08-16T12:34:57Z"))
      .toDF("url", "payload", "warc_date")
    WarcIO.write(df, s"$d/h.warc", dateCol = Some("warc_date"))
    val raw = new String(Files.readAllBytes(Paths.get(s"$d/h.warc")),
      StandardCharsets.UTF_8)
    assert(raw.split("WARC/1.0").count(_.contains("WARC-Record-ID: <urn:uuid:")) == 2,
      "every record needs a WARC-Record-ID")
    assert(raw.contains("WARC-Date: 2026-08-16T12:34:56Z"))
    // record ids are name-based: distinct per record, stable per rewrite
    val ids = "urn:uuid:([0-9a-f-]+)".r.findAllMatchIn(raw).map(_.group(1)).toSeq
    assert(ids.length == 2 && ids.distinct.length == 2)
    WarcIO.write(df, s"$d/h2.warc", dateCol = Some("warc_date"))
    assert(java.util.Arrays.equals(
      Files.readAllBytes(Paths.get(s"$d/h.warc")),
      Files.readAllBytes(Paths.get(s"$d/h2.warc"))),
      "a rewritten corpus must be byte-reproducible (name-based ids)")
    // the reader surfaces the date; the CDX timestamp is its digit form
    val back = WarcIO.read(spark, s"$d/h.warc")
      .select("url", "warc_date").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(back("http://example.com/h/1") == "2026-08-16T12:34:56Z")
    val ts = CdxIO.index(spark, s"$d/h.warc")
      .select("timestamp").collect().map(_.getString(0)).toSet
    assert(ts == Set("20260816123456", "20260816123457"), ts.toString)
    // default (no dateCol): the epoch, not an absent header
    WarcIO.write(df, s"$d/e.warc")
    val eTs = CdxIO.index(spark, s"$d/e.warc")
      .select("timestamp").collect().map(_.getString(0)).toSet
    assert(eTs == Set("19700101000000"), eTs.toString)
  }

  test("writeShardsWithRevisits: digest-matched payloads become zero-body " +
      "revisit records; changed/new pages stay full responses") {
    val d = Files.createTempDirectory("graft-warcrev").toString
    val prev = Seq(
      ("http://example.com/a", "<p>alpha body</p>"),
      ("http://example.com/b", "<p>beta body</p>"))
      .toDF("url", "payload")
    WarcIO.write(prev, s"$d/prev.warc")
    val prevIdx = CdxIO.index(spark, s"$d/prev.warc")
    val cur = Seq(
      ("http://example.com/a", "<p>alpha body</p>"),   // unchanged -> revisit
      ("http://example.com/b", "<p>beta CHANGED</p>"), // changed -> response
      ("http://example.com/c", "<p>gamma new</p>"),    // new -> response
      // unchanged content under a NEW url still revisits (mirror page),
      // pointing at the prior capture
      ("http://example.com/a2", "<p>alpha body</p>"))
      .toDF("url", "payload")
    val receipt = WarcIO.writeShardsWithRevisits(cur.repartition(2),
      s"$d/cur", prevIdx).collect()
    assert(receipt.map(_.getLong(1)).sum == 4)
    assert(receipt.map(_.getLong(2)).sum == 2, "a and a2 revisit")
    val back = WarcIO.read(spark, s"$d/cur")
      .select("url", "warc_type", "payload", "text").collect()
      .map(r => r.getString(0) ->
        (r.getString(1), r.getAs[Array[Byte]](2).length, r.getString(3))).toMap
    assert(back("http://example.com/a")._1 == "revisit")
    assert(back("http://example.com/a")._2 == 0, "revisit stores no payload")
    assert(back("http://example.com/a2")._1 == "revisit")
    assert(back("http://example.com/b") == (("response",
      "<p>beta CHANGED</p>".length, "<p>beta CHANGED</p>")))
    assert(back("http://example.com/c")._1 == "response")
    // the raw record carries the ISO 28500 revisit contract: profile,
    // payload digest, refers-to
    val raw = WarcIO.read(spark, s"$d/cur").select("file").distinct()
      .collect().map(_.getString(0))
      .map(f => new String(Files.readAllBytes(Paths.get(f)), StandardCharsets.UTF_8))
      .mkString("\n")
    assert(raw.contains("WARC-Profile: http://netpreservation.org/warc/1.0/" +
      "revisit/identical-payload-digest"))
    assert(raw.contains("WARC-Refers-To-Target-URI: http://example.com/a"))
    val wantDigest = CdxIO.sha1B32("<p>alpha body</p>".getBytes("UTF-8"))
    assert(raw.contains(s"WARC-Payload-Digest: sha1:$wantDigest"))
  }

  test("descriptor hygiene: a LIMIT over the DSv2 scan closes the stream " +
      "(close() threads through; no FD waits for GC)") {
    val d = Files.createTempDirectory("graft-warcfd").toString
    WarcIO.write(rows(50, "fd").toDF("url", "payload"), s"$d/fd.warc")
    val opened0 = WarcIO.scanStreamsOpened.get()
    val closed0 = WarcIO.scanStreamsClosed.get()
    // LIMIT 1 abandons the iterator after the first record — well before
    // clean EOF would close the stream
    val one = spark.read.format("warc").load(s"$d/fd.warc").limit(1).collect()
    assert(one.length == 1)
    val opened = WarcIO.scanStreamsOpened.get() - opened0
    val closed = WarcIO.scanStreamsClosed.get() - closed0
    assert(opened >= 1, "the scan opened at least one stream")
    assert(closed == opened,
      s"every opened stream must close at task end: opened=$opened closed=$closed")
    // the plain iterator path (rdd flatMap) stays clean at EOF too
    WarcIO.read(spark, s"$d/fd.warc").count()
    assert(WarcIO.scanStreamsOpened.get() - opened0 ==
      WarcIO.scanStreamsClosed.get() - closed0)
  }
}
