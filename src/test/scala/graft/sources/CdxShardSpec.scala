package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Sharded crawl-index artifacts — Common Crawl's layout: the CDX
  * range-partitions into sorted gzipped shards + a driver-side
  * cluster.idx, a point lookup binary-searches the cluster index and
  * touches ONE shard, and the WET export has a per-partition distributed
  * twin. The scale forms of the single-file writers.
  */
class CdxShardSpec extends SparkSpec {
  import spark.implicits._

  private def fixture(n: Int): (String, String) = {
    val d = Files.createTempDirectory("graft-cdxshard").toString
    val rows = (0 until n).map(i =>
      (f"http://h${i % 9}.example.com/page/$i%03d",
        s"<html><body><p>Sharded index page $i body text.</p></body></html>"))
    WarcIO.write(rows.toDF("url", "payload"), s"$d/shard.warc")
    (d, s"$d/shard.warc")
  }

  test("writeCdxjShards: sorted disjoint ranges, cluster.idx, frame equality") {
    val (d, warc) = fixture(90)
    val idx = CdxIO.index(spark, warc)
    val receipt = CdxIO.writeCdxjShards(idx, s"$d/cdx", shards = 4)
      .orderBy("shard").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getString(3)))
    assert(receipt.map(_._2).sum == 90)
    assert(receipt.length >= 2, "range partitioning produced several shards")
    // each shard is internally sorted; ranges are disjoint and ordered
    receipt.foreach { case (_, _, first, last) => assert(first <= last) }
    receipt.sliding(2).foreach {
      case Array((_, _, _, lastA), (_, _, firstB, _)) =>
        assert(lastA <= firstB, s"shard ranges must not interleave: $lastA > $firstB")
      case _ =>
    }
    // cluster.idx mirrors the receipt, one line per shard
    val cluster = new String(
      Files.readAllBytes(Paths.get(s"$d/cdx/cluster.idx")), "UTF-8")
      .linesIterator.toSeq
    assert(cluster.size == receipt.length)
    // the sharded read equals the single-file frame exactly
    val back = CdxIO.readCdxjShards(spark, s"$d/cdx")
    assert(back.collect().map(_.toSeq).toSet ==
      idx.collect().map(_.toSeq).toSet)
    // ...and each shard FILE is sorted (the binary-search precondition)
    val shard0 = receipt.head._1
    val in = new java.util.zip.GZIPInputStream(
      Files.newInputStream(Paths.get(s"$d/cdx/$shard0")))
    val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().toVector finally in.close()
    assert(lines == lines.sorted, "shard content must be sorted")
  }

  test("probeShards: a point lookup touches exactly the covering shard") {
    val (d, warc) = fixture(90)
    val idx = CdxIO.index(spark, warc)
    CdxIO.writeCdxjShards(idx, s"$d/cdx", shards = 4)
    val keys = idx.select("urlkey").collect().map(_.getString(0))
    val receipt = new String(
      Files.readAllBytes(Paths.get(s"$d/cdx/cluster.idx")), "UTF-8")
      .linesIterator.map(_.split('\t')).map(p => (p(0), p(1), p(2))).toVector
    keys.foreach { k =>
      val shards = CdxIO.probeShards(s"$d/cdx", k)
      assert(shards.nonEmpty, s"every indexed key must probe to a shard: $k")
      // the probe returns exactly the shards whose range covers the key
      val want = receipt.filter(e => e._1 <= k && k <= e._2).map(_._3)
      assert(shards == want, s"probe($k): $shards != $want")
      // and the key's record really lives in a probed shard
      val in = new java.util.zip.GZIPInputStream(
        Files.newInputStream(Paths.get(s"$d/cdx/${shards.head}")))
      val hit = try scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().exists(_.startsWith(k + " ")) finally in.close()
      assert(hit, s"key $k missing from its probed shard ${shards.head}")
    }
    // keys outside every range probe to nothing
    assert(CdxIO.probeShards(s"$d/cdx", "zzz,nowhere)/x").isEmpty)
    assert(CdxIO.probeShards(s"$d/cdx", "aaa)/x").isEmpty)
  }

  test("lookupKeys: only covering shards are READ (inputFiles), hits exact") {
    val (d, warc) = fixture(90)
    val idx = CdxIO.index(spark, warc)
    CdxIO.writeCdxjShards(idx, s"$d/cdx", shards = 5)
    val all = idx.select("urlkey", "url").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    // three keys from (likely) the same region + the full-read baseline
    val keys = all.keys.toSeq.sorted.take(3)
    val hits = CdxIO.lookupKeys(spark, s"$d/cdx", keys)
    val wantShards = keys.flatMap(CdxIO.probeShards(s"$d/cdx", _)).distinct
    // the plan reads ONLY the covering shards — observable via inputFiles
    val readFiles = hits.inputFiles.map(_.split('/').last).toSet
    assert(readFiles == wantShards.toSet,
      s"pruned read touched $readFiles, cluster.idx said $wantShards")
    val nShards = new String(java.nio.file.Files.readAllBytes(
      Paths.get(s"$d/cdx/cluster.idx")), "UTF-8").linesIterator.size
    assert(wantShards.size < nShards,
      "vacuous: the key set must not cover every shard")
    val got = hits.select("urlkey", "url").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == keys.map(k => k -> all(k)).toMap)
    // keys outside every range return an EMPTY frame with the schema
    val none = CdxIO.lookupKeys(spark, s"$d/cdx", Seq("zzz,nowhere)/x"))
    assert(none.columns.toSeq == hits.columns.toSeq && none.count() == 0)
  }

  test("fetchRecords plan: NO exchange — the request sort is partition-local") {
    val (d, warc) = fixture(30)
    val idx = CdxIO.index(spark, warc)
    val fetched = CdxIO.fetchRecords(idx)
    fetched.collect()
    val plan = fetched.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"coalescing must not buy an exchange — sortWithinPartitions only:\n$plan")
  }

  test("writeWetShards: one conversion-record shard per partition, " +
      "read round-trips, per-record gzip members") {
    val d = Files.createTempDirectory("graft-wetshard").toString
    val docs = (0 until 40).map(i =>
      (s"http://example.com/doc/$i", s"Extracted text of document $i."))
      .toDF("url", "text")
    val receipt = WarcIO.writeWetShards(docs.repartition(3), s"$d/wet")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(receipt.length == 3 && receipt.map(_._2).sum == 40)
    assert(receipt.forall(_._1.endsWith(".wet.warc.gz")))
    val back = WarcIO.read(spark, s"$d/wet")
      .select("url", "warc_type", "text").collect()
    assert(back.length == 40)
    assert(back.forall(_.getString(1) == "conversion"))
    val byUrl = back.map(r => r.getString(0) -> r.getString(2)).toMap
    (0 until 40).foreach(i => assert(
      byUrl(s"http://example.com/doc/$i") == s"Extracted text of document $i."))
    // per-record members -> the gz shards are CDX-indexable (random access)
    val idx = CdxIO.index(spark, s"$d/wet")
    assert(idx.count() == 40)
    val one = CdxIO.fetchRecords(idx.filter(col("url").endsWith("/doc/7")))
      .select("text").collect()
    assert(one.length == 1 && one.head.getString(0).contains("document 7"))
  }
}
