package graft.operators

import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** Hermetic HTTP transport: loopback fixture server + ranged fetcher +
  * prebuffer over http:// including corruption detection — the end-to-end
  * evidence for S13/S15/T1 that round 1 only had over file://.
  */
class HttpTransportSpec extends SparkSpec {

  private def tmpFile(bytes: Array[Byte]): String = {
    val p = Files.createTempFile("graft-http", ".bin")
    Files.write(p, bytes)
    p.toString
  }

  test("HttpRangeFetcher: size probe and exact ranged reads") {
    val content = Array.tabulate[Byte](10000)(i => (i % 251).toByte)
    val url = HttpFixture.serve(tmpFile(content))
    val f = Prebuffer.fetcherFor(url)
    assert(f.isInstanceOf[Prebuffer.HttpRangeFetcher])
    assert(f.size() == 10000L)
    assert(f.fetchRange(0, 100).toSeq == content.slice(0, 100).toSeq)
    assert(f.fetchRange(9900, 100).toSeq == content.slice(9900, 10000).toSeq)
    assert(f.fetchRange(4321, 1234).toSeq == content.slice(4321, 5555).toSeq)
  }

  test("HttpRangeFetcher: a server that ignores Range still yields the right window") {
    val content = Array.tabulate[Byte](8192)(i => (i * 31 % 256).toByte)
    val url = HttpFixture.serveWithoutRanges(tmpFile(content))
    val f = new Prebuffer.HttpRangeFetcher(url)
    // 200 + full body → the fetcher must skip to the offset, not return the head
    assert(f.fetchRange(4096, 1024).toSeq == content.slice(4096, 5120).toSeq)
    assert(f.fetchRange(0, 64).toSeq == content.slice(0, 64).toSeq)
    assert(f.fetchRange(8000, 192).toSeq == content.slice(8000, 8192).toSeq)
  }

  test("HttpRangeFetcher: 404 fails fast, no retry ladder") {
    val url = HttpFixture.serve(tmpFile(Array[Byte](1, 2, 3)))
    val missing = url.dropRight(1) + "nope"
    val f = new Prebuffer.HttpRangeFetcher(missing, maxRetries = 2, baseBackoffMs = 1)
    val t0 = System.nanoTime()
    val e = intercept[IllegalArgumentException](f.size())
    assert(e.getMessage.contains("404"))
    // permanent failure must NOT pay the backoff ladder (1+2ms here, but the
    // point is one attempt: retrying would re-raise as IOException instead)
    assert((System.nanoTime() - t0) < 5e9)
  }

  test("HttpRangeFetcher: 5xx retries with bounded backoff then a diagnosable failure") {
    val path = tmpFile(Array[Byte](1, 2, 3))
    val url = HttpFixture.serve(path)
    Files.delete(Paths.get(path)) // fixture handler now 500s on every request
    val f = new Prebuffer.HttpRangeFetcher(url, maxRetries = 2, baseBackoffMs = 1)
    val e = intercept[java.io.IOException](f.size())
    assert(e.getMessage.contains("3 attempts"))
    assert(e.getMessage.contains("500"))
  }

  test("prebuffer over http://: verified chunks land byte-exact in the cache") {
    val content = Array.tabulate[Byte](700)(i => (i * 7 % 256).toByte)
    val src = tmpFile(content)
    val (_, chunks) = Merkle.chunkFile(spark, src)
    val hashes = Merkle.leafHashes(chunks).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    val cache = Files.createTempFile("graft-cache", ".bin").toString
    val result = Prebuffer.prebuffer(spark, HttpFixture.serve(src), cache, hashes,
      0, 700, policy = Prebuffer.ChunkPolicy.Aggressive).collect()
    assert(result.length == hashes.size)
    assert(result.forall(_.getBoolean(1)), result.mkString(";"))
    assert(Files.readAllBytes(Paths.get(cache)).toSeq == content.toSeq)
  }

  test("prebuffer over http://: a corrupted expectation is refused, not cached") {
    val content = Array.tabulate[Byte](300)(i => i.toByte)
    val src = tmpFile(content)
    val (_, chunks) = Merkle.chunkFile(spark, src)
    val hashes = Merkle.leafHashes(chunks).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    // flip chunk 1's expected hash → that chunk must come back invalid
    val tampered = hashes.updated(1, "0" * 64)
    val cache = Files.createTempFile("graft-cache2", ".bin").toString
    val byIdx = Prebuffer.prebuffer(spark, HttpFixture.serve(src), cache, tampered, 0, 300)
      .collect().map(r => r.getInt(0) -> r.getBoolean(1)).toMap
    assert(!byIdx(1))
    assert(byIdx.filter(_._1 != 1).values.forall(identity))
  }
}
