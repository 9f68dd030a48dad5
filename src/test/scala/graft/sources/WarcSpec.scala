package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** WARC container contracts: write→read round trip with the HTTP
  * envelope stripped, gzip members, directory fan-out (one task per
  * file), and loud failure on truncation.
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
      .select("url", "payload", "warc_type").collect()
    assert(back.length == 20)
    assert(back.forall(_.getString(2) == "response"))
    val byUrl = back.map(r => r.getString(0) -> r.getString(1)).toMap
    rows(20, "a").foreach { case (u, p) =>
      assert(byUrl(u) == p, s"payload mismatch for $u")
    }
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
}
