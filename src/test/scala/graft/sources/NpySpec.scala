package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.xvec.{XvecFormat, XvecIO}

/** NumPy .npy as a member of the xvec scan family: header parse, roundtrip,
  * pushdown, streaming, malformed rejection. (Interop with numpy itself was
  * cross-validated out-of-band: numpy.save -> this scan, this writer ->
  * numpy.load, bit-equal both ways.)
  */
class NpySpec extends SparkSpec {
  import spark.implicits._

  private def write(path: String, n: Int, dim: Int): Unit =
    XvecIO.write((0 until n).map(i =>
      (i.toLong, Array.tabulate(dim)(j => i * 100f + j))).toDF("ordinal", "vector"), path)

  test("npy roundtrip preserves every value; header carries shape") {
    val path = Files.createTempDirectory("npy").toString + "/v.npy"
    write(path, 40, 7)
    val (dim, off, count) = XvecFormat.Npy.fileMeta(Paths.get(path))
    assert((dim, off, count) == (7, 128L, 40L))
    val back = XvecIO.read(spark, path).orderBy("ordinal").collect()
    assert(back.length == 40)
    back.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(0) == i)
      assert(r.getSeq[Float](1) == (0 until 7).map(j => i * 100f + j))
    }
  }

  test("ordinal pushdown and window option prune npy byte ranges") {
    val path = Files.createTempDirectory("npy2").toString + "/v.npy"
    write(path, 300, 4)
    val filtered = XvecIO.read(spark, path).filter(col("ordinal") >= 100 && col("ordinal") < 110)
    assert(filtered.count() == 10)
    val windowed = XvecIO.read(spark, path, window = "[20..35)")
      .agg(count(lit(1)), min("ordinal"), max("ordinal")).collect()(0)
    assert((windowed.getLong(0), windowed.getLong(1), windowed.getLong(2)) == (15L, 20L, 34L))
  }

  test("npy streams through readStream like any xvec member") {
    val path = Files.createTempDirectory("npy3").toString + "/v.npy"
    write(path, 120, 3)
    val q = spark.readStream.format("xvec").load(path)
      .writeStream.format("memory").queryName("npystream")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    assert(spark.table("npystream").count() == 120)
  }

  test("malformed npy files are rejected with reasons") {
    val d = Files.createTempDirectory("npy4").toString
    val good = s"$d/good.npy"
    write(good, 10, 4)
    val bytes = Files.readAllBytes(Paths.get(good))

    val badMagic = bytes.clone(); badMagic(0) = 'X'.toByte
    Files.write(Paths.get(s"$d/badmagic.npy"), badMagic)
    assertThrows[IllegalArgumentException](
      XvecFormat.Npy.fileMeta(Paths.get(s"$d/badmagic.npy")))

    // dtype '<f8' rejected (only float32)
    val f8 = new String(bytes.slice(0, 128), "ISO-8859-1").replace("<f4", "<f8")
    Files.write(Paths.get(s"$d/f8.npy"), f8.getBytes("ISO-8859-1") ++ bytes.drop(128))
    val e = intercept[IllegalArgumentException](
      XvecFormat.Npy.fileMeta(Paths.get(s"$d/f8.npy")))
    assert(e.getMessage.contains("<f4"))

    // fortran order rejected
    val ft = new String(bytes.slice(0, 128), "ISO-8859-1").replace("False", "True ")
    Files.write(Paths.get(s"$d/fortran.npy"), ft.getBytes("ISO-8859-1") ++ bytes.drop(128))
    assertThrows[IllegalArgumentException](
      XvecFormat.Npy.fileMeta(Paths.get(s"$d/fortran.npy")))

    // truncated data (shape/size mismatch)
    Files.write(Paths.get(s"$d/trunc.npy"), bytes.dropRight(4))
    assertThrows[IllegalArgumentException](
      XvecFormat.Npy.fileMeta(Paths.get(s"$d/trunc.npy")))
  }

  test("empty dataset round-trips: shape (0,0) written, 0 rows read back") {
    val path = Files.createTempDirectory("npy6").toString + "/empty.npy"
    XvecIO.write(Seq.empty[(Long, Array[Float])].toDF("ordinal", "vector"), path)
    val (_, _, count) = XvecFormat.Npy.fileMeta(Paths.get(path))
    assert(count == 0L)
    assert(XvecIO.read(spark, path).count() == 0L)
  }

  test("v2.0 headers (u32 dict length) parse too") {
    val path = Files.createTempDirectory("npy5").toString + "/v2.npy"
    val dict = "{'descr': '<f4', 'fortran_order': False, 'shape': (3, 2), }"
    val pad = 118 - dict.length // total header 12 + 118 = 130... keep any length
    val head = java.nio.ByteBuffer.allocate(12 + dict.length + pad)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    head.put(0x93.toByte).put("NUMPY".getBytes("ISO-8859-1"))
      .put(2.toByte).put(0.toByte).putInt(dict.length + pad)
    head.put(dict.getBytes("ISO-8859-1"))
    (0 until pad - 1).foreach(_ => head.put(' '.toByte))
    head.put('\n'.toByte)
    val data = java.nio.ByteBuffer.allocate(24).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until 6).foreach(i => data.putFloat(i * 1.5f))
    Files.write(Paths.get(path), head.array() ++ data.array())
    val (dim, off, count) = XvecFormat.Npy.fileMeta(Paths.get(path))
    assert((dim, count) == (2, 3L) && off == 12L + dict.length + pad)
    val rows = XvecIO.read(spark, path).orderBy("ordinal").collect()
    assert(rows(2).getSeq[Float](1) == Seq(6.0f, 7.5f))
  }
}
