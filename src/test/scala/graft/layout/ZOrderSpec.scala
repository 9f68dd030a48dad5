package graft.layout

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Z-order: interleave/de-interleave round trip, monotone tiling, and the
  * measured pruning asymmetry vs a 1-d sort (the reason the layout
  * exists).
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zValue/unzValue round-trip every 8-bit pair") {
    val df = spark.range(256L * 256L).select(
      (col("id") / 256).cast("long").as("a"),
      pmod(col("id"), lit(256L)).as("b"))
    val (ra, rb) = ZOrder.unzValue(ZOrder.zValue(col("a"), col("b"), 8), 8)
    val bad = df.select(col("a"), col("b"), ra.as("ra"), rb.as("rb"))
      .filter(col("a") =!= col("ra") || col("b") =!= col("rb")).count()
    assert(bad == 0L)
    // bijective: 65536 distinct z values
    assert(df.select(ZOrder.zValue(col("a"), col("b"), 8).as("z"))
      .distinct().count() == 65536L)
  }

  test("zValue matches the hand-computed Morton code on known points") {
    val got = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (255L, 1L))
      .toDF("a", "b")
      .select(ZOrder.zValue(col("a"), col("b"), 8).as("z"))
      .collect().map(_.getLong(0)).toSeq
    def morton(a: Long, b: Long) = (0 until 8).map(i =>
      (((a >> i) & 1) << (2 * i)) + (((b >> i) & 1) << (2 * i + 1))).sum
    assert(got == Seq(morton(0, 0), morton(1, 0), morton(0, 1),
      morton(3, 5), morton(255, 1)))
  }

  test("y-only filter touches every x-sorted file but only the z-layout's tile row") {
    // 64x64 grid, 16 files of 256 rows each
    val grid = spark.range(64L * 64L).select(
      (col("id") / 64).cast("long").as("x"), pmod(col("id"), lit(64L)).as("y"))
    val zDir = java.nio.file.Files.createTempDirectory("zorder").toString + "/t"
    ZOrder.zorderWrite(grid, zDir, "x", "y", bits = 6, nFiles = 16)
    val xDir = java.nio.file.Files.createTempDirectory("xsort").toString + "/t"
    grid.repartitionByRange(16, col("x"), col("y"))
      .sortWithinPartitions("x", "y").write.parquet(xDir)

    def filesWithMatches(dir: String): Int = {
      val files = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath)
      assert(files.length == 16, s"$dir: expected 16 files, got ${files.length}")
      files.count(f => spark.read.parquet(f)
        .filter(col("y") >= 8 && col("y") < 16).limit(1).count() > 0)
    }
    val zFiles = filesWithMatches(zDir)
    val xFiles = filesWithMatches(xDir)
    // z layout: 16 files = 16x16 tiles; y in [8,16) lives in the 4 tiles
    // of the first tile row. x-sorted layout: every file holds all y.
    assert(zFiles <= 6, s"z-ordered layout should localize the y slice, got $zFiles files")
    assert(xFiles == 16, s"x-sorted layout must touch every file, got $xFiles")
  }
}
