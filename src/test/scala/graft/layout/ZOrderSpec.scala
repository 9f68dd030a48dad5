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

  test("zValueN/unzValueN round-trip 3 columns and match the hand Morton code") {
    val df = spark.range(16L * 16L * 16L).select(
      (col("id") / 256).cast("long").as("a"),
      pmod((col("id") / 16).cast("long"), lit(16L)).as("b"),
      pmod(col("id"), lit(16L)).as("c"))
    val z = ZOrder.zValueN(Seq(col("a"), col("b"), col("c")), 4)
    val rs = ZOrder.unzValueN(z, 3, 4)
    val bad = df.select(col("a"), col("b"), col("c"),
        rs(0).as("ra"), rs(1).as("rb"), rs(2).as("rc"))
      .filter(col("a") =!= col("ra") || col("b") =!= col("rb") ||
        col("c") =!= col("rc")).count()
    assert(bad == 0L)
    assert(df.select(z.as("z")).distinct().count() == 4096L)
    // hand replay: column j's bit i -> z bit 3i + j
    def morton3(a: Long, b: Long, c: Long) = (0 until 4).map(i =>
      (((a >> i) & 1) << (3 * i)) + (((b >> i) & 1) << (3 * i + 1)) +
        (((c >> i) & 1) << (3 * i + 2))).sum
    val got = Seq((1L, 0L, 0L), (0L, 1L, 0L), (0L, 0L, 1L), (5L, 3L, 9L))
      .toDF("a", "b", "c")
      .select(ZOrder.zValueN(Seq(col("a"), col("b"), col("c")), 4).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(morton3(1, 0, 0), morton3(0, 1, 0), morton3(0, 0, 1),
      morton3(5, 3, 9)))
    // n=2 delegation preserves the original layout exactly
    val same = spark.range(1000).select(
        pmod(col("id") * 7, lit(256L)).as("a"), pmod(col("id") * 13, lit(256L)).as("b"))
      .select((ZOrder.zValue(col("a"), col("b"), 8) ===
        ZOrder.zValueN(Seq(col("a"), col("b")), 8)).as("eq"))
      .filter(!col("eq")).count()
    assert(same == 0L)
  }

  test("3-D z-layout: each TRAILING dim slices to a tile set; 1-d sort reads everything") {
    // 32x32x32 cube, 64 files; filter on y or z alone must prune the
    // z-ordered layout but touch every file of the x-sorted one
    val cube = spark.range(32L * 32L * 32L).select(
      (col("id") / 1024).cast("long").as("x"),
      pmod((col("id") / 32).cast("long"), lit(32L)).as("y"),
      pmod(col("id"), lit(32L)).as("z"))
    val zDir = java.nio.file.Files.createTempDirectory("zorder3").toString + "/t"
    ZOrder.zorderWriteN(cube, zDir, Seq("x", "y", "z"), bits = 5, nFiles = 64)
    // DETERMINISTIC 1-d layout: 64 explicit 512-row slices of the x-major
    // order via partitionBy (repartitionByRange's SAMPLED boundaries moved
    // the touched-file count by several files run to run — this test
    // failed twice on that jitter before the slices were pinned). Each
    // slice = half an x value (y in [0,16) or [16,32), all z).
    val sDir = java.nio.file.Files.createTempDirectory("xsort3").toString + "/t"
    cube.withColumn("pid",
        ((col("x") * 1024 + col("y") * 32 + col("z")) / 512).cast("int"))
      .repartition(col("pid")).sortWithinPartitions("x", "y", "z")
      .write.partitionBy("pid").parquet(sDir)

    def filesWithMatches(dir: String, pred: org.apache.spark.sql.Column): Int = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      val files = walk(new java.io.File(dir))
        .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath)
      assert(files.length == 64, s"$dir: expected 64 files, got ${files.length}")
      files.count(f => spark.read.parquet(f).filter(pred).limit(1).count() > 0)
    }
    // an eighth-slab on each trailing dim (4 of 32 values). The y slab
    // straddles y=16 so BOTH halves of every x value contain slab rows —
    // the 1-d layout must touch all 64 files exactly; a slab inside one
    // half would get lucky pruning that says nothing about the sort order.
    for ((dim, lo) <- Seq(("y", 14), ("z", 8))) {
      val pred = col(dim) >= lo && col(dim) < lo + 4
      val zTouched = filesWithMatches(zDir, pred)
      val sTouched = filesWithMatches(sDir, pred)
      assert(sTouched == 64,
        s"$dim: the pinned 1-d slices all contain slab rows, got $sTouched")
      // the z side still carries sampled-boundary slack (zorderWriteN
      // range-partitions on the sampled z-value; observed 39..41 for the
      // ideal 32-file tile set) — the asymmetry vs 64 is what's pinned
      assert(zTouched <= 45,
        s"$dim: 3-D z-layout should prune substantially, got $zTouched")
    }
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
