package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** dHash contracts: closed-form gradients/flats, CODEC invariance (the
  * same raster through PPM, BMP and PNG hashes identically), resize
  * stability, small-perturbation locality, undecodable-null routing,
  * and pigeonhole near-dup pairs verified against brute force.
  */
class ImageHashSpec extends SparkSpec {
  import spark.implicits._

  private def raster(w: Int, h: Int)(f: (Int, Int) => Int): Array[Byte] =
    Array.tabulate(3 * w * h) { j =>
      val p = j / 3
      f(p % w, p / w).toByte
    }

  test("left-to-right gradient sets all 64 bits; flat image sets none") {
    val grad = MediaCodecs.encodePpm(9, 8, raster(9, 8)((x, _) => x * 20))
    assert(ImageHash.dHash(grad).contains(-1L), "all comparisons increase")
    val flat = MediaCodecs.encodePpm(9, 8, raster(9, 8)((_, _) => 77))
    assert(ImageHash.dHash(flat).contains(0L))
  }

  test("codec invariance: the same raster hashes identically via PPM, BMP, PNG") {
    val px = raster(30, 20)((x, y) => (x * 7 + y * 13) % 256)
    val viaPpm = ImageHash.dHash(MediaCodecs.encodePpm(30, 20, px))
    val viaBmp = ImageHash.dHash(MediaCodecs.encodeBmp(30, 20, px))
    val viaPng = ImageHash.dHash(MediaCodecs.encodePng(30, 20, px))
    assert(viaPpm.isDefined)
    assert(viaPpm == viaBmp, "re-encoded duplicate must hash equal (BMP)")
    assert(viaPpm == viaPng, "re-encoded duplicate must hash equal (PNG)")
  }

  test("nearest-resize stability: a 10x-scaled image hashes like the original") {
    val small = raster(9, 8)((x, y) => (x * 11 + y * 23) % 256)
    val big = raster(90, 80)((x, y) => ((x / 10) * 11 + (y / 10) * 23) % 256)
    assert(ImageHash.dHash(MediaCodecs.encodePpm(9, 8, small)) ==
      ImageHash.dHash(MediaCodecs.encodePpm(90, 80, big)))
  }

  test("one-pixel perturbation flips at most its adjacent comparisons") {
    val base = raster(9, 8)((x, y) => (x * 17 + y * 29) % 256)
    val h0 = ImageHash.dHash(MediaCodecs.encodePpm(9, 8, base)).get
    val tweaked = base.clone()
    tweaked(0) = ((tweaked(0) & 0xff) ^ 0x30).toByte // corner pixel, R channel
    val h1 = ImageHash.dHash(MediaCodecs.encodePpm(9, 8, tweaked)).get
    assert(java.lang.Long.bitCount(h0 ^ h1) <= 1,
      "a corner pixel participates in exactly one comparison")
  }

  test("undecodable payloads yield null and drop out of the hash frame") {
    val rows = Seq(
      (1L, MediaCodecs.encodePpm(9, 8, raster(9, 8)((x, _) => x))),
      (2L, Array[Byte](1, 2, 3, 4))).toDF("id", "img")
    val hs = ImageHash.dHashDf(rows, "id", "img").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(hs(1L).isDefined && hs(2L).isEmpty)
  }

  test("videoFrameHashes: per-frame hashes equal the single-image dHash") {
    val frames = (0 until 3).map(f =>
      raster(9, 8)((x, y) => (f * 101 + x * 11 + y * 23) % 256))
    val video = frames.map(MediaCodecs.encodePpm(9, 8, _)).reduce(_ ++ _)
    val got = ImageHash.videoFrameHashes(
        Seq((5L, video)).toDF("id", "video"), "id", "video")
      .collect().map(r => r.getInt(1) -> r.getLong(2)).toMap
    assert(got.keySet == Set(0, 1, 2))
    frames.zipWithIndex.foreach { case (px, f) =>
      assert(got(f) == ImageHash.dHash(MediaCodecs.encodePpm(9, 8, px)).get,
        s"frame $f hash must equal its standalone dHash")
    }
  }

  test("videoNearDupPairs: one-frame edit pairs, disjoint videos never pair") {
    def video(seed: Int, editLast: Boolean) = (0 until 4).map { f =>
      val ef = if (editLast && f == 3) 99 else f
      MediaCodecs.encodePpm(9, 8,
        raster(9, 8)((x, y) => (seed * 37 + ef * 101 + x * 11 + y * 23) % 256))
    }.reduce(_ ++ _)
    val rows = Seq(
      (1L, video(1, editLast = false)), (1001L, video(1, editLast = true)),
      (2L, video(2, editLast = false)), (3L, video(3, editLast = false)))
      .toDF("id", "video")
    val fh = ImageHash.videoFrameHashes(rows, "id", "video")
    val pairs = ImageHash.videoNearDupPairs(fh, minJaccard = 0.5).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
    assert(pairs.keySet == Set((1L, 1001L)), s"only the edited twin pairs: $pairs")
    // 3 shared frames of 5 distinct hashes -> jaccard 0.6
    assert(pairs((1L, 1001L)) == 0.6, pairs.toString)
  }

  test("nearDupPairs equals brute force on planted near-dups (pigeonhole recall)") {
    val rnd = new scala.util.Random(7)
    val rasters = (0 until 40).map(i =>
      i.toLong -> raster(9, 8)((x, y) => ((i * 37 + x * 11 + y * 5) + rnd.nextInt(3)) % 256))
    // plant near-dups: ids 100+i = id i with one corner byte nudged
    val planted = rasters.take(10).map { case (i, px) =>
      val t = px.clone(); t(0) = ((t(0) & 0xff) ^ 0x20).toByte
      (100 + i) -> t
    }
    val all = (rasters ++ planted).map { case (id, px) =>
      (id, MediaCodecs.encodePpm(9, 8, px))
    }.toDF("id", "img")
    val hashes = ImageHash.dHashDf(all, "id", "img").cache()
    val got = ImageHash.nearDupPairs(hashes, maxHamming = 6, chunks = 8)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force over the collected hashes
    val hs = hashes.collect().map(r => r.getLong(0) -> r.getLong(1))
    val want = (for {
      (a, ha) <- hs; (b, hb) <- hs if a < b
      if java.lang.Long.bitCount(ha ^ hb) <= 6
    } yield (a, b)).toSet
    assert(got == want, s"got=$got\nwant=$want")
    assert(want.size >= 10, "every planted pair is within radius")
  }

  test("bucketCap: a 1k-row identical-hash cluster never floods candidates") {
    import org.apache.spark.sql.functions._
    // perceptual-hash skew in miniature: 1000 flat images collapse onto
    // ONE hash value (the quadratic-bucket trap — uncapped, that single
    // bucket alone is ~500k candidate pairs); two distinct near-dup
    // images sit outside the cluster
    val flat = (0L until 1000L).map(i => (i, 0x0123456789abcdefL))
    val near = Seq((5000L, 0x00000000000000ffL), (5001L, 0x00000000000000fdL))
    val sims = (flat ++ near).toDF("id", "simhash")
    val got = Dedup.simhashNearDupPairs(sims, maxHamming = 3, chunks = 4,
        bits = 64, bucketCap = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((5000L, 5001L, 1L)),
      s"hot cluster excluded from candidate generation, near pair kept: ${got.toSeq}")
    // the audit twin REPORTS what the cap dropped: the cluster's hash is
    // over-cap at every chunk position, the near pair's buckets are not
    val report = Dedup.simhashHotBucketReport(sims, chunks = 4, bits = 64,
        bucketCap = 100)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(report.length == 4 && report.forall(_._3 == 1000L),
      s"all 4 chunk positions of the flat cluster are hot: ${report.toSeq}")
    val h = 0x0123456789abcdefL
    assert(report.toSet == (0 until 4).map(c =>
      (c, (h >>> (c * 16)) & 0xffffL, 1000L)).toSet, report.toSeq.toString)
    // exact-equal dedup is the cap-independent first pass the scaladoc
    // routes true duplicates through
    val exact = sims.groupBy("simhash").count().filter(col("count") > 1).collect()
    assert(exact.length == 1 && exact.head.getLong(1) == 1000L)
  }

  test("videoNearDupPairs frameDfCap: a shared degenerate frame never pairs " +
      "disjoint videos; emitted jaccard stays EXACT") {
    import org.apache.spark.sql.functions._
    // frame-hash sets built directly: A and B are disjoint except for a
    // black frame shared by A, B and C; C shares 2 real frames with A
    val black = 0L
    val rows = Seq(
      (1L, 0, 11L), (1L, 1, 12L), (1L, 2, 13L), (1L, 3, black), // A
      (2L, 0, 21L), (2L, 1, 22L), (2L, 2, 23L), (2L, 3, black), // B
      (3L, 0, 11L), (3L, 1, 12L), (3L, 2, 33L), (3L, 3, black)) // C
      .toDF("id", "frame_idx", "dhash")
      .select(col("id"), col("dhash"))
    // uncapped at a permissive threshold, the black frame PAIRS the
    // disjoint videos (jaccard 1/7) — the hot-key failure
    val uncapped = ImageHash.videoNearDupPairs(rows, minJaccard = 0.1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.contains((1L, 2L)), s"uncapped baseline: $uncapped")
    // capped (black appears in 3 > 2 videos): A-B share ONLY the hot
    // frame -> never a candidate; A-C pair via cool frames with the
    // EXACT jaccard (2 cool + 1 hot shared = 3 of 5 distinct)
    val capped = ImageHash.videoNearDupPairs(rows, minJaccard = 0.1,
        frameDfCap = 2)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    assert(!capped.contains((1L, 2L)),
      s"hot-frame-only overlap must not generate a candidate: $capped")
    assert(capped.keySet == Set((1L, 3L)) &&
      capped((1L, 3L)) == ((3L, 0.6)),
      s"shared = cool + hot decomposition stays exact: $capped")
  }
}
