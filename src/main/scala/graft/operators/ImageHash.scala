package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Perceptual image hashing for multimodal dedup — the image-column
  * analogue of the text SimHash family: a 64-bit DIFFERENCE HASH (dHash,
  * public technique: nearest-resize to 9×8, integer grayscale, one bit
  * per horizontally-adjacent comparison), stable under re-encoding and
  * small pixel noise, so exact-equal hashes catch re-encoded duplicates
  * and small-Hamming pairs catch near-duplicates (crops/watermarks
  * change few comparisons).
  *
  * Spark shape: hashing is a per-row map through the
  * [[MediaCodecs.JvmCodec]] decode seam (PPM/BMP hand-rolled, PNG/JPEG/
  * GIF via ImageIO — undecodable payloads yield null and drop out);
  * near-dup candidate generation reuses the text family's pigeonhole
  * chunk banding ([[Dedup.simhashNearDupPairs]] at 64 bits): candidates
  * are equality-bucket joins verified by bit_count. The candidate space
  * is bucket-quadratic, not corpus-quadratic — which is only a useful
  * bound when the buckets stay small. The defaults (4 chunks = 16-bit
  * keys, 65,536 buckets per position) and the `bucketCap` skew guard
  * keep them small: dHash concentrates on few values for flat/smooth
  * images, and an uncapped hot bucket pairs everything inside it. At
  * corpus scale ALWAYS set `bucketCap` (and dedup exact-equal hashes by
  * `groupBy(dhash)` first — the cap never affects exact duplicates).
  */
object ImageHash {

  /** 64-bit dHash of one encoded image; None when no codec decodes it.
    * Bit (y*8+x) is set when gray(x+1, y) > gray(x, y) on the 9×8
    * nearest-resized integer-grayscale grid ((r+g+b)/3, integer
    * division) — every step integer-exact, so an oracle can replay the
    * hash from the raster formula.
    */
  def dHash(payload: Array[Byte]): Option[Long] =
    MediaCodecs.JvmCodec.decodeImage(payload).map { case (w0, h0, px) =>
      val g = new Array[Int](9 * 8)
      var y = 0
      while (y < 8) {
        val sy = (y.toLong * h0 / 8).toInt
        var x = 0
        while (x < 9) {
          val sx = (x.toLong * w0 / 9).toInt
          val s = 3 * (sy * w0 + sx)
          g(y * 9 + x) =
            ((px(s) & 0xff) + (px(s + 1) & 0xff) + (px(s + 2) & 0xff)) / 3
          x += 1
        }
        y += 1
      }
      var h = 0L
      var i = 0
      while (i < 64) {
        val yy = i / 8
        val xx = i % 8
        if (g(yy * 9 + xx + 1) > g(yy * 9 + xx)) h |= (1L << i)
        i += 1
      }
      h
    }

  /** DataFrame form: (idCol, dhash) — null for undecodable payloads
    * (route those to quarantine, don't guess). Per-row map, zero shuffle.
    */
  def dHashDf(docs: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val h = udf((p: Array[Byte]) =>
      if (p == null) None else dHash(p))
    docs.select(col(idCol), h(col(payloadCol)).as("dhash"))
  }

  /** Near-duplicate image pairs within `maxHamming` bits: the pigeonhole
    * chunk-banded join over (id, dhash) rows — with `chunks` >
    * `maxHamming`, any qualifying pair agrees exactly on ≥1 chunk, so
    * candidates are equality-bucket joins verified by bit_count.
    * Output: (id_a, id_b, hamming).
    *
    * Defaults are the SCALE-SAFE point: 3/4 gives 16-bit chunk keys
    * (65,536 buckets per position, expected candidates ~n²·4/65,536 on
    * uniform hashes). 6/8 (8-bit keys, 256 buckets, ~n²/32 candidates)
    * trades that for recall at higher Hamming radius — an explicit
    * opt-in for bounded corpora. `bucketCap > 0` additionally drops
    * over-cap buckets from candidate generation (dHash skew: flat images
    * collapse onto few hash values) — set it at corpus scale.
    */
  def nearDupPairs(hashes: DataFrame, maxHamming: Int = 3,
      chunks: Int = 4, bucketCap: Int = 0): DataFrame =
    Dedup.simhashNearDupPairs(
      hashes.filter(col("dhash").isNotNull)
        .select(col(hashes.columns.head).as("id"), col("dhash").as("simhash")),
      maxHamming, chunks, bits = 64, bucketCap = bucketCap)

  /** Per-frame dHashes of a concatenated-PPM video payload (the
    * [[MediaCodecs.splitPpmStream]] container): (idCol, frame_idx,
    * dhash). Undecodable payloads contribute no rows. Per-row flatMap,
    * zero shuffle — the video-dedup signature generator.
    */
  def videoFrameHashes(docs: DataFrame, idCol: String,
      payloadCol: String): DataFrame = {
    val fh = udf((p: Array[Byte]) =>
      if (p == null) Seq.empty[(Int, Long)]
      else MediaCodecs.splitPpmStream(p).map(_.zipWithIndex.flatMap {
        case (frame, i) => dHash(frame).map(h => (i, h))
      }).getOrElse(Seq.empty))
    docs.select(col(idCol), explode(fh(col(payloadCol))).as("f"))
      .select(col(idCol), col("f._1").as("frame_idx"), col("f._2").as("dhash"))
  }

  /** Video near-dup pairs by FRAME-HASH SET overlap: two videos are
    * near-duplicates when the jaccard of their distinct frame-dHash
    * sets clears `minJaccard` (re-encoded / few-frames-edited copies
    * share most frame signatures). The classic set-similarity shape:
    * an INVERTED-INDEX join on the 8-byte hash key builds shared
    * counts — videos with no common frame never pair, frame payloads
    * never cross an exchange. Input: [[videoFrameHashes]] output.
    * Output: (id_a, id_b, shared, jaccard).
    *
    * `frameDfCap > 0` is the hot-key guard production corpora need:
    * a degenerate common frame (black/monochrome — intros, fades)
    * hashes identically across UNRELATED videos, and its posting list
    * pairs everything that shares it. Capped, frame hashes appearing
    * in more than `frameDfCap` videos are dropped from CANDIDATE
    * GENERATION only; the emitted jaccard stays EXACT via the dfCap
    * decomposition (shared = cool-posting pairs + per-video hot-hash
    * list intersection — the hot lists are tiny by construction, the
    * [[Dedup.cappedJaccardPairsFromSets]] discipline). Only pairs whose
    * overlap is EXCLUSIVELY over-cap frames are missed — by definition
    * frames with no discriminating signal.
    *
    * No cache: the distinct frame-set exchange is reused across the
    * size/posting consumers (ReuseExchange) instead of pinning executor
    * storage across invocations in a long-lived session.
    */
  def videoNearDupPairs(frameHashes: DataFrame,
      minJaccard: Double = 0.5, frameDfCap: Int = 0): DataFrame = {
    require(minJaccard > 0 && minJaccard <= 1,
      s"videoNearDupPairs: minJaccard in (0,1], got $minJaccard")
    val idCol = frameHashes.columns.head
    val d = frameHashes.select(col(idCol).as("id"), col("dhash")).distinct()
    val sizes = d.groupBy("id").agg(count(lit(1)).as("n"))
    val shared =
      if (frameDfCap <= 0) {
        d.as("a").join(d.as("b"),
            col("a.dhash") === col("b.dhash") && col("a.id") < col("b.id"))
          .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
          .agg(count(lit(1)).as("shared"))
      } else {
        // hot = hashes in > cap videos (tiny: the degenerate-frame set);
        // the anti-join broadcasts it and the posting keeps partitioning
        val hot = d.groupBy("dhash").agg(count(lit(1)).as("df"))
          .filter(col("df") > frameDfCap).select("dhash")
        val cool = d.join(hot, Seq("dhash"), "left_anti")
        val sharedCool = cool.as("a").join(cool.as("b"),
            col("a.dhash") === col("b.dhash") && col("a.id") < col("b.id"))
          .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
          .agg(count(lit(1)).as("shared_cool"))
        // per-video over-cap hash lists restore the exact intersection:
        // |A∩B| = shared_cool + |hotA ∩ hotB|
        val hotLists = d.join(hot, Seq("dhash"))
          .groupBy("id").agg(collect_list(col("dhash")).as("hs"))
        sharedCool
          .join(hotLists.select(col("id").as("id_a"), col("hs").as("_ha")),
            Seq("id_a"), "left")
          .join(hotLists.select(col("id").as("id_b"), col("hs").as("_hb")),
            Seq("id_b"), "left")
          .select(col("id_a"), col("id_b"),
            (col("shared_cool") + size(array_intersect(
              coalesce(col("_ha"), array().cast("array<long>")),
              coalesce(col("_hb"), array().cast("array<long>"))))
              .cast("long")).as("shared"))
      }
    shared
      .join(sizes.select(col("id").as("id_a"), col("n").as("_na")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("n").as("_nb")), "id_b")
      .withColumn("jaccard", round(col("shared").cast("double") /
        (col("_na") + col("_nb") - col("shared")), 6))
      .filter(col("shared").cast("double") /
        (col("_na") + col("_nb") - col("shared")) >= minJaccard)
      .select(col("id_a"), col("id_b"), col("shared"), col("jaccard"))
  }
}
