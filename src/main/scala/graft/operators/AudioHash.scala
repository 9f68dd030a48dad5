package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Perceptual audio fingerprinting — the audio leg of the multimodal
  * dedup triple (text SimHash, image/video dHash, THIS): a 64-bit
  * energy-delta hash in the acoustic-fingerprint family (public
  * technique — Haitsma & Kalker's energy-band deltas, reduced to the
  * time axis): frame the PCM stream, one bit per adjacent-frame energy
  * comparison. Re-encoded or slightly-renormalized copies keep the
  * energy CONTOUR, so they hash close in Hamming space; the near-dup
  * join reuses the pigeonhole chunk banding.
  *
  * Every step is integer-exact (sum of squared 16-bit samples per
  * frame — fits a long at any frame size ≤ 2^21), so an oracle can
  * replay all 64 bits from the sample formula. Spark shape: per-row
  * map through [[MediaCodecs.decodeWav]]; undecodable or too-short
  * payloads yield null (quarantine, don't guess).
  */
object AudioHash {

  /** Samples per energy frame (16 ⇒ the hash spans the first 1040
    * samples — the signature window).
    */
  val FrameSize = 16

  /** 64-bit energy-delta hash: bit f is set when frame f+1's energy
    * (Σ s², integer) exceeds frame f's, over the first 65 frames. None
    * when the payload doesn't decode as WAV or carries fewer than
    * 65 × [[FrameSize]] samples.
    */
  def aHash(payload: Array[Byte]): Option[Long] =
    MediaCodecs.decodeWav(payload).flatMap { case (_, samples) =>
      val needed = 65 * FrameSize
      if (samples.length < needed) None
      else {
        val energy = new Array[Long](65)
        var f = 0
        while (f < 65) {
          var e = 0L
          var i = 0
          while (i < FrameSize) {
            val s = samples(f * FrameSize + i).toLong
            e += s * s
            i += 1
          }
          energy(f) = e
          f += 1
        }
        var h = 0L
        var b = 0
        while (b < 64) {
          if (energy(b + 1) > energy(b)) h |= (1L << b)
          b += 1
        }
        Some(h)
      }
    }

  /** DataFrame form: (idCol, ahash) — null for undecodable/short
    * payloads. Per-row map, zero shuffle.
    */
  def aHashDf(docs: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val h = udf((p: Array[Byte]) => if (p == null) None else aHash(p))
    docs.select(col(idCol), h(col(payloadCol)).as("ahash"))
  }

  /** Near-duplicate audio pairs within `maxHamming` bits — the same
    * pigeonhole chunk-banded join as the image family, with the same
    * scale defaults: 3/4 = 16-bit chunk keys (65,536 buckets per
    * position); 6/8 (256 buckets, ~n²/32 candidates even on uniform
    * hashes) is an explicit opt-in for bounded corpora. Energy contours
    * are skewed in practice (silence and constant tones hash
    * identically), so set `bucketCap > 0` at corpus scale — over-cap
    * buckets drop from candidate generation ([[Dedup.simhashNearDupPairs]]
    * contract; exact-equal fingerprints dedup via `groupBy(ahash)`
    * first, untouched by the cap). Output: (id_a, id_b, hamming).
    */
  def nearDupPairs(hashes: DataFrame, maxHamming: Int = 3,
      chunks: Int = 4, bucketCap: Int = 0): DataFrame =
    Dedup.simhashNearDupPairs(
      hashes.filter(col("ahash").isNotNull)
        .select(col(hashes.columns.head).as("id"), col("ahash").as("simhash")),
      maxHamming, chunks, bits = 64, bucketCap = bucketCap)
}
