package graft.operators

import graft.SparkSpec

/** Energy-delta fingerprint contracts: closed-form ramps/flats,
  * sample-rate invariance (the contour, not the clock, is hashed),
  * amplitude-scaling stability, locality of a one-frame perturbation,
  * short/undecodable quarantine, and brute-force pair parity.
  */
class AudioHashSpec extends SparkSpec {
  import spark.implicits._

  private def wav(samples: Array[Short], rate: Int = 8000): Array[Byte] =
    MediaCodecs.encodeWav(rate, samples)

  test("rising energy ramp sets all bits; constant energy sets none") {
    val ramp = Array.tabulate[Short](65 * AudioHash.FrameSize)(i =>
      ((i / AudioHash.FrameSize + 1) * 50).toShort)
    assert(AudioHash.aHash(wav(ramp)).contains(-1L))
    val flat = Array.fill[Short](65 * AudioHash.FrameSize)(123)
    assert(AudioHash.aHash(wav(flat)).contains(0L))
  }

  test("sample-rate metadata does not change the hash (contour, not clock)") {
    val s = Array.tabulate[Short](65 * AudioHash.FrameSize)(i => ((i * 37) % 2001 - 1000).toShort)
    assert(AudioHash.aHash(wav(s, 8000)) == AudioHash.aHash(wav(s, 44100)))
  }

  test("uniform amplitude scaling preserves every comparison") {
    val s = Array.tabulate[Short](65 * AudioHash.FrameSize)(i => ((i * 53) % 401 - 200).toShort)
    val doubled = s.map(v => (v * 2).toShort)
    assert(AudioHash.aHash(wav(s)) == AudioHash.aHash(wav(doubled)),
      "energy scales uniformly; all deltas keep their sign")
  }

  test("a one-frame perturbation flips at most its two adjacent comparisons") {
    val s = Array.tabulate[Short](65 * AudioHash.FrameSize)(i => ((i * 91) % 1501 - 750).toShort)
    val h0 = AudioHash.aHash(wav(s)).get
    val t = s.clone()
    (0 until AudioHash.FrameSize).foreach(i =>
      t(10 * AudioHash.FrameSize + i) = (t(10 * AudioHash.FrameSize + i) / 2).toShort)
    val h1 = AudioHash.aHash(wav(t)).get
    assert(java.lang.Long.bitCount(h0 ^ h1) <= 2,
      "frame 10's energy participates in comparisons 9 and 10 only")
  }

  test("short and undecodable payloads yield null (quarantine)") {
    val short = Array.fill[Short](64 * AudioHash.FrameSize - 1)(7)
    assert(AudioHash.aHash(wav(short)).isEmpty)
    val rows = Seq(
      (1L, wav(Array.tabulate[Short](65 * AudioHash.FrameSize)(_.toShort))),
      (2L, Array[Byte](9, 9, 9))).toDF("id", "audio")
    val hs = AudioHash.aHashDf(rows, "id", "audio").collect()
      .map(r => r.getLong(0) -> !r.isNullAt(1)).toMap
    assert(hs == Map(1L -> true, 2L -> false))
  }

  test("nearDupPairs equals brute force on planted renormalized twins") {
    def clip(seed: Int, scale: Int) = wav(
      Array.tabulate[Short](65 * AudioHash.FrameSize)(i =>
        (((seed * 67 + i * 29) % 1201 - 600) / scale * scale).toShort))
    val rows = ((0 until 20).map(i => (i.toLong, clip(i, 1))) ++
      (0 until 8).map(i => (100L + i, clip(i, 2)))) // coarsely requantized twins
      .toDF("id", "audio")
    val hashes = AudioHash.aHashDf(rows, "id", "audio").cache()
    val got = AudioHash.nearDupPairs(hashes, maxHamming = 6, chunks = 8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hs = hashes.collect().map(r => r.getLong(0) -> r.getLong(1))
    val want = (for {
      (a, ha) <- hs; (b, hb) <- hs if a < b
      if java.lang.Long.bitCount(ha ^ hb) <= 6
    } yield (a, b)).toSet
    assert(got == want, s"got=$got\nwant=$want")
    assert(want.exists { case (a, b) => b == a + 100 },
      "at least one requantized twin lands within the radius")
  }
}
