package graft.operators

import graft.SparkSpec

/** Compressed-media METADATA probe contracts: MP3 frame-header walk
  * (ID3v2 skip, CBR duration, trailing-garbage degradation) and MP4 box
  * walk (brand, mvhd duration, tkhd dims) — header-only, decode stays on
  * the documented stub — plus the magic dispatch and the DataFrame form.
  */
class MediaProbeSpec extends SparkSpec {
  import spark.implicits._

  test("probeMp3: frames, duration, bitrate, channels from the headers") {
    val mp3 = MediaCodecs.encodeMp3Silence(nFrames = 38, bitrateKbps = 128,
      sampleRate = 44100, channels = 2)
    val info = MediaCodecs.probeMp3(mp3).get
    assert(info.container == "mp3" && info.codec == "mp3")
    assert(info.durationMs == 38L * 1152 * 1000 / 44100) // = 992 ms
    assert(info.sampleRate == 44100 && info.channels == 2)
    assert(info.bitrateKbps == 128)
    val mono = MediaCodecs.probeMp3(MediaCodecs.encodeMp3Silence(10, 64,
      sampleRate = 32000, channels = 1)).get
    assert(mono.channels == 1 && mono.sampleRate == 32000 &&
      mono.bitrateKbps == 64)
  }

  test("probeMp3: ID3v2 tag skips (synchsafe size); garbage degrades, not throws") {
    val mp3 = MediaCodecs.encodeMp3Silence(nFrames = 12, bitrateKbps = 96)
    // ID3v2 header: 'ID3' + version + flags + synchsafe size 200
    val id3 = Array[Byte]('I', 'D', '3', 3, 0, 0, 0, 0, 1, 72) ++
      new Array[Byte](200)
    val tagged = id3 ++ mp3
    val info = MediaCodecs.probeMp3(tagged).get
    assert(info.durationMs == 12L * 1152 * 1000 / 44100)
    // trailing garbage after valid frames: report the verified frames
    val dirty = mp3 ++ Array[Byte](1, 2, 3, 4, 5)
    assert(MediaCodecs.probeMp3(dirty).get.durationMs == info.durationMs)
    // no valid first frame -> None, never an exception
    assert(MediaCodecs.probeMp3("not audio at all".getBytes("UTF-8")).isEmpty)
    assert(MediaCodecs.probeMp3(null).isEmpty)
    assert(MediaCodecs.probeMp3(Array[Byte](0xff.toByte, 0xfb.toByte)).isEmpty)
  }

  test("probeMp3: MPEG-2 and MPEG-2.5 low-rate framing (576 samples/frame)") {
    // MPEG-2 @ 22050 Hz: per-frame 576/22050 s = 26122 us
    val v2 = MediaCodecs.probeMp3(MediaCodecs.encodeMp3Silence(
      nFrames = 40, bitrateKbps = 64, sampleRate = 22050,
      channels = 1, version = 2)).get
    assert(v2.sampleRate == 22050 && v2.channels == 1 && v2.bitrateKbps == 64)
    assert(v2.durationMs == 40L * (576000000L / 22050) / 1000) // = 1044 ms
    // MPEG-2.5 @ 8000 Hz (the speech-corpus rate)
    val v25 = MediaCodecs.probeMp3(MediaCodecs.encodeMp3Silence(
      nFrames = 40, bitrateKbps = 32, sampleRate = 8000, version = 25)).get
    assert(v25.sampleRate == 8000)
    assert(v25.durationMs == 40L * (576000000L / 8000) / 1000) // = 2880 ms
    // the magic dispatch recognizes the V2/V2.5 sync forms too
    assert(MediaCodecs.probe(MediaCodecs.encodeMp3Silence(5, 64,
      sampleRate = 22050, version = 2)).exists(_.container == "mp3"))
    assert(MediaCodecs.probe(MediaCodecs.encodeMp3Silence(5, 32,
      sampleRate = 8000, version = 25)).exists(_.container == "mp3"))
  }

  test("probeMp4: ftyp brand, mvhd duration, tkhd 16.16 dims") {
    val mp4 = MediaCodecs.encodeMp4Stub(durationMs = 7321, width = 320,
      height = 240, brand = "mp42")
    val info = MediaCodecs.probeMp4(mp4).get
    assert(info.container == "mp4" && info.codec == "mp42")
    assert(info.durationMs == 7321)
    assert(info.width == 320 && info.height == 240)
    assert(info.sampleRate == 0 && info.bitrateKbps == 0)
    // not BMFF -> None
    assert(MediaCodecs.probeMp4("<html></html>".getBytes("UTF-8")).isEmpty)
    assert(MediaCodecs.probeMp4(null).isEmpty)
  }

  test("probe dispatch: mp3/mp4/wav/ppm/bmp by magic; junk -> None") {
    assert(MediaCodecs.probe(MediaCodecs.encodeMp3Silence(5, 64))
      .exists(_.container == "mp3"))
    assert(MediaCodecs.probe(MediaCodecs.encodeMp4Stub(100, 16, 16))
      .exists(_.container == "mp4"))
    val wav = MediaCodecs.encodeWav(8000, Array.fill[Short](1600)(3))
    val wavInfo = MediaCodecs.probe(wav).get
    assert(wavInfo.container == "wav" && wavInfo.sampleRate == 8000 &&
      wavInfo.durationMs == 200 && wavInfo.channels == 1)
    val ppm = MediaCodecs.encodePpm(6, 4, new Array[Byte](72))
    assert(MediaCodecs.probe(ppm).exists(i =>
      i.container == "ppm" && i.width == 6 && i.height == 4))
    val bmp = MediaCodecs.encodeBmp(5, 3, new Array[Byte](45))
    assert(MediaCodecs.probe(bmp).exists(i =>
      i.container == "bmp" && i.width == 5 && i.height == 3))
    assert(MediaCodecs.probe("just text".getBytes("UTF-8")).isEmpty)
    assert(MediaCodecs.probe(null).isEmpty)
  }

  test("mediaProbe DataFrame form: typed columns, null container for junk") {
    val rows = Seq(
      (1L, MediaCodecs.encodeMp3Silence(20, 128)),
      (2L, MediaCodecs.encodeMp4Stub(5000, 160, 96)),
      (3L, "not media".getBytes("UTF-8")),
      (4L, null.asInstanceOf[Array[Byte]]))
      .toDF("media_id", "bytes")
    val got = Multimodal.mediaProbe(rows).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getString(1) == "mp3" &&
      got(1L).getLong(3) == 20L * 1152 * 1000 / 44100)
    assert(got(2L).getString(1) == "mp4" && got(2L).getLong(3) == 5000 &&
      got(2L).getInt(7) == 160 && got(2L).getInt(8) == 96)
    assert(got(3L).isNullAt(1), "junk must quarantine (null container)")
    assert(got(4L).isNullAt(1))
  }
}
