package graft.operators

import graft.SparkSpec
import graft.operators.MediaCodecs._

class MediaCodecsSpec extends SparkSpec {
  import spark.implicits._

  private def raster(w: Int, h: Int)(f: Int => Int): Array[Byte] =
    Array.tabulate(3 * w * h)(j => f(j).toByte)

  test("PPM encode/decode round-trips dims and every raster byte") {
    val px = raster(5, 3)(j => j * 7)
    val Some((w, h, out)) = decodePpm(encodePpm(5, 3, px))
    assert(w == 5 && h == 3)
    assert(out.toSeq == px.toSeq)
  }

  test("PPM header parser handles comments and mixed whitespace") {
    val px = raster(2, 2)(identity)
    val hdr = "P6 # a comment\n# another\n 2\t2 # dims\n255\n"
    val Some((w, h, out)) = decodePpm(hdr.getBytes("US-ASCII") ++ px)
    assert(w == 2 && h == 2 && out.toSeq == px.toSeq)
  }

  test("PPM decode rejects wrong magic, 2-byte maxval, truncated raster") {
    assert(decodePpm("P5\n2 2\n255\n".getBytes ++ raster(2, 2)(identity)).isEmpty)
    assert(decodePpm("P6\n2 2\n65535\n".getBytes ++ raster(2, 2)(identity)).isEmpty)
    assert(decodePpm(encodePpm(4, 4, raster(4, 4)(identity)).dropRight(1)).isEmpty)
    assert(decodePpm(null).isEmpty)
    assert(decodePpm("not an image".getBytes).isEmpty)
  }

  test("nearest-neighbor resize picks floor-mapped source pixels") {
    // 4x2 source, channel-r byte at pixel p = p (g=b=0)
    val px = new Array[Byte](24)
    (0 until 8).foreach(p => px(3 * p) = p.toByte)
    val Some(resized) = resizePpmNearest(encodePpm(4, 2, px), 2, 1)
    val Some((w, h, out)) = decodePpm(resized)
    assert(w == 2 && h == 1)
    // dst x=0 -> src (0,0) = pixel 0; dst x=1 -> src x = 1*4/2 = 2 -> pixel 2
    assert(out(0) == 0.toByte && out(3) == 2.toByte)
    // upscale 1x1 -> 3x3 replicates the single pixel
    val one = encodePpm(1, 1, Array[Byte](9, 8, 7))
    val Some((_, _, up)) = decodePpm(resizePpmNearest(one, 3, 3).get)
    assert(up.grouped(3).forall(_.toSeq == Seq[Byte](9, 8, 7)))
  }

  test("WAV encode/decode round-trips rate and samples incl. negative") {
    val samples = Array[Short](0, 1, -1, 32767, -32768, 12345)
    val Some((rate, out)) = decodeWav(encodeWav(22050, samples))
    assert(rate == 22050)
    assert(out.toSeq == samples.toSeq)
  }

  test("WAV chunk walker skips foreign chunks and honors odd-length padding") {
    val base = encodeWav(8000, Array[Short](5, -5, 100))
    // splice a 3-byte LIST chunk (padded to 4) between WAVE and fmt
    val foreign = "LIST".getBytes("US-ASCII") ++
      Array[Byte](3, 0, 0, 0) ++ Array[Byte](1, 2, 3, 0)
    val spliced = base.take(12) ++ foreign ++ base.drop(12)
    // RIFF size field must cover the splice
    val bb = java.nio.ByteBuffer.wrap(spliced).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, spliced.length - 8)
    val Some((rate, out)) = decodeWav(spliced)
    assert(rate == 8000 && out.toSeq == Seq[Short](5, -5, 100))
  }

  test("WAV decode rejects stereo, non-PCM, truncated payloads") {
    val good = encodeWav(8000, Array[Short](1, 2, 3))
    val stereo = good.clone()
    stereo(22) = 2 // channels
    assert(decodeWav(stereo).isEmpty)
    val compressed = good.clone()
    compressed(20) = 3 // IEEE float format tag
    assert(decodeWav(compressed).isEmpty)
    assert(decodeWav(good.dropRight(2)).isEmpty) // data chunk overruns
    assert(decodeWav(null).isEmpty)
    assert(decodeWav("RIFFxxxxNOPE".getBytes).isEmpty)
  }

  test("WAV interop with the JDK's AudioSystem, both directions") {
    import javax.sound.sampled._
    // our encoder -> AudioSystem parses format + samples identically
    val samples = Array[Short](0, 1000, -1000, 32767, -32768, 12345)
    val ais = AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(encodeWav(16000, samples)))
    val fmt = ais.getFormat
    assert(fmt.getSampleRate == 16000f && fmt.getChannels == 1 &&
      fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian)
    val bytes = ais.readAllBytes()
    val got = (0 until bytes.length / 2).map(i =>
      ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort)
    assert(got == samples.toSeq)
    // AudioSystem's writer -> our decoder
    val af = new AudioFormat(8000f, 16, 1, true, false)
    val data = samples.flatMap(s =>
      Array((s & 0xff).toByte, ((s >> 8) & 0xff).toByte))
    val src = new AudioInputStream(
      new java.io.ByteArrayInputStream(data), af, samples.length.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(src, AudioFileFormat.Type.WAVE, baos)
    val Some((rate, out)) = decodeWav(baos.toByteArray)
    assert(rate == 8000 && out.toSeq == samples.toSeq)
  }

  test("JvmCodec: real features for decodable payloads, stub fallback else") {
    val flat = encodePpm(4, 4, raster(4, 4)(_ => 255)) // all-white image
    val f = JvmCodec.features("image", flat, 8)
    assert(f(0) == 1.0f && f(1) == 1.0f && f(2) == 1.0f) // channel means
    assert(math.abs(f.drop(3).sum - 1.0f) < 1e-5) // luma histogram sums to 1
    assert(f(7) == 1.0f) // all pixels in the top luma bin
    val silence = encodeWav(8000, Array.fill[Short](100)(0))
    val a = JvmCodec.features("audio", silence, 6)
    assert(a(0) == 0.0f && a(1) == 0.0f) // mean, rms
    val text = "just some text".getBytes
    assert(JvmCodec.features("image", text, 8).toSeq ==
      Multimodal.StubCodec.features("image", text, 8).toSeq)
    assert(JvmCodec.resize(text, 4, 4).toSeq ==
      Multimodal.StubCodec.resize(text, 4, 4).toSeq)
  }

  test("BMP encode/decode round-trips padding, bottom-up rows, BGR swap") {
    // 5x3: row stride 15 pads to 16; every raster byte distinct
    val px = raster(5, 3)(j => j * 11)
    val bmp = encodeBmp(5, 3, px)
    assert(bmp.length == 54 + 16 * 3)
    val Some((w, h, out)) = decodeBmp(bmp)
    assert(w == 5 && h == 3)
    assert(out.toSeq == px.toSeq)
    // byte-level spot check: logical top-left pixel RGB lands in the LAST
    // file row as BGR
    val lastRowAt = 54 + 16 * 2
    assert(bmp(lastRowAt) == px(2) && bmp(lastRowAt + 2) == px(0))
    // resize stays BMP and picks floor-mapped pixels
    val Some(r2) = resizeBmpNearest(bmp, 2, 1)
    val Some((_, _, rp)) = decodeBmp(r2)
    assert(rp.slice(0, 3).toSeq == px.slice(0, 3).toSeq)
    // JvmCodec treats BMP as a first-class image
    assert(JvmCodec.decodeImage(bmp).isDefined)
    assert(JvmCodec.features("image", bmp, 8).sum > 0)
  }

  test("BMP interop with the JDK's ImageIO, both directions") {
    // our encoder -> ImageIO decodes pixel-identical
    val px = raster(5, 3)(j => j * 7)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(encodeBmp(5, 3, px)))
    assert(img.getWidth == 5 && img.getHeight == 3)
    for (y <- 0 until 3; x <- 0 until 5) {
      val rgb = img.getRGB(x, y)
      val s = 3 * (y * 5 + x)
      assert(((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff) ==
        ((px(s) & 0xff, px(s + 1) & 0xff, px(s + 2) & 0xff)))
    }
    // ImageIO's writer -> our decoder reads pixel-identical
    val bi = new java.awt.image.BufferedImage(4, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 2; x <- 0 until 4)
      bi.setRGB(x, y, (x * 40 << 16) | (y * 90 << 8) | (x + y))
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bi, "bmp", baos)
    val Some((w, h, out)) = decodeBmp(baos.toByteArray)
    assert(w == 4 && h == 2)
    for (y <- 0 until 2; x <- 0 until 4) {
      val s = 3 * (y * 4 + x)
      assert(((out(s) & 0xff, out(s + 1) & 0xff, out(s + 2) & 0xff)) ==
        ((x * 40, y * 90, x + y)))
    }
  }

  test("BMP decode rejects other depths, compression, truncation") {
    val good = encodeBmp(4, 2, raster(4, 2)(identity))
    val bpp8 = good.clone(); bpp8(28) = 8
    assert(decodeBmp(bpp8).isEmpty)
    val rle = good.clone(); rle(30) = 1 // BI_RLE8
    assert(decodeBmp(rle).isEmpty)
    assert(decodeBmp(good.dropRight(1)).isEmpty)
    assert(decodeBmp("BMnope".getBytes).isEmpty)
    assert(decodeBmp(null).isEmpty)
  }

  test("PNG via JDK ImageIO: lossless round trip, JPEG decodes, junk is None") {
    val px = raster(6, 4)(j => j * 13)
    val png = encodePng(6, 4, px)
    assert(png.take(4).toSeq == Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))
    val Some((w, h, out)) = decodeImageIo(png)
    assert(w == 6 && h == 4 && out.toSeq == px.toSeq)
    // the codec seam routes PNG through ImageIO (PPM/BMP decliners first)
    assert(JvmCodec.decodeImage(png).map(_._3.toSeq).contains(px.toSeq))
    // a real JPEG decodes (lossy, so only shape is asserted)
    val img = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val jb = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", jb)
    assert(decodeImageIo(jb.toByteArray).exists { case (jw, jh, _) => jw == 8 && jh == 8 })
    assert(decodeImageIo("definitely not an image".getBytes).isEmpty)
    assert(decodeImageIo(null).isEmpty)
  }

  test("crafted headers yield None, never a crash or giant allocation") {
    // BMP with width chosen so 3*w+3 overflows Int (rowStride would go
    // negative in 32-bit math and slip past the bounds check)
    val evil = encodeBmp(4, 2, raster(4, 2)(identity)).clone()
    val bb = java.nio.ByteBuffer.wrap(evil).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(18, 715827883) // width
    bb.putInt(22, 1) // height
    assert(decodeBmp(evil).isEmpty)
    bb.putInt(18, Int.MaxValue / 3)
    assert(decodeBmp(evil).isEmpty)
    // PPM dim token that wraps Int (2^32+1 would parse as 1)
    assert(decodePpm(("P6\n4294967297 1\n255\n" + "xxx").getBytes).isEmpty)
    assert(decodePpm(("P6\n1 4294967297\n255\n" + "xxx").getBytes).isEmpty)
  }

  test("PPM stream split: exact frame boundaries, whole-payload consumption") {
    val frames = (0 until 5).map(f => encodePpm(3, 2, raster(3, 2)(j => f * 50 + j)))
    val stream = frames.flatten.toArray
    val Some(split) = splitPpmStream(stream)
    assert(split.size == 5)
    split.zip(frames).foreach { case (a, b) => assert(a.toSeq == b.toSeq) }
    // a trailing partial frame rejects the whole stream
    assert(splitPpmStream(stream ++ "P6\n3 2\n255\n".getBytes).isEmpty)
    assert(splitPpmStream("not ppm".getBytes).isEmpty)
    // JvmCodec keeps every Nth standalone frame
    val kept = JvmCodec.sampleFrames(stream, everyN = 2)
    assert(kept.size == 3)
    assert(kept.map(decodePpm(_).get._3.toSeq) ==
      Seq(0, 2, 4).map(f => frames(f).toSeq.drop(frames(f).length - 18)))
  }

  test("JvmCodec audio frames: 1024-sample WAV windows, every Nth kept") {
    val samples = Array.tabulate[Short](3000)(i => (i % 251).toShort)
    val frames = JvmCodec.sampleFrames(encodeWav(16000, samples), everyN = 2)
    assert(frames.size == 2) // windows 0 and 2 of 3
    val Some((r0, s0)) = decodeWav(frames.head)
    assert(r0 == 16000 && s0.toSeq == samples.slice(0, 1024).toSeq)
    val Some((_, s2)) = decodeWav(frames(1))
    assert(s2.toSeq == samples.slice(2048, 3000).toSeq)
  }

  test("synthesizeReal payloads round-trip the real codecs distributed") {
    val ids = (0L until 20L).toDF("doc_id")
    val media = Multimodal.synthesizeReal(ids, "doc_id")
    val img = Multimodal.imageStats(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(img.keySet == (0L until 20L by 2).toSet) // even ids only
    // replay the raster formula for id 4
    val expected = (0 until 768).map(j => (4L * 2654435761L + j * 40503L) % 256L)
    val rSum = expected.zipWithIndex.collect { case (v, j) if j % 3 == 0 => v }.sum
    assert(img(4L).getInt(1) == 16 && img(4L).getInt(2) == 16)
    assert(img(4L).getLong(3) == rSum)
    val aud = Multimodal.audioStats(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(aud.keySet == (1L until 20L by 2).toSet)
    val s = (0 until 441).map(i => (3L * 40503L + i * 69069L) % 65536L - 32768L)
    assert(aud(3L).getInt(1) == 11000) // 8000 + (3%8)*1000
    assert(aud(3L).getInt(2) == 441)
    assert(aud(3L).getLong(3) == s.sum && aud(3L).getLong(4) == s.map(math.abs).sum)
  }
}
