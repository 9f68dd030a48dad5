package graft.operators

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.US_ASCII

/** Real, pure-JVM media codecs behind the [[Multimodal.MediaCodec]] seam:
  * binary PPM (P6) for images and RIFF/WAV PCM16-mono for audio — formats a
  * JVM decodes from first principles with zero native libraries, so one
  * image and one audio modality are REAL (bytes in, pixels/samples out)
  * while richer formats stay on the declared stub.
  *
  * [[JvmCodec]] is the drop-in [[Multimodal.MediaCodec]]: payloads that
  * parse as PPM/WAV get real decode-based features, nearest-neighbor
  * resize (images) and frame chunking (audio); anything else falls back to
  * [[Multimodal.StubCodec]] behavior, keeping every pipeline total.
  */
object MediaCodecs {

  // ---------------------------------------------------------------- PPM (P6)

  /** Encode a packed-RGB raster as binary PPM (P6, maxval 255). */
  def encodePpm(width: Int, height: Int, raster: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    require(raster.length == 3 * width * height,
      s"raster ${raster.length} != 3*$width*$height")
    s"P6\n$width $height\n255\n".getBytes(US_ASCII) ++ raster
  }

  /** Parse one P6 header at `start`: (width, height, raster offset), or
    * None when the bytes there are not a well-formed single-byte-maxval P6
    * header (tokens may be separated by any whitespace and `#` comments,
    * per the spec). Does NOT check the raster fits — callers do.
    */
  private def parseHeader(payload: Array[Byte], start: Int): Option[(Int, Int, Int)] = {
    if (payload == null || start < 0 || start + 9 > payload.length ||
      payload(start) != 'P' || payload(start + 1) != '6') return None
    var pos = start + 2
    def readInt(): Int = {
      var skipping = true
      while (skipping && pos < payload.length) {
        val c = payload(pos)
        if (c == '#') { while (pos < payload.length && payload(pos) != '\n') pos += 1 }
        else if (c == ' ' || c == '\t' || c == '\r' || c == '\n') pos += 1
        else skipping = false
      }
      // Long accumulation: an oversized token must parse as INVALID, not
      // wrap around Int into a small bogus dim that mis-accepts the file
      var v = -1L
      while (pos < payload.length && payload(pos) >= '0' && payload(pos) <= '9') {
        v = math.min(math.max(0L, v) * 10 + (payload(pos) - '0'), Long.MaxValue / 16)
        pos += 1
      }
      if (v > 1000000000L) -1 else v.toInt
    }
    val w = readInt(); val h = readInt(); val maxVal = readInt()
    pos += 1 // exactly one whitespace byte separates maxval from the raster
    if (w <= 0 || h <= 0 || maxVal <= 0 || maxVal > 255) None
    else Some((w, h, pos))
  }

  /** Decode binary PPM: (width, height, packed RGB raster), or None when
    * the payload does not start with a well-formed P6 frame.
    */
  def decodePpm(payload: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    parseHeader(payload, 0).flatMap { case (w, h, rasterAt) =>
      if (w.toLong * h * 3 > payload.length - rasterAt) None
      else Some((w, h,
        java.util.Arrays.copyOfRange(payload, rasterAt, rasterAt + 3 * w * h)))
    }

  /** Split a back-to-back concatenation of P6 frames — the MJPEG-style
    * raster stream this library uses as its real "video" format — into the
    * per-frame payloads. None unless the WHOLE payload is consumed by
    * well-formed frames (a trailing partial frame rejects the stream).
    */
  def splitPpmStream(payload: Array[Byte]): Option[Seq[Array[Byte]]] = {
    if (payload == null || payload.isEmpty) return None
    val frames = Seq.newBuilder[Array[Byte]]
    var pos = 0
    while (pos < payload.length) {
      parseHeader(payload, pos) match {
        case Some((w, h, rasterAt)) if rasterAt + 3L * w * h <= payload.length =>
          val end = rasterAt + 3 * w * h
          frames += java.util.Arrays.copyOfRange(payload, pos, end)
          pos = end
        case _ => return None
      }
    }
    Some(frames.result())
  }

  /** Nearest-neighbor raster resample: source pixel =
    * floor(dst * src_extent / dst_extent), packed RGB in and out. */
  private def nearestRaster(px: Array[Byte], w0: Int, h0: Int,
      w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](3 * w * h)
    var y = 0
    while (y < h) {
      val sy = (y.toLong * h0 / h).toInt
      var x = 0
      while (x < w) {
        val sx = (x.toLong * w0 / w).toInt
        val s = 3 * (sy * w0 + sx)
        val d = 3 * (y * w + x)
        out(d) = px(s); out(d + 1) = px(s + 1); out(d + 2) = px(s + 2)
        x += 1
      }
      y += 1
    }
    out
  }

  /** Nearest-neighbor resize of a PPM payload, re-encoded as PPM; None when
    * the payload isn't PPM.
    */
  def resizePpmNearest(payload: Array[Byte], w: Int, h: Int): Option[Array[Byte]] =
    decodePpm(payload).map { case (w0, h0, px) =>
      encodePpm(w, h, nearestRaster(px, w0, h0, w, h))
    }

  // ------------------------------------------------ BMP (24bpp, BI_RGB)

  /** Encode a packed-RGB raster as a 24bpp uncompressed BMP
    * (BITMAPINFOHEADER): bottom-up rows, BGR byte order, rows padded to
    * 4-byte boundaries — the classic format's three traps, all exercised
    * by the round-trip oracle.
    */
  def encodeBmp(width: Int, height: Int, raster: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    require(raster.length == 3 * width * height,
      s"raster ${raster.length} != 3*$width*$height")
    val rowStride = ((3 * width + 3) / 4) * 4
    val dataLen = rowStride * height
    val bb = ByteBuffer.allocate(54 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(54 + dataLen)
      .putShort(0).putShort(0).putInt(54) // reserved, data offset
    bb.putInt(40).putInt(width).putInt(height) // BITMAPINFOHEADER, +h = bottom-up
      .putShort(1).putShort(24).putInt(0) // planes, bpp, BI_RGB
      .putInt(dataLen).putInt(2835).putInt(2835).putInt(0).putInt(0) // 72 DPI
    var y = height - 1
    while (y >= 0) { // bottom-up
      var x = 0
      while (x < width) {
        val s = 3 * (y * width + x)
        bb.put(raster(s + 2)).put(raster(s + 1)).put(raster(s)) // BGR
        x += 1
      }
      var pad = rowStride - 3 * width
      while (pad > 0) { bb.put(0.toByte); pad -= 1 }
      y -= 1
    }
    bb.array()
  }

  /** Decode a 24bpp uncompressed BMP to (width, height, top-down packed RGB
    * raster); None for anything else (other bit depths, compression,
    * top-down negative-height files, truncation).
    */
  def decodeBmp(payload: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (payload == null || payload.length < 54 ||
      payload(0) != 'B' || payload(1) != 'M') return None
    val bb = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
    val dataAt = bb.getInt(10)
    val hdrSize = bb.getInt(14)
    val w = bb.getInt(18)
    val h = bb.getInt(22)
    val planes = bb.getShort(26)
    val bpp = bb.getShort(28)
    val compression = bb.getInt(30)
    if (hdrSize < 40 || w <= 0 || h <= 0 || planes != 1 || bpp != 24 ||
      compression != 0) return None
    // all size arithmetic in Long: crafted dims must yield None, not an
    // Int-overflow crash or a multi-GB allocation attempt
    val rowStride = ((3L * w + 3) / 4) * 4
    if (dataAt < 54 || dataAt.toLong + rowStride * h > payload.length) return None
    if (3L * w * h > payload.length) return None // implied by the row check, belt+braces
    val out = new Array[Byte](3 * w * h)
    var y = 0
    while (y < h) {
      val src = (dataAt + (h - 1 - y) * rowStride).toInt // bottom-up rows; bounds checked above
      var x = 0
      while (x < w) {
        val s = src + 3 * x
        val d = 3 * (y * w + x)
        out(d) = payload(s + 2); out(d + 1) = payload(s + 1); out(d + 2) = payload(s) // BGR -> RGB
        x += 1
      }
      y += 1
    }
    Some((w, h, out))
  }

  /** Nearest-neighbor resize of a BMP payload, re-encoded as BMP. */
  def resizeBmpNearest(payload: Array[Byte], w: Int, h: Int): Option[Array[Byte]] =
    decodeBmp(payload).map { case (w0, h0, px) =>
      encodeBmp(w, h, nearestRaster(px, w0, h0, w, h))
    }

  // --------------------------------------- PNG/JPEG/GIF via JDK ImageIO

  /** Decode via the JDK's own ImageIO registry (PNG, JPEG, GIF — real
    * third-party codecs that ship with every JVM) to a packed top-down RGB
    * raster. None when no registered reader claims the bytes.
    */
  def decodeImageIo(payload: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    try {
      if (payload == null || payload.length == 0) return None
      Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))).map { img =>
        val w = img.getWidth
        val h = img.getHeight
        val argb = img.getRGB(0, 0, w, h, null, 0, w)
        val out = new Array[Byte](3 * w * h)
        var p = 0
        while (p < w * h) {
          val v = argb(p)
          out(3 * p) = ((v >> 16) & 0xff).toByte
          out(3 * p + 1) = ((v >> 8) & 0xff).toByte
          out(3 * p + 2) = (v & 0xff).toByte
          p += 1
        }
        (w, h, out)
      }
    } catch { case _: Exception => None }

  /** Encode a packed-RGB raster as PNG (lossless — encode→decode is
    * byte-exact, which the q113 oracle depends on).
    */
  def encodePng(width: Int, height: Int, raster: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    require(raster.length == 3 * width * height,
      s"raster ${raster.length} != 3*$width*$height")
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val argb = new Array[Int](width * height)
    var p = 0
    while (p < argb.length) {
      argb(p) = ((raster(3 * p) & 0xff) << 16) |
        ((raster(3 * p + 1) & 0xff) << 8) | (raster(3 * p + 2) & 0xff)
      p += 1
    }
    img.setRGB(0, 0, width, height, argb, 0, width)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  // ------------------------------------------------- WAV (RIFF, PCM16 mono)

  /** Encode PCM16-mono samples as a canonical 44-byte-header WAV. */
  def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0, s"bad sample rate $sampleRate")
    val dataLen = samples.length * 2
    val bb = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes(US_ASCII)).putInt(36 + dataLen).put("WAVE".getBytes(US_ASCII))
    bb.put("fmt ".getBytes(US_ASCII)).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2) // byte rate
      .putShort(2).putShort(16) // block align, bits
    bb.put("data".getBytes(US_ASCII)).putInt(dataLen)
    var i = 0
    while (i < samples.length) { bb.putShort(samples(i)); i += 1 }
    bb.array()
  }

  /** Decode a PCM16-mono WAV: (sample rate, samples), or None for anything
    * else (wrong magic, compressed, stereo, 8/24-bit). Walks the RIFF chunk
    * list — real writers interleave LIST/fact chunks and pad odd lengths.
    */
  def decodeWav(payload: Array[Byte]): Option[(Int, Array[Short])] = {
    if (payload == null || payload.length < 44) return None
    val bb = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
    def tag(at: Int): String = new String(payload, at, 4, US_ASCII)
    if (tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var pos = 12
    var rate = -1
    var fmtOk = false
    var data: Array[Short] = null
    while (pos + 8 <= payload.length) {
      val id = tag(pos)
      val len = bb.getInt(pos + 4)
      if (len < 0 || pos + 8 + len > payload.length) return None
      id match {
        case "fmt " if len >= 16 =>
          fmtOk = bb.getShort(pos + 8) == 1 && bb.getShort(pos + 10) == 1 &&
            bb.getShort(pos + 22) == 16
          rate = bb.getInt(pos + 12)
        case "data" =>
          val n = len / 2
          val out = new Array[Short](n)
          var i = 0
          while (i < n) { out(i) = bb.getShort(pos + 8 + 2 * i); i += 1 }
          data = out
        case _ => () // LIST/fact/cue: skip
      }
      pos += 8 + len + (len & 1) // RIFF chunks are word-aligned
    }
    if (fmtOk && rate > 0 && data != null) Some((rate, data)) else None
  }

  // -------------------------------------- compressed-media METADATA probes
  //
  // MP3/H.264 DECODE stays on the documented stub (no stock-JVM parser),
  // but the container METADATA is public-spec and header-only: an MP3
  // frame header names its bitrate/samplerate and an MP4 `moov` box walk
  // names duration and track dimensions — enough for `describe` and the
  // multimodal cards to cover compressed assets WITHOUT decoding a
  // single sample. Header-only means O(frames) byte arithmetic per
  // asset, zero allocation proportional to media length.

  /** Uniform probe result; fields the container doesn't carry are 0. */
  final case class MediaInfo(container: String, codec: String,
      durationMs: Long, sampleRate: Int, channels: Int, bitrateKbps: Int,
      width: Int, height: Int)

  // MPEG Layer III tables (ISO/IEC 11172-3 / 13818-3): bitrate index ->
  // kbps per version family, samplerate index -> Hz per version; 1152
  // samples per frame for MPEG-1, 576 for MPEG-2/2.5 (the low-samplerate
  // extensions speech corpora actually ship)
  private val Mp3BitrateV1L3 =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val Mp3BitrateV2L3 =
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
  private val Mp3SampleRateV1 = Array(44100, 48000, 32000)

  /** Samplerate for (version bits, samplerate index): V1 base rates, V2
    * halves them, V2.5 quarters them.
    */
  private def mp3Rate(verBits: Int, sIdx: Int): Int = {
    val base = Mp3SampleRateV1(sIdx)
    verBits match {
      case 3 => base       // MPEG-1
      case 2 => base / 2   // MPEG-2
      case _ => base / 4   // MPEG-2.5
    }
  }

  /** MPEG-1/2/2.5 Layer III metadata by frame-header walk: skips a
    * leading ID3v2 tag (synchsafe size), then counts syncword frames —
    * duration accumulates samples-per-frame / samplerate per FRAME
    * (exact for CBR and VBR alike, unlike the filesize/bitrate
    * estimate); bitrate/rate/channels are the FIRST frame's (the nominal
    * values for CBR). Trailing garbage stops the walk without throwing:
    * the probe reports the frames it verified. None when no valid first
    * frame exists.
    */
  def probeMp3(payload: Array[Byte]): Option[MediaInfo] = {
    if (payload == null || payload.length < 4) return None
    var pos = 0
    if (payload.length >= 10 && payload(0) == 'I' && payload(1) == 'D' &&
        payload(2) == '3') {
      val size = ((payload(6) & 0x7f) << 21) | ((payload(7) & 0x7f) << 14) |
        ((payload(8) & 0x7f) << 7) | (payload(9) & 0x7f)
      pos = 10 + size
    }
    var frames = 0L
    var durationUs = 0L
    var firstBitrate = 0
    var rate = 0
    var channels = 0
    var done = false
    while (!done && pos + 4 <= payload.length) {
      val b1 = payload(pos) & 0xff
      val b2 = payload(pos + 1) & 0xff
      val b3 = payload(pos + 2) & 0xff
      val b4 = payload(pos + 3) & 0xff
      val verBits = (b2 >> 3) & 0x3   // 3=MPEG1, 2=MPEG2, 0=MPEG2.5
      val layerBits = (b2 >> 1) & 0x3 // 1=Layer III
      // 11-bit sync (incl. the 2.5 extension bit) + valid version + L3
      if (b1 != 0xff || (b2 & 0xe0) != 0xe0 || verBits == 1 || layerBits != 1)
        done = true
      else {
        val bIdx = (b3 >> 4) & 0xf
        val sIdx = (b3 >> 2) & 0x3
        val pad = (b3 >> 1) & 1
        if (bIdx == 0 || bIdx == 15 || sIdx == 3) done = true
        else {
          val v1 = verBits == 3
          val bitrate = if (v1) Mp3BitrateV1L3(bIdx) else Mp3BitrateV2L3(bIdx)
          val sr = mp3Rate(verBits, sIdx)
          val samples = if (v1) 1152 else 576
          val frameLen = samples / 8 * bitrate * 1000 / sr + pad
          if (frames == 0) {
            firstBitrate = bitrate
            rate = sr
            channels = if (((b4 >> 6) & 3) == 3) 1 else 2
          }
          frames += 1
          durationUs += samples.toLong * 1000000L / sr
          pos += frameLen
        }
      }
    }
    if (frames == 0) None
    else Some(MediaInfo("mp3", "mp3", durationUs / 1000L,
      rate, channels, firstBitrate, 0, 0))
  }

  /** Synthesize a silent CBR Layer III stream (valid headers, zeroed
    * payload) — the deterministic fixture the probe oracle replays.
    * `version` 1 (default), 2, or 25 (MPEG-2.5); `bitrateKbps` must be in
    * the version's table and `sampleRate` in its row.
    */
  def encodeMp3Silence(nFrames: Int, bitrateKbps: Int,
      sampleRate: Int = 44100, channels: Int = 2,
      version: Int = 1): Array[Byte] = {
    val verBits = version match {
      case 1 => 3
      case 2 => 2
      case 25 => 0
      case v => throw new IllegalArgumentException(s"mp3 version: $v")
    }
    val table = if (version == 1) Mp3BitrateV1L3 else Mp3BitrateV2L3
    val bIdx = table.indexOf(bitrateKbps)
    val sIdx = (0 until 3).find(i => mp3Rate(verBits, i) == sampleRate)
      .getOrElse(-1)
    require(bIdx > 0, s"not a V${version}L3 bitrate: $bitrateKbps")
    require(sIdx >= 0, s"not a V$version sample rate: $sampleRate")
    require(nFrames > 0, s"need at least one frame, got $nFrames")
    val samples = if (version == 1) 1152 else 576
    val frameLen = samples / 8 * bitrateKbps * 1000 / sampleRate // no padding
    val out = new Array[Byte](nFrames * frameLen)
    var f = 0
    while (f < nFrames) {
      val p = f * frameLen
      out(p) = 0xff.toByte
      out(p + 1) = (0xe0 | (verBits << 3) | 0x02 | 0x01).toByte // L3, no CRC
      out(p + 2) = ((bIdx << 4) | (sIdx << 2)).toByte
      out(p + 3) = (if (channels == 1) 0xc0 else 0x00).toByte
      f += 1
    }
    out
  }

  private def be32(p: Array[Byte], at: Int): Long =
    ((p(at) & 0xffL) << 24) | ((p(at + 1) & 0xffL) << 16) |
      ((p(at + 2) & 0xffL) << 8) | (p(at + 3) & 0xffL)

  /** ISO BMFF (MP4) metadata by box walk — `ftyp` major brand, `moov/
    * mvhd` timescale+duration, first `trak/tkhd` 16.16-fixed dimensions
    * (ISO/IEC 14496-12 layouts, v0 and v1 full boxes). No sample data is
    * touched. None when the bytes are not a plausible BMFF stream.
    */
  def probeMp4(payload: Array[Byte]): Option[MediaInfo] = {
    if (payload == null || payload.length < 16) return None
    def boxes(lo: Long, hi: Long): Iterator[(String, Long, Long)] =
      new Iterator[(String, Long, Long)] {
        private var pos = lo
        def hasNext: Boolean = pos + 8 <= hi
        def next(): (String, Long, Long) = {
          val size0 = be32(payload, pos.toInt)
          val tpe = new String(payload, pos.toInt + 4, 4, US_ASCII)
          val (size, hdr) =
            if (size0 == 1 && pos + 16 <= hi)
              ((be32(payload, pos.toInt + 8) << 32) |
                be32(payload, pos.toInt + 12), 16L)
            else (size0, 8L)
          if (size < hdr || pos + size > hi) { pos = hi; (tpe, -1L, -1L) }
          else { val r = (tpe, pos + hdr, pos + size); pos += size; r }
        }
      }
    val top = boxes(0, payload.length.toLong).toSeq
    if (!top.headOption.exists(b => b._1 == "ftyp" && b._2 >= 0)) return None
    val brand = top.headOption.map(b =>
      new String(payload, b._2.toInt, 4, US_ASCII)).getOrElse("")
    var durationMs = 0L
    var width = 0
    var height = 0
    top.find(b => b._1 == "moov" && b._2 >= 0).foreach { case (_, lo, hi) =>
      boxes(lo, hi).foreach {
        case ("mvhd", blo, _) if blo >= 0 =>
          val v = payload(blo.toInt) & 0xff
          val (ts, dur) =
            if (v == 1) (be32(payload, blo.toInt + 20),
              (be32(payload, blo.toInt + 24) << 32) |
                be32(payload, blo.toInt + 28))
            else (be32(payload, blo.toInt + 12), be32(payload, blo.toInt + 16))
          if (ts > 0) durationMs = dur * 1000L / ts
        case ("trak", tlo, thi) if tlo >= 0 && width == 0 =>
          boxes(tlo, thi).foreach {
            case ("tkhd", klo, khi) if klo >= 0 =>
              val v = payload(klo.toInt) & 0xff
              // width/height are the LAST 8 bytes of the tkhd box
              val wAt = (khi - 8).toInt
              if (wAt >= klo + 4) {
                val w = (be32(payload, wAt) >> 16).toInt
                val h = (be32(payload, wAt + 4) >> 16).toInt
                if (v <= 1 && w > 0 && h > 0) { width = w; height = h }
              }
            case _ =>
          }
        case _ =>
      }
    }
    Some(MediaInfo("mp4", brand, durationMs, 0, 0, 0, width, height))
  }

  /** Synthesize a minimal valid BMFF stream (`ftyp` + `moov{mvhd,
    * trak{tkhd}}`, no media data) — the deterministic MP4 probe fixture.
    * Timescale is 1000, so `durationMs` round-trips exactly.
    */
  def encodeMp4Stub(durationMs: Long, width: Int, height: Int,
      brand: String = "isom"): Array[Byte] = {
    require(brand.length == 4, s"brand must be 4 chars: $brand")
    def box(tpe: String, body: Array[Byte]): Array[Byte] = {
      val bb = ByteBuffer.allocate(8 + body.length)
      bb.putInt(8 + body.length).put(tpe.getBytes(US_ASCII)).put(body)
      bb.array()
    }
    val ftyp = box("ftyp",
      ByteBuffer.allocate(8).put(brand.getBytes(US_ASCII)).putInt(0).array())
    // mvhd v0: vf + ctime + mtime + timescale + duration + rate + volume
    // + 10 reserved + 36 matrix + 24 predefined + next_track_id = 100
    val mvhd = {
      val bb = ByteBuffer.allocate(100)
      bb.putInt(0).putInt(0).putInt(0).putInt(1000).putInt(durationMs.toInt)
      bb.putInt(0x00010000).putShort(0x0100.toShort).putShort(0)
      bb.position(bb.position() + 8) // reserved
      Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
        .foreach(bb.putInt) // identity matrix
      bb.position(bb.position() + 24) // pre_defined
      bb.putInt(2) // next_track_ID
      box("mvhd", bb.array())
    }
    // tkhd v0: vf + ctime + mtime + track_ID + reserved + duration +
    // 8 reserved + layer/group/volume/reserved + matrix + width + height = 84
    val tkhd = {
      val bb = ByteBuffer.allocate(84)
      bb.putInt(0x00000007).putInt(0).putInt(0).putInt(1).putInt(0)
      bb.putInt(durationMs.toInt)
      bb.position(bb.position() + 8)
      bb.putShort(0).putShort(0).putShort(0).putShort(0)
      Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
        .foreach(bb.putInt)
      bb.putInt(width << 16).putInt(height << 16)
      box("tkhd", bb.array())
    }
    ftyp ++ box("moov", mvhd ++ box("trak", tkhd))
  }

  /** Dispatch a payload to the right metadata probe by magic bytes —
    * compressed containers (header-only) AND the fully-decoded formats,
    * so `describe`-style cards cover every asset class uniformly. None
    * when nothing matches (quarantine, don't guess).
    */
  def probe(payload: Array[Byte]): Option[MediaInfo] = {
    if (payload == null || payload.length < 4) return None
    val p0 = payload(0) & 0xff
    val p1 = payload(1) & 0xff
    if (p0 == 'I' && p1 == 'D' && (payload(2) & 0xff) == '3') probeMp3(payload)
    else if (p0 == 0xff && (p1 & 0xe0) == 0xe0 &&
      ((p1 >> 1) & 3) == 1 && ((p1 >> 3) & 3) != 1) probeMp3(payload)
    else if (payload.length >= 12 &&
      new String(payload, 4, 4, US_ASCII) == "ftyp") probeMp4(payload)
    else if (p0 == 'R' && payload.length >= 12 &&
      new String(payload, 0, 4, US_ASCII) == "RIFF" &&
      new String(payload, 8, 4, US_ASCII) == "WAVE")
      decodeWav(payload).map { case (rate, samples) =>
        MediaInfo("wav", "pcm_s16le", samples.length * 1000L / rate,
          rate, 1, rate * 16 / 1000, 0, 0)
      }
    else if (p0 == 'P' && p1 == '6')
      decodePpm(payload).map { case (w, h, _) =>
        MediaInfo("ppm", "rgb24", 0, 0, 0, 0, w, h)
      }
    else if (p0 == 'B' && p1 == 'M')
      decodeBmp(payload).map { case (w, h, _) =>
        MediaInfo("bmp", "rgb24", 0, 0, 0, 0, w, h)
      }
    else None
  }

  // ------------------------------------------------------------ the codec

  /** The production-shaped codec: real decode where the bytes ARE a format
    * this JVM parses, stub behavior everywhere else.
    */
  object JvmCodec extends Multimodal.MediaCodec {

    /** Hand-rolled formats first (cheap magic checks), then the JDK's
      * ImageIO registry (PNG/JPEG/GIF). */
    override def decodeImage(payload: Array[Byte]): Option[(Int, Int, Array[Byte])] =
      decodePpm(payload).orElse(decodeBmp(payload)).orElse(decodeImageIo(payload))

    override def decodeAudio(payload: Array[Byte]): Option[(Int, Array[Short])] =
      decodeWav(payload)

    /** Image: [rMean, gMean, bMean] in [0,1] then a luminance histogram over
      * the remaining bins. Audio: [mean, rms] in [-1,1]/[0,1] then an
      * amplitude histogram. Neither decodable: stub byte histogram.
      */
    def features(modality: String, payload: Array[Byte], nFeatures: Int): Array[Float] = {
      decodeImage(payload) match {
        case Some((w, h, px)) if nFeatures >= 4 =>
          val out = new Array[Float](nFeatures)
          val n = w * h
          val bins = nFeatures - 3
          var j = 0
          while (j < px.length) {
            val r = px(j) & 0xff; val g = px(j + 1) & 0xff; val b = px(j + 2) & 0xff
            out(0) += r; out(1) += g; out(2) += b
            // integer ITU-R 601 luma; bin index in [0, bins)
            val luma = (299 * r + 587 * g + 114 * b) / 1000
            out(3 + math.min(bins - 1, luma * bins / 256)) += 1.0f
            j += 3
          }
          var c = 0
          while (c < 3) { out(c) /= 255.0f * n; c += 1 }
          while (c < nFeatures) { out(c) /= n; c += 1 }
          out
        case _ => decodeWav(payload) match {
          case Some((_, samples)) if nFeatures >= 3 && samples.nonEmpty =>
            val out = new Array[Float](nFeatures)
            val bins = nFeatures - 2
            var sum = 0.0; var sq = 0.0
            var i = 0
            while (i < samples.length) {
              val s = samples(i).toInt
              sum += s; sq += s.toDouble * s
              out(2 + math.min(bins - 1, (s + 32768) * bins / 65536)) += 1.0f
              i += 1
            }
            val n = samples.length
            out(0) = (sum / n / 32768.0).toFloat
            out(1) = (math.sqrt(sq / n) / 32768.0).toFloat
            var c = 2
            while (c < nFeatures) { out(c) /= n; c += 1 }
            out
          case _ => Multimodal.StubCodec.features(modality, payload, nFeatures)
        }
      }
    }

    /** Format-preserving: PPM stays PPM, BMP stays BMP, else stub. */
    def resize(payload: Array[Byte], w: Int, h: Int): Array[Byte] =
      resizePpmNearest(payload, w, h)
        .orElse(resizeBmpNearest(payload, w, h))
        .getOrElse(Multimodal.StubCodec.resize(payload, w, h))

    /** Real frame sampling: a concatenated-PPM stream splits on frame
      * boundaries (every Nth standalone PPM kept); WAV audio yields
      * 1024-sample windows re-encoded as standalone WAVs; anything else
      * falls back to the stub chunking. */
    def sampleFrames(payload: Array[Byte], everyN: Int): Seq[Array[Byte]] =
      splitPpmStream(payload) match {
        case Some(frames) =>
          frames.zipWithIndex.collect { case (f, i) if i % everyN == 0 => f }
        case None => decodeWav(payload) match {
          case Some((rate, samples)) =>
            samples.grouped(1024).zipWithIndex.collect {
              case (chunk, i) if i % everyN == 0 => encodeWav(rate, chunk)
            }.toSeq
          case None => Multimodal.StubCodec.sampleFrames(payload, everyN)
        }
      }
  }
}
