package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row}

/** Multimodal column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with a typed metadata struct; decode / feature-extract /
  * resize / frame-sample run as partition-batched kernels.
  *
  * Codecs behind the seam ([[MediaCodecs.JvmCodec]]): REAL decode for
  * PPM/BMP (hand-rolled), PNG/JPEG/GIF (JDK ImageIO), WAV-PCM16 audio and
  * concatenated-PPM video streams — all oracled (q104/q105/q108/q112/q113).
  * [[StubCodec]] remains the deterministic fallback for formats a bare JVM
  * cannot parse (compressed audio/video); a production build swaps in an
  * FFI decoder for those while keeping every signature identical.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video
    StructField("bytes", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("n_frames", IntegerType, nullable = true))), nullable = true)))

  /** The kernel seam. A production build plugs a real decoder here; the stub
    * is deterministic over the payload so pipelines are testable end-to-end.
    */
  trait MediaCodec extends Serializable {
    /** bytes -> fixed-length feature vector */
    def features(modality: String, payload: Array[Byte], nFeatures: Int): Array[Float]
    /** bytes -> (width, height) after a resize — stub records intent only */
    def resize(payload: Array[Byte], w: Int, h: Int): Array[Byte]
    /** video bytes -> every nth "frame" payload */
    def sampleFrames(payload: Array[Byte], everyN: Int): Seq[Array[Byte]]
    /** bytes -> (width, height, packed RGB raster) when this codec TRULY
      * decodes the payload as an image; None otherwise. The stub decodes
      * nothing; [[MediaCodecs.JvmCodec]] decodes PPM for real. */
    def decodeImage(payload: Array[Byte]): Option[(Int, Int, Array[Byte])] = None
    /** bytes -> (sample rate, PCM16 samples) when truly decodable as audio. */
    def decodeAudio(payload: Array[Byte]): Option[(Int, Array[Short])] = None
  }

  /** Deterministic fake codec: features are byte-histogram moments, resize
    * re-stamps a fake header, frame sampling chunks the payload. Real decode
    * would replace exactly these three bodies.
    */
  object StubCodec extends MediaCodec {
    def features(modality: String, payload: Array[Byte], nFeatures: Int): Array[Float] = {
      val out = new Array[Float](nFeatures)
      if (payload == null || payload.isEmpty) return out
      var i = 0
      while (i < payload.length) {
        val b = payload(i) & 0xff
        out(b % nFeatures) += 1.0f
        i += 1
      }
      val n = payload.length.toFloat
      out.indices.foreach(j => out(j) /= n)
      out
    }
    def resize(payload: Array[Byte], w: Int, h: Int): Array[Byte] =
      Array[Byte]((w & 0xff).toByte, (h & 0xff).toByte) ++ payload.take(64)
    def sampleFrames(payload: Array[Byte], everyN: Int): Seq[Array[Byte]] =
      payload.grouped(256).zipWithIndex.collect {
        case (chunk, i) if i % everyN == 0 => chunk
      }.toSeq
  }

  /** Partition-batched feature extraction (the Scala analogue of a
    * mapInPandas batch kernel): one codec instance per partition, rows
    * streamed through it, output schema = input + features array.
    */
  def extractFeatures(media: DataFrame, nFeatures: Int,
      codec: MediaCodec = StubCodec): DataFrame = {
    val outSchema = StructType(media.schema.fields :+
      StructField("features", ArrayType(FloatType), nullable = false))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val modalityIdx = media.schema.fieldIndex("modality")
    val bytesIdx = media.schema.fieldIndex("bytes")
    media.mapPartitions { rows =>
      rows.map { r =>
        val feats = codec.features(r.getString(modalityIdx),
          r.getAs[Array[Byte]](bytesIdx), nFeatures)
        Row.fromSeq(r.toSeq :+ feats.toSeq)
      }
    }(enc)
  }

  /** Partition-batched frame sampling: one codec per partition, each media
    * row exploded into its kept frames. Output: (media_id LONG,
    * frame_idx INT — position in the KEPT sequence, frame BINARY).
    */
  def sampleFrames(media: DataFrame, everyN: Int,
      codec: MediaCodec = StubCodec): DataFrame = {
    require(everyN > 0, s"everyN must be positive, got $everyN")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame", BinaryType, nullable = true)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val bytesIdx = media.schema.fieldIndex("bytes")
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val payload = r.getAs[Array[Byte]](bytesIdx)
        if (payload == null) Iterator.empty
        else codec.sampleFrames(payload, everyN).iterator.zipWithIndex.map {
          case (frame, j) => Row(r.getLong(idIdx), j, frame)
        }
      }
    }(enc)
  }

  /** Partition-batched resize: payloads re-encoded via the codec seam, the
    * meta struct re-stamped with the target dims. Output schema = input
    * (modality/meta preserved, bytes replaced).
    */
  def resize(media: DataFrame, w: Int, h: Int,
      codec: MediaCodec = StubCodec): DataFrame = {
    require(w > 0 && h > 0, s"resize dims must be positive, got ${w}x$h")
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(media.schema)
    val bytesIdx = media.schema.fieldIndex("bytes")
    val metaIdx = media.schema.fieldIndex("meta")
    // resolve the dim fields BY NAME within whatever meta struct the caller
    // has — only width/height are touched, other fields ride through
    val metaSchema = media.schema(metaIdx).dataType.asInstanceOf[StructType]
    val wIdx = metaSchema.fieldIndex("width")
    val hIdx = metaSchema.fieldIndex("height")
    media.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](bytesIdx)
        val resized = if (payload == null) null else codec.resize(payload, w, h)
        val meta = r.getAs[Row](metaIdx)
        val newMeta =
          if (meta == null) null
          else Row.fromSeq(meta.toSeq.updated(wIdx, w).updated(hIdx, h))
        Row.fromSeq(r.toSeq.updated(bytesIdx, resized).updated(metaIdx, newMeta))
      }
    }(enc)
  }

  /** Decoded image stats through the codec seam: one row per payload the
    * codec truly decodes — (media_id, width, height, per-channel byte sums).
    * Integer sums, so a SQL oracle replays them EXACTLY (float moments would
    * drift between f32 kernel and f64 SQL at the 6th decimal).
    */
  def imageStats(media: DataFrame,
      codec: MediaCodec = MediaCodecs.JvmCodec): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("r_sum", LongType, nullable = false),
      StructField("g_sum", LongType, nullable = false),
      StructField("b_sum", LongType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val bytesIdx = media.schema.fieldIndex("bytes")
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        codec.decodeImage(r.getAs[Array[Byte]](bytesIdx)).map { case (w, h, px) =>
          var rs = 0L; var gs = 0L; var bs = 0L
          var j = 0
          while (j < px.length) {
            val v = (px(j) & 0xff).toLong
            (j % 3: @annotation.switch) match {
              case 0 => rs += v
              case 1 => gs += v
              case _ => bs += v
            }
            j += 1
          }
          Row(r.getLong(idIdx), w, h, rs, gs, bs)
        }
      }
    }(enc)
  }

  /** SCENE-CUT signal over a video payload: per consecutive decoded frame
    * pair, the exact pixel-difference mass Σ|a−b| over raster bytes (the
    * classic cut detector's statistic) and the flag at `cutThreshold` —
    * what a video-curation gate reads to segment clips and drop static
    * filler. Frames come through the same codec seam ([[MediaCodec]]
    * sampleFrames at stride 1 + real image decode per frame); the
    * statistic is an exact integer, SQL-replayable. Frames whose raster
    * sizes differ (format change mid-stream) fail loudly.
    */
  def frameDiffs(media: DataFrame, cutThreshold: Long,
      codec: MediaCodec = MediaCodecs.JvmCodec): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("diff_sum", LongType, nullable = false),
      StructField("is_cut", BooleanType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val bytesIdx = media.schema.fieldIndex("bytes")
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(idIdx)
        val frames = codec.sampleFrames(r.getAs[Array[Byte]](bytesIdx), 1)
          .map(f => codec.decodeImage(f).getOrElse(
            throw new IllegalArgumentException(
              s"frameDiffs: frame of video $id failed to decode")))
        frames.sliding(2).zipWithIndex.collect {
          case (Seq((wa, ha, a), (wb, hb, b)), i) =>
            require(wa == wb && ha == hb && a.length == b.length,
              s"frameDiffs: video $id frame ${i + 1} dims changed " +
                s"(${wa}x$ha -> ${wb}x$hb)")
            var d = 0L
            var j = 0
            while (j < a.length) {
              d += math.abs((a(j) & 0xff) - (b(j) & 0xff)).toLong
              j += 1
            }
            Row(id, i + 1, d, d >= cutThreshold)
        }
      }
    }(enc)
  }

  /** ViT-style PATCH grid statistics over the decoded raster — the
    * patch-embedding plumbing vision-language data prep needs: the image
    * cut into `patchW`×`patchH` tiles (partial edge tiles kept, their
    * true pixel counts reported), per-tile exact integer channel sums.
    * One row per (image, patch_row, patch_col); the downstream embed step
    * consumes exactly this batch shape. Same codec seam and SQL-replay
    * discipline as [[imageStats]].
    */
  def imagePatchStats(media: DataFrame, patchW: Int, patchH: Int,
      codec: MediaCodec = MediaCodecs.JvmCodec): DataFrame = {
    require(patchW > 0 && patchH > 0, s"bad patch size ${patchW}x$patchH")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("patch_row", IntegerType, nullable = false),
      StructField("patch_col", IntegerType, nullable = false),
      StructField("n_px", IntegerType, nullable = false),
      StructField("r_sum", LongType, nullable = false),
      StructField("g_sum", LongType, nullable = false),
      StructField("b_sum", LongType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val bytesIdx = media.schema.fieldIndex("bytes")
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        codec.decodeImage(r.getAs[Array[Byte]](bytesIdx)).toSeq.flatMap {
          case (w, h, px) =>
            val id = r.getLong(idIdx)
            val npr = (h + patchH - 1) / patchH
            val npc = (w + patchW - 1) / patchW
            val rs = Array.ofDim[Long](npr * npc)
            val gs = Array.ofDim[Long](npr * npc)
            val bs = Array.ofDim[Long](npr * npc)
            val np = Array.ofDim[Int](npr * npc)
            var p = 0
            while (p * 3 < px.length) {
              val y = p / w
              val x = p % w
              val t = (y / patchH) * npc + (x / patchW)
              rs(t) += (px(p * 3) & 0xff).toLong
              gs(t) += (px(p * 3 + 1) & 0xff).toLong
              bs(t) += (px(p * 3 + 2) & 0xff).toLong
              np(t) += 1
              p += 1
            }
            (0 until npr * npc).map(t =>
              Row(id, t / npc, t % npc, np(t), rs(t), gs(t), bs(t)))
        }
      }
    }(enc)
  }

  /** Decoded audio stats through the codec seam: one row per truly-decoded
    * payload — (media_id, header sample rate, sample count, signed sum,
    * abs sum). Integer outputs for exact SQL replay, as [[imageStats]].
    */
  def audioStats(media: DataFrame,
      codec: MediaCodec = MediaCodecs.JvmCodec): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("sample_rate", IntegerType, nullable = false),
      StructField("n_samples", IntegerType, nullable = false),
      StructField("sum_samples", LongType, nullable = false),
      StructField("sum_abs", LongType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val bytesIdx = media.schema.fieldIndex("bytes")
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        codec.decodeAudio(r.getAs[Array[Byte]](bytesIdx)).map { case (rate, samples) =>
          var sum = 0L; var abs = 0L
          var i = 0
          while (i < samples.length) {
            val s = samples(i).toLong
            sum += s; abs += math.abs(s)
            i += 1
          }
          Row(r.getLong(idIdx), rate, samples.length, sum, abs)
        }
      }
    }(enc)
  }

  /** Per-FRAME audio features over the decoded PCM stream — the DSP
    * signals an audio-curation gate reads (silence/clipping detection,
    * energy-based segmentation): for each `frameSize`-sample window,
    * ENERGY = Σ s², and the ZERO-CROSSING count (adjacent samples whose
    * non-negativity differs, the first sample of a frame compared against
    * the last of the previous — the stream is one signal, frames are just
    * coordinates). Both are exact integer statistics of the decoded
    * samples, so the whole card replays in SQL from the generator formula
    * (the same discipline as [[audioStats]]: real RIFF decode on the
    * engine side, first-principles replay on the oracle side).
    */
  def audioFrameFeatures(media: DataFrame, frameSize: Int,
      codec: MediaCodec = MediaCodecs.JvmCodec): DataFrame = {
    require(frameSize > 0, s"frameSize must be positive, got $frameSize")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("n_samples", IntegerType, nullable = false),
      StructField("energy", LongType, nullable = false),
      StructField("zero_crossings", LongType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val idIdx = media.schema.fieldIndex("media_id")
    val bytesIdx = media.schema.fieldIndex("bytes")
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        codec.decodeAudio(r.getAs[Array[Byte]](bytesIdx)).toSeq.flatMap {
          case (_, samples) =>
            val id = r.getLong(idIdx)
            (0 until (samples.length + frameSize - 1) / frameSize).map { f =>
              val start = f * frameSize
              val end = math.min(samples.length, start + frameSize)
              var energy = 0L
              var zc = 0L
              var i = start
              while (i < end) {
                val s = samples(i).toLong
                energy += s * s
                if (i > 0 && ((samples(i) >= 0) != (samples(i - 1) >= 0))) zc += 1
                i += 1
              }
              Row(id, f, end - start, energy, zc)
            }
        }
      }
    }(enc)
  }

  /** Synthesize REAL-format payloads from an id column: even ids carry a
    * 16x16 binary PPM whose raster byte j is `(id*2654435761 + j*40503) % 256`;
    * odd ids an `audioSamples`-sample PCM16 WAV at `8000 + (id%8)*1000` Hz
    * whose sample i is `(id*40503 + i*69069) % 65536 - 32768`. The formulas
    * ARE the oracle contract: DuckDB replays the decoded stats from first
    * principles while the payload itself round-trips a real codec.
    */
  def synthesizeReal(ids: DataFrame, idCol: String,
      audioSamples: Int = 441): DataFrame = {
    require(audioSamples > 0, s"audioSamples must be positive, got $audioSamples")
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(mediaSchema)
    ids.select(col(idCol).cast("long").as("media_id")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        if (id % 2 == 0) {
          val raster = new Array[Byte](768)
          var j = 0
          while (j < 768) {
            raster(j) = ((id * 2654435761L + j * 40503L) % 256L).toByte
            j += 1
          }
          Row(id, "image", MediaCodecs.encodePpm(16, 16, raster),
            Row(16, 16, null, null))
        } else {
          val rate = (8000 + (id % 8) * 1000).toInt
          val samples = new Array[Short](audioSamples)
          var i = 0
          while (i < audioSamples) {
            samples(i) = ((id * 40503L + i * 69069L) % 65536L - 32768L).toShort
            i += 1
          }
          Row(id, "audio", MediaCodecs.encodeWav(rate, samples),
            Row(null, null, rate, null))
        }
      }
    }(enc)
  }

  /** Synthesize real multi-frame "video": each payload is `frames`
    * back-to-back binary PPMs (the concatenated-raster stream
    * [[MediaCodecs.splitPpmStream]] parses); frame `f` raster byte `j` is
    * `(id*2654435761 + f*7919 + j*40503) % 256` — the oracle contract for
    * replaying per-frame stats after real frame extraction.
    */
  def synthesizeVideoPpm(ids: DataFrame, idCol: String, frames: Int = 6,
      w: Int = 8, h: Int = 6): DataFrame = {
    require(frames > 0 && w > 0 && h > 0, s"bad video shape ${frames}x${w}x$h")
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(mediaSchema)
    ids.select(col(idCol).cast("long").as("media_id")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val stream = (0 until frames).flatMap { f =>
          val raster = new Array[Byte](3 * w * h)
          var j = 0
          while (j < raster.length) {
            raster(j) = ((id * 2654435761L + f * 7919L + j * 40503L) % 256L).toByte
            j += 1
          }
          MediaCodecs.encodePpm(w, h, raster)
        }.toArray
        Row(id, "video", stream, Row(w, h, null, frames))
      }
    }(enc)
  }

  /** Synthesize real 24bpp BMP payloads: logical (top-down RGB) raster byte
    * j of id's image is `(id*1103515245 + j*12345) % 256` — the oracle
    * contract. The encoder then applies BMP's bottom-up row order, BGR
    * channel swap and 4-byte row padding, so a matching decode proves all
    * three inversions.
    */
  def synthesizeBmp(ids: DataFrame, idCol: String, w: Int = 10,
      h: Int = 7): DataFrame = {
    require(w > 0 && h > 0, s"bad dims ${w}x$h")
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(mediaSchema)
    ids.select(col(idCol).cast("long").as("media_id")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val raster = new Array[Byte](3 * w * h)
        var j = 0
        while (j < raster.length) {
          raster(j) = ((id * 1103515245L + j * 12345L) % 256L).toByte
          j += 1
        }
        Row(id, "image", MediaCodecs.encodeBmp(w, h, raster), Row(w, h, null, null))
      }
    }(enc)
  }

  /** Synthesize real PNG payloads through the JDK's ImageIO encoder:
    * logical raster byte j of id's 12x5 image is `(id*48271 + j*16807) % 256`.
    * PNG is lossless, so the q113 oracle replaying this formula proves the
    * ImageIO encode→decode round trip bit-for-bit — a REAL third-party
    * codec in the decode path, not a hand-rolled one.
    */
  def synthesizePng(ids: DataFrame, idCol: String, w: Int = 12,
      h: Int = 5): DataFrame = {
    require(w > 0 && h > 0, s"bad dims ${w}x$h")
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(mediaSchema)
    ids.select(col(idCol).cast("long").as("media_id")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val raster = new Array[Byte](3 * w * h)
        var j = 0
        while (j < raster.length) {
          raster(j) = ((id * 48271L + j * 16807L) % 256L).toByte
          j += 1
        }
        Row(id, "image", MediaCodecs.encodePng(w, h, raster), Row(w, h, null, null))
      }
    }(enc)
  }

  /** Container-metadata probe over opaque payloads — the `describe` row
    * for media assets, INCLUDING compressed ones whose decode stays
    * stubbed (MP3 frame-header walk, MP4 box walk: header-only, public
    * spec, zero samples touched — [[MediaCodecs.probeMp3]]/[[MediaCodecs.probeMp4]]),
    * plus the fully-decoded formats (WAV/PPM/BMP) for uniformity. One
    * row per input: (idCol, container, codec, duration_ms, sample_rate,
    * channels, bitrate_kbps, width, height) — container null when no
    * probe matches (quarantine, don't guess). Per-row map, zero shuffle.
    */
  def mediaProbe(media: DataFrame, idCol: String = "media_id",
      payloadCol: String = "bytes"): DataFrame = {
    val p = udf((payload: Array[Byte]) =>
      MediaCodecs.probe(payload).map(i => (i.container, i.codec,
        i.durationMs, i.sampleRate, i.channels, i.bitrateKbps,
        i.width, i.height)))
    media.select(col(idCol), p(col(payloadCol)).as("_p"))
      .select(col(idCol),
        col("_p._1").as("container"), col("_p._2").as("codec"),
        col("_p._3").as("duration_ms"), col("_p._4").as("sample_rate"),
        col("_p._5").as("channels"), col("_p._6").as("bitrate_kbps"),
        col("_p._7").as("width"), col("_p._8").as("height"))
  }

  /** Per-container describe card over [[mediaProbe]] output: one row per
    * container (null = unprobeable/quarantine) with counts, total/max
    * duration and max dimensions — the first look a multimodal corpus
    * gets at 100 TB, covering COMPRESSED assets via the header-only
    * probes. One per-row map + one small aggregation; the payload bytes
    * never cross an exchange (only the probe's fixed-width fields do).
    */
  def mediaCard(media: DataFrame, idCol: String = "media_id",
      payloadCol: String = "bytes"): DataFrame =
    mediaProbe(media, idCol, payloadCol)
      .groupBy("container")
      .agg(count(lit(1)).as("n"),
        count_distinct(col("codec")).as("n_codecs"),
        sum(col("duration_ms")).as("total_duration_ms"),
        max(col("duration_ms")).as("max_duration_ms"),
        max(col("width")).as("max_width"),
        max(col("height")).as("max_height"))

  /** Synthesize a media table from any (id, text) source — payload = UTF-8
    * bytes, modality round-robins — so the plumbing is exercisable with the
    * driver testdata.
    */
  def synthesizeFromText(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("media_id"),
      element_at(typedLit(Seq("image", "audio", "video")),
        (pmod(col(idCol), lit(3)) + 1).cast("int")).as("modality"),
      encode(col(textCol), "UTF-8").as("bytes"),
      struct(
        lit(64).as("width"), lit(64).as("height"),
        lit(16000).as("sample_rate"), lit(0).as("n_frames")).as("meta"))
}
