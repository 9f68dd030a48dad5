package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions
import graft.operators.{MediaCodecs, Multimodal, Packing}

/** Text-analysis and content-tooling queries over the documents/events
  * tables: token counting, quality scoring, language ID, fingerprinting,
  * JSON extraction (F9), content-type sniffing (A16), multimodal plumbing.
  */
object TextQueries {

  /** DuckDB token list for `text` (mirrors TextFunctions.tokens). */
  private val duckToks = "list_filter(string_split(lower(text), ' '), x -> x != '')"
  private val stopSet = "('the', 'a', 'an', 'of', 'and', 'to', 'in', 'is', 'on', 'for')"

  val all: Seq[GQuery] = Seq(

    // F9 jjq-style JSON extraction over the events props column.
    GQuery(
      "q34_json_extract",
      """SELECT event_id, json_extract_string(props, '$.k')::BIGINT AS k
        |FROM events WHERE event_id < 2000""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .filter(col("event_id") < 2000)
        .select(col("event_id"), get_json_object(col("props"), "$.k").cast("long").as("k"))
    },

    // A16 content-type detection: sample records, classify, majority shape.
    GQuery(
      "q35_content_type",
      """SELECT content_type, count(*) AS cnt FROM (
        |  SELECT CASE
        |    WHEN starts_with(trim(t), '{') AND ends_with(trim(t), '}') THEN 'json'
        |    WHEN starts_with(trim(t), '[') AND ends_with(trim(t), ']') THEN 'json'
        |    ELSE 'text' END AS content_type
        |  FROM (SELECT text AS t FROM documents UNION ALL SELECT props AS t FROM events))
        |GROUP BY content_type""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir).select(col("text").as("t"))
      val props = Tables.events(s, dir).select(col("props").as("t"))
      docs.unionByName(props)
        .select(TextFunctions.contentType(col("t")).as("content_type"))
        .groupBy("content_type").agg(count(lit(1)).as("cnt"))
    },

    GQuery(
      "q40_token_count",
      s"""SELECT doc_id, len($duckToks) AS n_tokens, length(text) AS n_chars
         |FROM documents""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id"),
        TextFunctions.tokenCount(lower(col("text"))).as("n_tokens"),
        length(col("text")).as("n_chars"))
    },

    GQuery(
      "q41_quality_score",
      s"""WITH t AS (
         |  SELECT doc_id,
         |    (length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))::DOUBLE
         |      / greatest(length(text), 1) AS punct_ratio,
         |    len(list_filter($duckToks, tk -> tk IN $stopSet))::DOUBLE
         |      / greatest(len($duckToks), 1) AS stop_ratio,
         |    coalesce(list_sum(list_transform($duckToks, tk -> length(tk))), 0)::DOUBLE
         |      / greatest(len($duckToks), 1) AS mean_wlen
         |  FROM documents)
         |SELECT doc_id,
         |  round(punct_ratio, 6) AS punct_ratio,
         |  round(stop_ratio, 6) AS stop_ratio,
         |  round(mean_wlen, 6) AS mean_wlen,
         |  round(least(stop_ratio * 4.0, 1.0) * 0.4
         |      + (CASE WHEN mean_wlen >= 3.0 AND mean_wlen <= 8.0 THEN 1.0 ELSE 0.5 END) * 0.3
         |      + greatest(0.0, 1.0 - punct_ratio * 10.0) * 0.3, 6) AS quality
         |FROM t""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id"),
        round(TextFunctions.punctRatio(col("text")), 6).as("punct_ratio"),
        round(TextFunctions.stopwordRatio(col("text")), 6).as("stop_ratio"),
        round(TextFunctions.meanWordLength(lower(col("text"))), 6).as("mean_wlen"),
        round(TextFunctions.qualityScore(col("text")), 6).as("quality"))
    },

    GQuery(
      "q42_langid",
      """SELECT doc_id, CASE
        |    WHEN len(regexp_extract_all(lower(text), '[\x{4e00}-\x{9fff}]')) > 0 THEN 'zh'
        |    WHEN greatest(en_s, de_s, fr_s, es_s) = 0 THEN 'und'
        |    WHEN en_s = greatest(en_s, de_s, fr_s, es_s) THEN 'en'
        |    WHEN de_s = greatest(en_s, de_s, fr_s, es_s) THEN 'de'
        |    WHEN fr_s = greatest(en_s, de_s, fr_s, es_s) THEN 'fr'
        |    ELSE 'es' END AS pred_lang
        |FROM (
        |  SELECT doc_id, text,
        |    len(regexp_extract_all(lower(text), '\b(the|and|is|of)\b')) AS en_s,
        |    len(regexp_extract_all(lower(text), '\b(der|und|die|nicht)\b')) AS de_s,
        |    len(regexp_extract_all(lower(text), '\b(le|et|les|est)\b')) AS fr_s,
        |    len(regexp_extract_all(lower(text), '\b(el|los|es|una)\b')) AS es_s
        |  FROM documents)""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id"), TextFunctions.langId(col("text")).as("pred_lang"))
    },

    GQuery(
      "q43_fingerprint",
      """SELECT doc_id, md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint
        |FROM documents""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id"), TextFunctions.fingerprint(col("text")).as("fingerprint"))
    },

    // BPE-ish pretokenizer count (the LLM-pipeline token estimator).
    GQuery(
      "q57_bpe_token_count",
      """SELECT doc_id,
        |       len(regexp_extract_all(text, '''(?:[sdmt]|ll|ve|re)| ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+'))
        |         AS n_bpe
        |FROM documents""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id"), TextFunctions.bpeTokenCount(col("text")).cast("long").as("n_bpe"))
    },

    // Unit normalization of embedding vectors (f64 components).
    GQuery(
      "q58_normalize_embeddings",
      """SELECT vec_id,
        |  round(embedding[1]::DOUBLE
        |    / sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE*x::DOUBLE))), 6) AS c0,
        |  round(sqrt(list_sum(list_transform(
        |    list_transform(range(1, len(embedding)+1),
        |      i -> embedding[i]::DOUBLE
        |         / sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE*x::DOUBLE)))),
        |    x -> x*x))), 6) AS unit_norm
        |FROM embeddings WHERE vec_id < 100""".stripMargin) { (s, dir) =>
      import graft.functions.VectorFunctions
      Tables.embeddings(s, dir).filter(col("vec_id") < 100)
        .select(col("vec_id"),
          VectorFunctions.normalize(col("embedding")).as("nv"))
        .select(col("vec_id"),
          round(element_at(col("nv"), 1), 6).as("c0"),
          round(sqrt(aggregate(col("nv"), lit(0.0), (acc, x) => acc + x * x)), 6).as("unit_norm"))
    },

    // Repetition ratio (1 - type/token): the degenerate-text signal a
    // training-data filter thresholds on.
    GQuery(
      "q86_repetition_ratio",
      s"""SELECT doc_id,
         |  round(CASE WHEN len($duckToks) = 0 THEN 0.0
         |        ELSE 1.0 - len(list_distinct($duckToks))::DOUBLE / len($duckToks)
         |        END, 6) AS rep_ratio
         |FROM documents""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id"),
        round(TextFunctions.repetitionRatio(
          TextFunctions.tokens(lower(col("text")))), 6).as("rep_ratio"))
    },

    // Multimodal plumbing: binary payload column + partition-batched stub
    // feature extraction. The stub codec's byte-histogram features ARE
    // SQL-expressible over ASCII payloads, so the oracle recomputes every
    // bucket count from the text bytes (features are emitted as counts —
    // freq × n_bytes rounds back to the exact integer).
    GQuery(
      "q51_multimodal_features",
      """WITH d AS (SELECT doc_id, regexp_replace(text, '[^ -~]', '', 'g') AS t
        |           FROM documents WHERE doc_id < 500),
        |chars AS (SELECT doc_id, ascii(substr(t, i::INT, 1)) % 8 AS bucket
        |          FROM d, (SELECT unnest(range(1, (SELECT max(length(t)) + 1 FROM d))) AS i)
        |          WHERE i <= length(t)),
        |h AS (SELECT doc_id, bucket, count(*) AS cnt FROM chars GROUP BY 1, 2),
        |grid AS (SELECT doc_id, length(t) AS n_bytes, b.bucket
        |         FROM d, (SELECT unnest(range(8)) AS bucket) b)
        |SELECT g.doc_id AS media_id,
        |       (['image','audio','video'])[(g.doc_id % 3)::INT + 1] AS modality,
        |       g.n_bytes, g.bucket, coalesce(h.cnt, 0) AS cnt
        |FROM grid g LEFT JOIN h ON h.doc_id = g.doc_id AND h.bucket = g.bucket""".stripMargin) { (s, dir) =>
      val ascii = Tables.documents(s, dir).filter(col("doc_id") < 500)
        .select(col("doc_id"), regexp_replace(col("text"), "[^ -~]", "").as("text"))
      val media = Multimodal.synthesizeFromText(ascii, "doc_id", "text")
      Multimodal.extractFeatures(media, nFeatures = 8)
        .select(col("media_id"), col("modality"),
          octet_length(col("bytes")).as("n_bytes"),
          posexplode(col("features")).as(Seq("bucket", "freq")))
        .select(col("media_id"), col("modality"), col("n_bytes"),
          col("bucket").cast("long").as("bucket"),
          round(col("freq").cast("double") * col("n_bytes")).cast("long").as("cnt"))
    },

    // Multimodal frame sampling: video-modality payloads chunked into
    // 256-byte "frames", every 2nd kept (the decode-free stub of video
    // frame extraction), exploded one row per kept frame. ASCII-stripped
    // payloads make byte chunks == char chunks, so the oracle replays the
    // chunking with substring + md5.
    GQuery(
      "q95_multimodal_frames",
      """WITH v AS (SELECT doc_id AS media_id,
        |                  regexp_replace(text, '[^ -~]', '', 'g') AS t
        |           FROM documents WHERE doc_id % 3 = 2),
        |idx AS (SELECT media_id, t,
        |               unnest(range((length(t) + 255) // 256))::BIGINT AS ci
        |        FROM v),
        |kept AS (SELECT media_id, ci, substring(t, (ci*256 + 1)::BIGINT, 256) AS chunk
        |         FROM idx WHERE ci % 2 = 0)
        |SELECT media_id, (ci // 2)::INT AS frame_idx,
        |       length(chunk)::INT AS frame_len, md5(chunk) AS frame_md5
        |FROM kept""".stripMargin) { (s, dir) =>
      val ascii = Tables.documents(s, dir)
        .select(col("doc_id"), regexp_replace(col("text"), "[^ -~]", "").as("text"))
      val media = Multimodal.synthesizeFromText(ascii, "doc_id", "text")
        .filter(col("modality") === "video")
      Multimodal.sampleFrames(media, everyN = 2)
        .select(col("media_id"), col("frame_idx"),
          octet_length(col("frame")).as("frame_len"),
          md5(decode(col("frame"), "UTF-8")).as("frame_md5"))
    },

    // Multimodal resize: image-modality payloads through the codec seam
    // (stub = dims header + 64-byte cap), meta re-stamped. The oracle
    // replays the output SHAPE (stamped dims + capped length); the byte
    // content is pinned by MultimodalSpec.
    GQuery(
      "q99_multimodal_resize",
      """SELECT doc_id AS media_id, 32 AS w, 16 AS h,
        |       (2 + least(octet_length(encode(text)), 64))::INT AS resized_len
        |FROM documents WHERE doc_id % 3 = 0""".stripMargin) { (s, dir) =>
      val media = Multimodal.synthesizeFromText(
          Tables.documents(s, dir), "doc_id", "text")
        .filter(col("modality") === "image")
      Multimodal.resize(media, 32, 16)
        .select(col("media_id"), col("meta.width").as("w"), col("meta.height").as("h"),
          octet_length(col("bytes")).as("resized_len"))
    },

    // REAL image decode: even-id docs carry a synthesized binary PPM (P6)
    // whose raster bytes follow the documented formula; JvmCodec parses the
    // actual format (header tokenizer + raster) and the query emits integer
    // per-channel sums. The oracle knows NOTHING about PPM — it replays the
    // raster formula from first principles, so a green row proves the
    // encode→real-decode round trip is lossless.
    GQuery(
      "q104_ppm_decode",
      """SELECT d.doc_id AS media_id, 16 AS width, 16 AS height,
        |       sum(CASE WHEN t.j % 3 = 0 THEN (d.doc_id * 2654435761 + t.j * 40503) % 256 ELSE 0 END)::BIGINT AS r_sum,
        |       sum(CASE WHEN t.j % 3 = 1 THEN (d.doc_id * 2654435761 + t.j * 40503) % 256 ELSE 0 END)::BIGINT AS g_sum,
        |       sum(CASE WHEN t.j % 3 = 2 THEN (d.doc_id * 2654435761 + t.j * 40503) % 256 ELSE 0 END)::BIGINT AS b_sum
        |FROM (SELECT doc_id FROM documents WHERE doc_id % 2 = 0) d
        |CROSS JOIN range(768) t(j)
        |GROUP BY 1""".stripMargin) { (s, dir) =>
      val ids = Tables.documents(s, dir)
        .filter(pmod(col("doc_id"), lit(2)) === 0).select("doc_id")
      Multimodal.imageStats(Multimodal.synthesizeReal(ids, "doc_id"))
    },

    // REAL audio decode: odd-id docs carry a synthesized PCM16-mono WAV
    // (sample rate varies per id so the value genuinely comes from the
    // RIFF fmt chunk); JvmCodec walks the chunk list and the query emits
    // integer sample sums the oracle replays from the generator formula.
    GQuery(
      "q105_wav_decode",
      """SELECT d.doc_id AS media_id,
        |       (8000 + (d.doc_id % 8) * 1000)::INT AS sample_rate,
        |       441 AS n_samples,
        |       sum((d.doc_id * 40503 + t.i * 69069) % 65536 - 32768)::BIGINT AS sum_samples,
        |       sum(abs((d.doc_id * 40503 + t.i * 69069) % 65536 - 32768))::BIGINT AS sum_abs
        |FROM (SELECT doc_id FROM documents WHERE doc_id % 2 = 1) d
        |CROSS JOIN range(441) t(i)
        |GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      val ids = Tables.documents(s, dir)
        .filter(pmod(col("doc_id"), lit(2)) === 1).select("doc_id")
      Multimodal.audioStats(Multimodal.synthesizeReal(ids, "doc_id"))
    },

    // SCENE-CUT signal over the concatenated-PPM videos: per consecutive
    // frame pair, the exact Σ|a−b| pixel-difference mass and the flag at
    // threshold 4560 (the formula rasters differ by a constant 239 mod 256
    // per byte — |diff| is 239 for ~17/256 of bytes and 17 otherwise, so
    // the pair mass concentrates near 144·31.7 ≈ 4560 and the median
    // threshold makes the flag vary per pair). The oracle
    // replays both frames' raster formulas and the abs-diff sum.
    GQuery(
      "q272_video_scene_cuts",
      """SELECT d.doc_id AS media_id, f.fi::INT AS frame_idx,
        |       sum(abs((d.doc_id * 2654435761 + f.fi * 7919 + t.j * 40503) % 256
        |             - (d.doc_id * 2654435761 + (f.fi - 1) * 7919 + t.j * 40503) % 256))::BIGINT
        |         AS diff_sum,
        |       sum(abs((d.doc_id * 2654435761 + f.fi * 7919 + t.j * 40503) % 256
        |             - (d.doc_id * 2654435761 + (f.fi - 1) * 7919 + t.j * 40503) % 256)) >= 4560
        |         AS is_cut
        |FROM (SELECT doc_id FROM documents WHERE doc_id % 3 = 0) d
        |CROSS JOIN range(1, 6) f(fi)
        |CROSS JOIN range(144) t(j)
        |GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      val ids = Tables.documents(s, dir)
        .filter(pmod(col("doc_id"), lit(3)) === 0).select("doc_id")
      Multimodal.frameDiffs(
        Multimodal.synthesizeVideoPpm(ids, "doc_id", frames = 6),
        cutThreshold = 4560L)
    },

    // ViT-style PATCH grid over the REAL-decoded raster: 16x16 PPM cut
    // into 8x8 tiles, per-tile exact channel sums — the patch-embedding
    // batch shape vision-language prep feeds downstream. Oracle = the
    // raster formula replayed per (pixel, channel) with the same
    // row/col/tile arithmetic.
    GQuery(
      "q271_image_patch_stats",
      """SELECT d.doc_id AS media_id,
        |       ((t.j // 3) // 16 // 8)::INT AS patch_row,
        |       (((t.j // 3) % 16) // 8)::INT AS patch_col,
        |       (count(*) // 3)::INT AS n_px,
        |       sum(CASE WHEN t.j % 3 = 0 THEN (d.doc_id * 2654435761 + t.j * 40503) % 256 ELSE 0 END)::BIGINT AS r_sum,
        |       sum(CASE WHEN t.j % 3 = 1 THEN (d.doc_id * 2654435761 + t.j * 40503) % 256 ELSE 0 END)::BIGINT AS g_sum,
        |       sum(CASE WHEN t.j % 3 = 2 THEN (d.doc_id * 2654435761 + t.j * 40503) % 256 ELSE 0 END)::BIGINT AS b_sum
        |FROM (SELECT doc_id FROM documents WHERE doc_id % 2 = 0) d
        |CROSS JOIN range(768) t(j)
        |GROUP BY 1, 2, 3""".stripMargin) { (s, dir) =>
      val ids = Tables.documents(s, dir)
        .filter(pmod(col("doc_id"), lit(2)) === 0).select("doc_id")
      Multimodal.imagePatchStats(
        Multimodal.synthesizeReal(ids, "doc_id"), patchW = 8, patchH = 8)
    },

    // Per-frame audio features over the REAL-decoded PCM stream: frame
    // energy (Σ s², exact long) and zero-crossing counts (the first
    // sample of a frame compares against the last of the previous — one
    // signal, frames are coordinates). The engine walks the RIFF chunks;
    // the oracle replays the generator formula per (frame, sample) from
    // first principles.
    GQuery(
      "q270_audio_frame_features",
      """SELECT d.doc_id AS media_id, (t.i // 100)::INT AS frame_idx,
        |       count(*)::INT AS n_samples,
        |       sum(((d.doc_id * 40503 + t.i * 69069) % 65536 - 32768)
        |         * ((d.doc_id * 40503 + t.i * 69069) % 65536 - 32768))::BIGINT AS energy,
        |       sum(CASE WHEN t.i > 0 AND
        |                  (((d.doc_id * 40503 + t.i * 69069) % 65536 - 32768 >= 0)
        |                   <> ((d.doc_id * 40503 + (t.i - 1) * 69069) % 65536 - 32768 >= 0))
        |                THEN 1 ELSE 0 END)::BIGINT AS zero_crossings
        |FROM (SELECT doc_id FROM documents WHERE doc_id % 2 = 1) d
        |CROSS JOIN range(441) t(i)
        |GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      val ids = Tables.documents(s, dir)
        .filter(pmod(col("doc_id"), lit(2)) === 1).select("doc_id")
      Multimodal.audioFrameFeatures(
        Multimodal.synthesizeReal(ids, "doc_id"), frameSize = 100)
    },

    // REAL BMP decode: 24bpp BITMAPINFOHEADER payloads (10x7 — row stride
    // 30 pads to 32, odd height exercises the bottom-up flip, BGR order the
    // channel swap). The oracle replays the LOGICAL raster formula; green
    // only if the encoder's padding/flip/swap and the decoder's inversions
    // cancel exactly.
    GQuery(
      "q112_bmp_decode",
      """SELECT d.doc_id AS media_id, 10 AS width, 7 AS height,
        |       sum(CASE WHEN t.j % 3 = 0 THEN (d.doc_id * 1103515245 + t.j * 12345) % 256 ELSE 0 END)::BIGINT AS r_sum,
        |       sum(CASE WHEN t.j % 3 = 1 THEN (d.doc_id * 1103515245 + t.j * 12345) % 256 ELSE 0 END)::BIGINT AS g_sum,
        |       sum(CASE WHEN t.j % 3 = 2 THEN (d.doc_id * 1103515245 + t.j * 12345) % 256 ELSE 0 END)::BIGINT AS b_sum
        |FROM (SELECT doc_id FROM documents WHERE doc_id % 3 = 1) d
        |CROSS JOIN range(210) t(j)
        |GROUP BY 1""".stripMargin) { (s, dir) =>
      val ids = Tables.documents(s, dir)
        .filter(pmod(col("doc_id"), lit(3)) === 1).select("doc_id")
      Multimodal.imageStats(Multimodal.synthesizeBmp(ids, "doc_id"))
    },

    // REAL PNG decode through the JDK's ImageIO (an actual third-party
    // codec, not hand-rolled): payloads are ImageIO-encoded PNGs of a
    // formula raster; the codec seam routes them through the ImageIO
    // reader; PNG losslessness means the oracle's formula replay matches
    // exactly.
    GQuery(
      "q113_png_decode",
      """SELECT d.doc_id AS media_id, 12 AS width, 5 AS height,
        |       sum(CASE WHEN t.j % 3 = 0 THEN (d.doc_id * 48271 + t.j * 16807) % 256 ELSE 0 END)::BIGINT AS r_sum,
        |       sum(CASE WHEN t.j % 3 = 1 THEN (d.doc_id * 48271 + t.j * 16807) % 256 ELSE 0 END)::BIGINT AS g_sum,
        |       sum(CASE WHEN t.j % 3 = 2 THEN (d.doc_id * 48271 + t.j * 16807) % 256 ELSE 0 END)::BIGINT AS b_sum
        |FROM (SELECT doc_id FROM documents WHERE doc_id % 4 = 3) d
        |CROSS JOIN range(180) t(j)
        |GROUP BY 1""".stripMargin) { (s, dir) =>
      val ids = Tables.documents(s, dir)
        .filter(pmod(col("doc_id"), lit(4)) === 3).select("doc_id")
      Multimodal.imageStats(Multimodal.synthesizePng(ids, "doc_id"))
    },

    // REAL image resize: 16x16 PPM payloads through JvmCodec's
    // nearest-neighbor resize to 4x4, then really decoded. The oracle
    // replays the floor-mapped source-pixel formula (target (x,y) reads
    // source (4x, 4y)) — green only if the whole decode->resample->
    // re-encode->decode chain is exact. Complements q99, which pins the
    // STUB codec's shape semantics.
    GQuery(
      "q114_ppm_resize_real",
      """SELECT d.doc_id AS media_id, 4 AS width, 4 AS height,
        |       sum(CASE WHEN c.c = 0 THEN (d.doc_id * 2654435761 + (3*(y.y*4*16 + x.x*4) + c.c) * 40503) % 256 ELSE 0 END)::BIGINT AS r_sum,
        |       sum(CASE WHEN c.c = 1 THEN (d.doc_id * 2654435761 + (3*(y.y*4*16 + x.x*4) + c.c) * 40503) % 256 ELSE 0 END)::BIGINT AS g_sum,
        |       sum(CASE WHEN c.c = 2 THEN (d.doc_id * 2654435761 + (3*(y.y*4*16 + x.x*4) + c.c) * 40503) % 256 ELSE 0 END)::BIGINT AS b_sum
        |FROM (SELECT doc_id FROM documents WHERE doc_id % 2 = 0) d
        |CROSS JOIN range(4) x(x) CROSS JOIN range(4) y(y) CROSS JOIN range(3) c(c)
        |GROUP BY 1""".stripMargin) { (s, dir) =>
      val ids = Tables.documents(s, dir)
        .filter(pmod(col("doc_id"), lit(2)) === 0).select("doc_id")
      val media = Multimodal.synthesizeReal(ids, "doc_id") // 16x16 PPMs
      Multimodal.imageStats(
        Multimodal.resize(media, 4, 4, MediaCodecs.JvmCodec))
    },

    // REAL video frame extraction: payloads are concatenated binary PPMs
    // (an MJPEG-style raster stream); JvmCodec splits on parsed frame
    // boundaries, every 2nd frame kept, and each kept frame is then REALLY
    // decoded to per-channel sums. The oracle replays the per-frame raster
    // formula — green only if boundary detection AND frame decode are both
    // exact.
    GQuery(
      "q108_ppm_video_frames",
      """SELECT (d.doc_id * 16 + f.fi)::BIGINT AS frame_key, 8 AS width, 6 AS height,
        |       sum(CASE WHEN t.j % 3 = 0 THEN (d.doc_id * 2654435761 + f.fi * 7919 + t.j * 40503) % 256 ELSE 0 END)::BIGINT AS r_sum,
        |       sum(CASE WHEN t.j % 3 = 1 THEN (d.doc_id * 2654435761 + f.fi * 7919 + t.j * 40503) % 256 ELSE 0 END)::BIGINT AS g_sum,
        |       sum(CASE WHEN t.j % 3 = 2 THEN (d.doc_id * 2654435761 + f.fi * 7919 + t.j * 40503) % 256 ELSE 0 END)::BIGINT AS b_sum
        |FROM (SELECT doc_id FROM documents WHERE doc_id % 3 = 0) d
        |CROSS JOIN (VALUES (0), (2), (4)) f(fi)
        |CROSS JOIN range(144) t(j)
        |GROUP BY 1""".stripMargin) { (s, dir) =>
      val ids = Tables.documents(s, dir)
        .filter(pmod(col("doc_id"), lit(3)) === 0).select("doc_id")
      val media = Multimodal.synthesizeVideoPpm(ids, "doc_id", frames = 6)
      val kept = Multimodal.sampleFrames(media, everyN = 2, MediaCodecs.JvmCodec)
      // frame_idx indexes the KEPT sequence; original index = frame_idx * 2
      Multimodal.imageStats(kept.select(
          (col("media_id") * 16 + col("frame_idx") * 2).as("media_id"),
          col("frame").as("bytes")))
        .withColumnRenamed("media_id", "frame_key")
    },

    // REAL audio frame extraction: 2500-sample WAVs split into 1024-sample
    // windows re-encoded as standalone WAVs (every 2nd kept: windows 0 and
    // 2), each then REALLY decoded. The oracle replays the sample formula
    // over each window's index range — green only if windowing, WAV
    // re-encode and decode all align sample-exactly.
    GQuery(
      "q115_wav_frames",
      """SELECT (d.doc_id * 16 + f.fi)::BIGINT AS frame_key,
        |       (8000 + (d.doc_id % 8) * 1000)::INT AS sample_rate,
        |       count(*)::INT AS n_samples,
        |       sum((d.doc_id * 40503 + (f.fi*1024 + t.i0) * 69069) % 65536 - 32768)::BIGINT AS sum_samples,
        |       sum(abs((d.doc_id * 40503 + (f.fi*1024 + t.i0) * 69069) % 65536 - 32768))::BIGINT AS sum_abs
        |FROM (SELECT doc_id FROM documents WHERE doc_id % 2 = 1) d
        |CROSS JOIN (VALUES (0), (2)) f(fi)
        |CROSS JOIN range(1024) t(i0)
        |WHERE f.fi * 1024 + t.i0 < 2500
        |GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      val ids = Tables.documents(s, dir)
        .filter(pmod(col("doc_id"), lit(2)) === 1).select("doc_id")
      val media = Multimodal.synthesizeReal(ids, "doc_id", audioSamples = 2500)
      val kept = Multimodal.sampleFrames(media, everyN = 2, MediaCodecs.JvmCodec)
      Multimodal.audioStats(kept.select(
          (col("media_id") * 16 + col("frame_idx") * 2).as("media_id"),
          col("frame").as("bytes")))
        .withColumnRenamed("media_id", "frame_key")
    },

    // Token-window chunking (training-sequence prep): 32-token windows at
    // stride 24 (overlap 8). The oracle replays the whitespace tokenization
    // and slice arithmetic; md5 of the joined chunk pins the exact content
    // of every window without hauling the text through the compare.
    GQuery(
      "q106_chunk_text",
      """WITH t AS (SELECT doc_id,
        |                  list_filter(string_split(text, ' '), x -> x != '') AS toks
        |           FROM documents),
        |i AS (SELECT doc_id, toks,
        |             unnest(range(greatest(0, (len(toks) - 1 - 8) // 24) + 1)) AS ci
        |      FROM t WHERE len(toks) > 0)
        |SELECT doc_id, ci::INT AS chunk_idx,
        |       (least(len(toks), ci*24 + 32) - ci*24)::INT AS n_tokens,
        |       md5(array_to_string(toks[(ci*24 + 1):least(len(toks), ci*24 + 32)], ' ')) AS chunk_md5
        |FROM i""".stripMargin) { (s, dir) =>
      TextFunctions.chunkByTokens(Tables.documents(s, dir),
          "doc_id", "text", maxTokens = 32, overlap = 8)
        .select(col("doc_id"), col("chunk_idx"), col("n_tokens"),
          md5(col("chunk")).as("chunk_md5"))
    },

    // Gopher-style quality rules: every flag recomputed by the oracle from
    // the same token list (count/word-length windows, symbol ratio, alpha
    // ratio, distinct-stopword floor) — boolean parity per document.
    GQuery(
      "q107_gopher_rules",
      """WITH t AS (SELECT doc_id, text,
        |                  list_filter(string_split(text, ' '), x -> x != '') AS toks
        |           FROM documents),
        |m AS (SELECT doc_id, len(toks) AS n,
        |             CASE WHEN len(toks) = 0 THEN 0.0
        |                  ELSE list_sum(list_transform(toks, x -> length(x)))::DOUBLE / len(toks)
        |             END AS mwl,
        |             len(regexp_extract_all(text, '#|\.\.\.')) AS syms,
        |             len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]'))) AS alpha_words,
        |             len(list_filter(['the','be','to','of','and','that','have','with'],
        |                             s -> list_contains(toks, s))) AS stop_hits
        |      FROM t)
        |SELECT doc_id, n::INT AS n_words, round(mwl, 6) AS mean_word_len,
        |       (n BETWEEN 50 AND 100000) AS word_count_ok,
        |       (mwl BETWEEN 3.0 AND 10.0) AS word_len_ok,
        |       (syms::DOUBLE / greatest(n, 1) <= 0.1) AS symbol_ok,
        |       (alpha_words::DOUBLE / greatest(n, 1) >= 0.8) AS alpha_ok,
        |       (stop_hits >= 2) AS stop_ok,
        |       ((n BETWEEN 50 AND 100000) AND (mwl BETWEEN 3.0 AND 10.0)
        |        AND (syms::DOUBLE / greatest(n, 1) <= 0.1)
        |        AND (alpha_words::DOUBLE / greatest(n, 1) >= 0.8)
        |        AND (stop_hits >= 2)) AS passes
        |FROM m""".stripMargin) { (s, dir) =>
      TextFunctions.gopherFlags(Tables.documents(s, dir), "doc_id", "text")
    },

    // PII redaction: the corpus text is augmented with a synthetic email /
    // IPv4 / phone per row (both engines build the identical string), then
    // redacted with the documented RE2-compatible patterns. The md5 of the
    // redacted text is a byte-for-byte regex-parity proof between the JVM
    // regex engine and the oracle's RE2 — the operator IS the regex.
    GQuery(
      "q109_pii_redact",
      """WITH t AS (SELECT doc_id,
        |  text || ' contact user' || doc_id || '@example.com from 10.0.' ||
        |  (doc_id % 256) || '.1 call +1555' || lpad(doc_id::VARCHAR, 7, '0') AS aug
        |  FROM documents)
        |SELECT doc_id,
        |  len(regexp_extract_all(aug, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
        |  len(regexp_extract_all(aug, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ips,
        |  md5(regexp_replace(regexp_replace(regexp_replace(aug,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |    '\+\d{7,15}', '<PHONE>', 'g')) AS redacted_md5
        |FROM t""".stripMargin) { (s, dir) =>
      val aug = concat(col("text"),
        lit(" contact user"), col("doc_id"), lit("@example.com from 10.0."),
        pmod(col("doc_id"), lit(256)), lit(".1 call +1555"),
        lpad(col("doc_id").cast("string"), 7, "0"))
      Tables.documents(s, dir).select(col("doc_id"),
        TextFunctions.piiCount(aug, TextFunctions.emailPattern).as("n_emails"),
        TextFunctions.piiCount(aug, TextFunctions.ipv4Pattern).as("n_ips"),
        md5(TextFunctions.redactPii(aug)).as("redacted_md5"))
    },

    // Unigram-LM surprisal (corpus-relative quality signal): the oracle
    // rebuilds the whole language model — per-doc token multiplicities,
    // vocabulary counts, corpus total — and the weighted mean surprisal
    // from first principles.
    GQuery(
      "q123_unigram_surprisal",
      """WITH toks AS (SELECT doc_id,
        |                     unnest(list_filter(string_split(lower(text), ' '), x -> x != '')) AS tok
        |              FROM documents),
        |m AS (SELECT doc_id, tok, count(*)::DOUBLE AS k FROM toks GROUP BY doc_id, tok),
        |cnt AS (SELECT tok, sum(k) AS c FROM m GROUP BY tok),
        |tot AS (SELECT sum(c) AS t FROM cnt)
        |SELECT doc_id, round(sum(k * -ln(c / t)) / sum(k), 6) AS surprisal
        |FROM m JOIN cnt USING (tok) CROSS JOIN tot
        |GROUP BY doc_id""".stripMargin) { (s, dir) =>
      graft.operators.UnigramLm.surprisal(Tables.documents(s, dir), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
    },

    // Unicode NFC canonicalization ahead of hash-keyed dedup: every row's
    // text is decorated with a DECOMPOSED sequence (e + combining acute),
    // so the md5s only match if both engines perform real canonical
    // composition — Spark's java.text.Normalizer vs DuckDB's
    // nfc_normalize, proven byte-equal on every document.
    GQuery(
      "q146_nfc_normalize",
      """SELECT doc_id,
        |       md5(nfc_normalize('e' || chr(769) || ' ' || coalesce(text, ''))) AS nfc_md5,
        |       length(nfc_normalize('e' || chr(769) || ' ' || coalesce(text, '')))::BIGINT AS n_chars
        |FROM documents""".stripMargin) { (s, dir) =>
      val decorated = Tables.documents(s, dir)
        .select(col("doc_id"), // the literal is DECOMPOSED e + U+0301
          concat(lit("é "), coalesce(col("text"), lit(""))).as("text"))
      graft.operators.TextNormalize.nfc(decorated, "doc_id", "text")
        .select(col("doc_id"), md5(col("text_nfc")).as("nfc_md5"),
          length(col("text_nfc")).cast("long").as("n_chars"))
    },

    // Bigram conditional surprisal (the sharper local-coherence signal
    // beside q123's unigram): mean −ln p(w|prev) with p from the corpus'
    // own transition counts. The oracle rebuilds the transition LM —
    // positional bigrams, per-doc multiplicities, bigram + context
    // totals — from first principles.
    GQuery(
      "q144_bigram_surprisal",
      """WITH t AS (SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x != '') AS toks
        |           FROM documents),
        |bg AS (SELECT doc_id, toks[i+1] AS l, toks[i+2] AS r
        |       FROM (SELECT doc_id, toks, unnest(range(len(toks) - 1)) AS i
        |             FROM t WHERE len(toks) >= 2)),
        |m AS (SELECT doc_id, l, r, count(*)::DOUBLE AS k FROM bg GROUP BY 1, 2, 3),
        |c AS (SELECT l, r, sum(k) AS clr FROM m GROUP BY 1, 2),
        |cl AS (SELECT l, sum(clr) AS cltot FROM c GROUP BY 1)
        |SELECT doc_id, round(sum(k * -ln(clr / cltot)) / sum(k), 6) AS bigram_surprisal
        |FROM m JOIN c USING (l, r) JOIN cl USING (l)
        |GROUP BY doc_id""".stripMargin) { (s, dir) =>
      graft.operators.UnigramLm
        .bigramSurprisal(Tables.documents(s, dir), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
    },

    // Interpolated Kneser-Ney bigram surprisal — the KenLM-style smoothing
    // CCNet's perplexity filter uses: absolute discount d=0.75, discounted
    // mass re-spent on the continuation probability N1+(.w)/|types|. The
    // oracle rebuilds every statistic (bigram counts, context totals,
    // follower/predecessor TYPE counts, the type total) and the full
    // interpolation formula from first principles.
    GQuery(
      "q152_kneser_ney_surprisal",
      """WITH t AS (SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x != '') AS toks
        |           FROM documents),
        |bg AS (SELECT doc_id, toks[i+1] AS l, toks[i+2] AS r
        |       FROM (SELECT doc_id, toks, unnest(range(len(toks) - 1)) AS i
        |             FROM t WHERE len(toks) >= 2)),
        |m AS (SELECT doc_id, l, r, count(*)::DOUBLE AS k FROM bg GROUP BY 1, 2, 3),
        |c AS (SELECT l, r, sum(k) AS clr FROM m GROUP BY 1, 2),
        |cl AS (SELECT l, sum(clr) AS cltot, count(*)::DOUBLE AS nfollow FROM c GROUP BY 1),
        |cont AS (SELECT r, count(*)::DOUBLE AS nprec FROM c GROUP BY 1),
        |tot AS (SELECT count(*)::DOUBLE AS ntypes FROM c)
        |SELECT doc_id,
        |       round(sum(k * -ln(greatest(clr - 0.75, 0) / cltot
        |                         + (0.75 * nfollow / cltot) * (nprec / ntypes)))
        |             / sum(k), 6) AS kn_surprisal
        |FROM m JOIN c USING (l, r) JOIN cl USING (l) JOIN cont USING (r)
        |CROSS JOIN tot
        |GROUP BY doc_id""".stripMargin) { (s, dir) =>
      graft.operators.UnigramLm
        .kneserNeySurprisal(Tables.documents(s, dir), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
    },

    // Interpolated Kneser-Ney TRIGRAM surprisal (the order a CCNet-style
    // perplexity filter actually ships; q152 is the bigram). The oracle
    // rebuilds the full three-level interpolation — trigram counts,
    // context totals, and every continuation TYPE count (distinct-u,
    // distinct-(u,w), distinct-follower, bigram-type totals) — from first
    // principles over the same positional trigrams. All six statistics are
    // WINDOW aggregates over the single trigram-type relation c3, not a
    // seven-way join of per-key CTEs: the join form handed DuckDB's
    // join-order optimizer two relations with no shared key (nv keyed v,
    // n1w keyed w) and its chosen order cross-producted them — ~110 GB of
    // spill at sf0.01 before filling the disk. Window form: 0.1 s.
    GQuery(
      "q280_kn_trigram_surprisal",
      """WITH t AS (SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x != '') AS toks
        |           FROM documents),
        |tg AS (SELECT doc_id, toks[i+1] AS u, toks[i+2] AS v, toks[i+3] AS w
        |       FROM (SELECT doc_id, toks, unnest(range(len(toks) - 2)) AS i
        |             FROM t WHERE len(toks) >= 3)),
        |m AS (SELECT doc_id, u, v, w, count(*)::DOUBLE AS k FROM tg GROUP BY 1, 2, 3, 4),
        |c3 AS (SELECT u, v, w, sum(k) AS c3 FROM m GROUP BY 1, 2, 3),
        |p3 AS (SELECT u, v, w, c3,
        |              sum(c3) OVER (PARTITION BY u, v) AS cuvtot,
        |              count(*) OVER (PARTITION BY u, v)::DOUBLE AS nfollow3,
        |              count(*) OVER (PARTITION BY v, w)::DOUBLE AS contvw,
        |              count(*) OVER (PARTITION BY v)::DOUBLE AS nmid,
        |              count(DISTINCT w) OVER (PARTITION BY v)::DOUBLE AS nfollow2,
        |              count(DISTINCT v) OVER (PARTITION BY w)::DOUBLE AS nprec
        |       FROM c3),
        |tot AS (SELECT count(*)::DOUBLE AS ntypes
        |        FROM (SELECT DISTINCT v, w FROM c3))
        |SELECT doc_id,
        |       round(sum(k * -ln(
        |                 greatest(c3 - 0.75, 0) / cuvtot
        |                 + (0.75 * nfollow3 / cuvtot)
        |                   * (greatest(contvw - 0.75, 0) / nmid
        |                      + (0.75 * nfollow2 / nmid) * (nprec / ntypes))))
        |             / sum(k), 6) AS kn3_surprisal
        |FROM m JOIN p3 USING (u, v, w) CROSS JOIN tot
        |GROUP BY doc_id""".stripMargin) { (s, dir) =>
      graft.operators.UnigramLm
        .kneserNeyTrigramSurprisal(Tables.documents(s, dir), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
    },

    // CCNet-style perplexity bucketing: every doc into one of 10 equal-size
    // quantile buckets by unigram surprisal — head bucket = boilerplate,
    // tail = garbage vocabulary. Spark side computes ANSI ntile WITHOUT the
    // single-partition window (Ranking two-pass global rank); the oracle is
    // DuckDB's real ntile over the same (rounded) surprisal order, so the
    // bucket arithmetic is proven against the ANSI definition. The order key
    // is (rounded surprisal, doc_id) — a total order whose sort keys are
    // byte-identical in both engines because q123's hash already proves the
    // rounded surprisal values match.
    GQuery(
      "q132_surprisal_buckets",
      """WITH toks AS (SELECT doc_id,
        |                     unnest(list_filter(string_split(lower(text), ' '), x -> x != '')) AS tok
        |              FROM documents),
        |m AS (SELECT doc_id, tok, count(*)::DOUBLE AS k FROM toks GROUP BY doc_id, tok),
        |cnt AS (SELECT tok, sum(k) AS c FROM m GROUP BY tok),
        |tot AS (SELECT sum(c) AS t FROM cnt),
        |s AS (SELECT doc_id, round(sum(k * -ln(c / t)) / sum(k), 6) AS surprisal
        |      FROM m JOIN cnt USING (tok) CROSS JOIN tot
        |      GROUP BY doc_id)
        |SELECT doc_id, surprisal,
        |       ntile(10) OVER (ORDER BY surprisal, doc_id) AS bucket
        |FROM s""".stripMargin) { (s, dir) =>
      val scores = graft.operators.UnigramLm
        .surprisal(Tables.documents(s, dir), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
      graft.operators.Ranking.ntileBuckets(
        scores, Seq("surprisal", "doc_id"), k = 10)
    },

    // Curriculum schedule: 4 difficulty stages by ascending unigram-LM
    // surprisal (easy → hard), each stage internally shuffled by a
    // deterministic seeded hash — the easy-to-hard training order
    // curriculum-learning recipes consume. The stage cut reuses the q132
    // arithmetic-ntile machinery (one range shuffle, no single-partition
    // window); the shuffle key is a pure per-row projection, so an epoch
    // reshuffle is a salt change, not a data move. The oracle replays the
    // LM, the ANSI ntile and the md5 key.
    GQuery(
      "q171_curriculum_schedule",
      """WITH toks AS (SELECT doc_id,
        |                     unnest(list_filter(string_split(lower(text), ' '), x -> x != '')) AS tok
        |              FROM documents),
        |m AS (SELECT doc_id, tok, count(*)::DOUBLE AS k FROM toks GROUP BY doc_id, tok),
        |cnt AS (SELECT tok, sum(k) AS c FROM m GROUP BY tok),
        |tot AS (SELECT sum(c) AS t FROM cnt),
        |s AS (SELECT doc_id, round(sum(k * -ln(c / t)) / sum(k), 6) AS surprisal
        |      FROM m JOIN cnt USING (tok) CROSS JOIN tot
        |      GROUP BY doc_id)
        |SELECT doc_id, surprisal,
        |       ntile(4) OVER (ORDER BY surprisal, doc_id) AS stage,
        |       ('0x' || substr(md5(doc_id::VARCHAR || ':curriculum'), 1, 15))::BIGINT % 1000000
        |         AS shuffle_key
        |FROM s""".stripMargin) { (s, dir) =>
      val scores = graft.operators.UnigramLm
        .surprisal(Tables.documents(s, dir), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
      graft.operators.Sampling.curriculumSchedule(
        scores, "doc_id", "surprisal", k = 4)
    },

    // Vocabulary building (exact heavy hitters): the top-100 corpus tokens
    // by frequency with a deterministic (count desc, token asc) tie rule —
    // the precursor to tokenizer training. Map-side-combined aggregate +
    // TakeOrdered; the oracle recounts from scratch.
    // TF-IDF sparse document vectors (the corpus-wide vectorization BM25 is
    // the query-time form of): smoothed idf ln((1+N)/(1+df))+1, df-pruned
    // vocabulary. The oracle rebuilds tf, df, N and the formula from
    // scratch.
    GQuery(
      "q130_tfidf",
      """WITH toks AS (SELECT doc_id,
        |                     unnest(list_filter(string_split(lower(text), ' '), x -> x != '')) AS term
        |              FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1 HAVING count(*) >= 5),
        |n AS (SELECT count(*) AS n_docs FROM documents)
        |SELECT doc_id, term, tf,
        |       round(tf * (ln((1 + n_docs)::DOUBLE / (1 + df)::DOUBLE) + 1), 6) AS tfidf
        |FROM tf JOIN df USING (term) CROSS JOIN n""".stripMargin) { (s, dir) =>
      graft.operators.TfIdf.tfidf(Tables.documents(s, dir), "doc_id", "text",
        minDf = 5)
    },

    // Feature hashing (hashing-trick vectorizer): md5-60 buckets mod 4096,
    // no vocabulary pass — the oracle recomputes every bucket from the
    // same engine-neutral hash.
    GQuery(
      "q131_hashed_tf",
      """WITH toks AS (SELECT doc_id,
        |                     unnest(list_filter(string_split(lower(text), ' '), x -> x != '')) AS term
        |              FROM documents)
        |SELECT doc_id,
        |       ('0x' || substr(md5(term), 1, 15))::BIGINT % 4096 AS bucket,
        |       count(*) AS cnt
        |FROM toks GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      graft.operators.TfIdf.hashedTf(Tables.documents(s, dir), "doc_id", "text",
        nBuckets = 4096)
    },

    // BPE tokenizer training, step by step. q136 pins the initial pair
    // statistics (top-20 character pairs weighted by word count, with the
    // byte-order tie rule); q137 pins two full training iterations — the
    // oracle replays each merge as a left-to-right `replace` on the
    // space-joined segmentation, which IS greedy BPE because pieces never
    // contain spaces; q138 pins the encode side (per-doc piece counts
    // after the two learned merges). Deeper merge sequences are spec
    // territory (BpeSpec: 30-merge parity with a sequential reference).
    GQuery(
      "q136_bpe_pairs",
      """WITH w AS (SELECT unnest(list_filter(string_split(lower(text), ' '), x -> x != '')) AS word
        |           FROM documents),
        |wc AS (SELECT word, count(*) AS cnt FROM w GROUP BY word),
        |pc AS (SELECT substr(word, i+1, 1) AS l, substr(word, i+2, 1) AS r, sum(cnt)::BIGINT AS cnt
        |       FROM (SELECT word, cnt, unnest(range(length(word) - 1)) AS i FROM wc)
        |       GROUP BY 1, 2)
        |SELECT l AS merge_left, r AS merge_right, cnt AS pair_cnt
        |FROM pc ORDER BY cnt DESC, l, r LIMIT 20""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      graft.operators.Bpe.wordCounts(docs, "text")
        .select(col("cnt"), explode(expr(
          "transform(sequence(1, char_length(word) - 1), " +
            "i -> struct(substring(word, i, 1) AS l, substring(word, i + 1, 1) AS r))"))
          .as("p"))
        .groupBy(col("p.l").as("merge_left"), col("p.r").as("merge_right"))
        .agg(sum(col("cnt")).as("pair_cnt"))
        .orderBy(col("pair_cnt").desc, col("merge_left"), col("merge_right"))
        .limit(20)
    },

    GQuery(
      "q137_bpe_train",
      """WITH w AS (SELECT unnest(list_filter(string_split(lower(text), ' '), x -> x != '')) AS word
        |           FROM documents),
        |wc AS (SELECT word, count(*) AS cnt FROM w GROUP BY word),
        |seg0 AS (SELECT cnt,
        |                array_to_string(list_transform(range(1, length(word)+1),
        |                                               i -> substr(word, i, 1)), ' ') AS seg
        |         FROM wc),
        |pc0 AS (SELECT s[i+1] AS l, s[i+2] AS r, sum(cnt)::BIGINT AS cnt
        |        FROM (SELECT cnt, s, unnest(range(len(s) - 1)) AS i
        |              FROM (SELECT cnt, string_split(seg, ' ') AS s FROM seg0))
        |        GROUP BY 1, 2),
        |m1 AS (SELECT 1::BIGINT AS merge_rank, l, r, cnt FROM pc0
        |       ORDER BY cnt DESC, l, r LIMIT 1),
        |seg1 AS (SELECT seg0.cnt,
        |                replace(seg0.seg, m1.l || ' ' || m1.r, m1.l || m1.r) AS seg
        |         FROM seg0 CROSS JOIN m1),
        |pc1 AS (SELECT s[i+1] AS l, s[i+2] AS r, sum(cnt)::BIGINT AS cnt
        |        FROM (SELECT cnt, s, unnest(range(len(s) - 1)) AS i
        |              FROM (SELECT cnt, string_split(seg, ' ') AS s FROM seg1))
        |        GROUP BY 1, 2),
        |m2 AS (SELECT 2::BIGINT AS merge_rank, l, r, cnt FROM pc1
        |       ORDER BY cnt DESC, l, r LIMIT 1)
        |SELECT merge_rank, l AS merge_left, r AS merge_right, cnt AS pair_cnt FROM m1
        |UNION ALL
        |SELECT merge_rank, l AS merge_left, r AS merge_right, cnt AS pair_cnt FROM m2""".stripMargin) { (s, dir) =>
      graft.operators.Bpe.train(Tables.documents(s, dir), "text", numMerges = 2)
    },

    // Merge 1 runs over single-character pieces, where a bare string
    // replace IS the greedy piece-level merge. Merge 2 runs over
    // multi-character pieces, where a bare replace could match a merged
    // piece's suffix across a piece boundary ('th e' -> 'the' for the
    // merge (h,e)); seg2 therefore folds the piece LIST left-to-right with
    // a boundary-guarded list_reduce — exactly Bpe.applyMerge.
    GQuery(
      "q138_bpe_encode",
      """WITH w AS (SELECT unnest(list_filter(string_split(lower(text), ' '), x -> x != '')) AS word
        |           FROM documents),
        |wc AS (SELECT word, count(*) AS cnt FROM w GROUP BY word),
        |seg0 AS (SELECT word, cnt,
        |                array_to_string(list_transform(range(1, length(word)+1),
        |                                               i -> substr(word, i, 1)), ' ') AS seg
        |         FROM wc),
        |pc0 AS (SELECT s[i+1] AS l, s[i+2] AS r, sum(cnt)::BIGINT AS cnt
        |        FROM (SELECT cnt, s, unnest(range(len(s) - 1)) AS i
        |              FROM (SELECT cnt, string_split(seg, ' ') AS s FROM seg0))
        |        GROUP BY 1, 2),
        |m1 AS (SELECT l, r FROM pc0 ORDER BY cnt DESC, l, r LIMIT 1),
        |seg1 AS (SELECT word, seg0.cnt,
        |                replace(seg0.seg, m1.l || ' ' || m1.r, m1.l || m1.r) AS seg
        |         FROM seg0 CROSS JOIN m1),
        |pc1 AS (SELECT s[i+1] AS l, s[i+2] AS r, sum(cnt)::BIGINT AS cnt
        |        FROM (SELECT cnt, s, unnest(range(len(s) - 1)) AS i
        |              FROM (SELECT cnt, string_split(seg, ' ') AS s FROM seg1))
        |        GROUP BY 1, 2),
        |m2 AS (SELECT l, r FROM pc1 ORDER BY cnt DESC, l, r LIMIT 1),
        |seg2 AS (SELECT word, seg1.cnt,
        |                list_reduce(string_split(seg1.seg, ' '),
        |                  (acc, x) -> CASE WHEN x = m2.r AND
        |                                   (acc = m2.l OR ends_with(acc, ' ' || m2.l))
        |                              THEN substr(acc, 1, length(acc) - length(m2.l))
        |                                   || m2.l || x
        |                              ELSE acc || ' ' || x END) AS seg
        |         FROM seg1 CROSS JOIN m2),
        |pieces AS (SELECT word, len(string_split(seg, ' '))::BIGINT AS n_pieces FROM seg2),
        |dw AS (SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '), x -> x != '')) AS word
        |       FROM documents)
        |SELECT doc_id, sum(n_pieces)::BIGINT AS n_bpe_tokens
        |FROM dw JOIN pieces USING (word) GROUP BY doc_id""".stripMargin) { (s, dir) =>
      graft.operators.Bpe.encodeCounts(Tables.documents(s, dir), "doc_id", "text",
        numMerges = 2)
    },

    GQuery(
      "q127_vocab_topk",
      """WITH toks AS (SELECT unnest(list_filter(string_split(lower(text), ' '), x -> x != '')) AS tok
        |              FROM documents)
        |SELECT tok, count(*) AS cnt FROM toks
        |GROUP BY tok ORDER BY cnt DESC, tok LIMIT 100""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir)
        .select(explode(TextFunctions.tokens(lower(col("text")))).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("tok"))
        .limit(100)
    },

    // BPE round trip: decode(encode(corpus)) must reproduce the
    // space-stripped lowered corpus EXACTLY — the id stream carries no
    // word boundary, so concatenated pieces equal concatenated words. A
    // correct round trip erases the tokenizer; any id-mapping bug in
    // encode or decode breaks the identity (vocab-id canonicality itself
    // is pinned separately by q148's SQL-replayed ids).
    GQuery(
      "q159_bpe_roundtrip",
      """SELECT doc_id,
        |       array_to_string(list_filter(string_split(lower(text), ' '), x -> x != ''), '') AS decoded
        |FROM documents""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val model = graft.operators.Bpe.fit(docs, "text", numMerges = 20)
      graft.operators.Bpe.decode(
        graft.operators.Bpe.encode(docs, "doc_id", "text", model),
        "doc_id", "tok_ids", model)
    },

    // Vocabulary coverage curve: what fraction of corpus TOKEN MASS the
    // top-k types cover, for a few k — the vocab-sizing diagnostic. Ranks
    // come from the two-pass range-partitioned globalRank (one shuffle, no
    // single-partition window); coverage is a conditional aggregate per
    // threshold. The oracle replays with a SQL window rank.
    GQuery(
      "q160_vocab_coverage",
      """WITH tok AS (SELECT unnest(list_filter(string_split(lower(text), ' '), x -> x != '')) AS t
        |             FROM documents),
        |wc AS (SELECT t, count(*) AS cnt FROM tok GROUP BY t),
        |r AS (SELECT cnt, row_number() OVER (ORDER BY cnt DESC, t) AS rk FROM wc),
        |tot AS (SELECT sum(cnt) AS tt FROM wc)
        |SELECT k, round(sum(CASE WHEN rk <= k THEN cnt ELSE 0 END) / max(tt), 6) AS coverage
        |FROM r CROSS JOIN tot
        |     CROSS JOIN (SELECT unnest([5, 10, 20, 40]) AS k) ks
        |GROUP BY k""".stripMargin) { (s, dir) =>
      import s.implicits._
      val wc = Tables.documents(s, dir)
        .select(explode(TextFunctions.tokens(lower(col("text")))).as("t"))
        .groupBy("t").agg(count(lit(1)).as("cnt"))
        .withColumn("nc", -col("cnt"))
      val ranked = graft.operators.Ranking.globalRank(wc, Seq("nc", "t"), rankCol = "rk")
      val tot = wc.agg(sum(col("cnt")).as("tt"))
      val ks = Seq(5L, 10L, 20L, 40L).toDF("k")
      ranked.crossJoin(broadcast(tot)).crossJoin(broadcast(ks))
        .groupBy("k")
        .agg(round(sum(when(col("rk") <= col("k"), col("cnt")).otherwise(0L)) /
          max(col("tt")), 6).as("coverage"))
    },

    // Rank-average quality ensemble: two signals with unrelated units
    // (document length; lexical diversity = distinct-token ratio) each
    // percent_rank'd globally, then averaged — the distribution-free way
    // to combine filter signals (a z-score blend would let the heavy-
    // tailed length dominate). Scale shape: one range shuffle per signal
    // via Ranking's two-pass rank (no single-partition window), and the
    // diversity signal is a single doc-keyed aggregate. The oracle
    // replays both window ranks and the blend arithmetic.
    GQuery(
      "q168_quality_rank_ensemble",
      s"""WITH dv AS (SELECT doc_id,
         |              round(coalesce(count(DISTINCT t)::DOUBLE / nullif(count(t), 0), 0.0), 6) AS ttr
         |            FROM (SELECT doc_id, unnest($duckToks) AS t FROM documents)
         |            GROUP BY doc_id),
         |s AS (SELECT d.doc_id, d.n_chars, coalesce(dv.ttr, 0.0) AS ttr
         |      FROM documents d LEFT JOIN dv USING (doc_id)),
         |p AS (SELECT doc_id, n_chars, ttr,
         |             round(percent_rank() OVER (ORDER BY n_chars, doc_id), 6) AS pr_n_chars,
         |             round(percent_rank() OVER (ORDER BY ttr, doc_id), 6) AS pr_ttr
         |      FROM s)
         |SELECT doc_id, pr_n_chars, pr_ttr,
         |       (pr_n_chars + pr_ttr) / 2.0 AS quality_ensemble
         |FROM p""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val dv = docs
        .select(col("doc_id"), explode(TextFunctions.tokens(lower(col("text")))).as("t"))
        .groupBy("doc_id")
        .agg(round(countDistinct(col("t")).cast("double") / count(col("t")), 6).as("ttr"))
      val sig = docs.select(col("doc_id"), col("n_chars"))
        .join(dv, Seq("doc_id"), "left")
        .na.fill(0.0, Seq("ttr"))
      graft.operators.Ranking
        .rankEnsemble(sig, Seq("n_chars", "ttr"), "doc_id")
        .select("doc_id", "pr_n_chars", "pr_ttr", "quality_ensemble")
    },

    // Per-GROUP percent rank without a per-group window: score-normalizing
    // WITHIN a language (so a verbose language's long docs don't crowd out
    // a terse one's in a global cut) is `percent_rank() OVER (PARTITION BY
    // lang ...)` — which at corpus scale drags each language through ONE
    // task. groupedPercentRank instead takes one global two-pass rank over
    // the concatenated (lang, signal, id) order plus a broadcast per-group
    // offset/count — the in-group rank is pure arithmetic. The oracle IS
    // the partitioned window definition.
    GQuery(
      "q173_grouped_percent_rank",
      """SELECT doc_id, lang,
        |       round(percent_rank() OVER (PARTITION BY lang ORDER BY n_chars, doc_id), 6) AS pr
        |FROM documents""".stripMargin) { (s, dir) =>
      graft.operators.Ranking.groupedPercentRank(
        Tables.documents(s, dir).select("doc_id", "lang", "n_chars"),
        "lang", Seq("n_chars", "doc_id"))
        .select("doc_id", "lang", "pr")
    },

    // Zipf rank-frequency slope: least-squares fit of ln(freq) on
    // ln(rank) over the token vocabulary — the one-number corpus health
    // statistic (natural language sits near −1; template/generated text
    // flattens it). Ranks come from the window-free global rank (q160's
    // machinery); the oracle uses DuckDB's closed-form regr_slope/
    // regr_intercept over the same replayed ranking.
    GQuery(
      "q185_zipf_slope",
      """WITH tok AS (SELECT unnest(list_filter(string_split(lower(text), ' '), x -> x != '')) AS t
        |             FROM documents),
        |wc AS (SELECT t, count(*)::DOUBLE AS cnt FROM tok GROUP BY t),
        |r AS (SELECT cnt, row_number() OVER (ORDER BY cnt DESC, t) AS rk FROM wc)
        |SELECT count(*)::BIGINT AS n_types,
        |       round(regr_slope(ln(cnt), ln(rk)), 6) AS slope,
        |       round(regr_intercept(ln(cnt), ln(rk)), 6) AS intercept
        |FROM r""".stripMargin) { (s, dir) =>
      val wc = Tables.documents(s, dir)
        .select(explode(TextFunctions.tokens(lower(col("text")))).as("t"))
        .groupBy("t").agg(count(lit(1)).cast("double").as("cnt"))
        .withColumn("nc", -col("cnt"))
      val ranked = graft.operators.Ranking.globalRank(wc, Seq("nc", "t"),
        rankCol = "rk")
      val xy = ranked.select(log(col("rk").cast("double")).as("x"),
        log(col("cnt")).as("y"))
      // regr_slope = covar_pop(y,x)/var_pop(x); regr_intercept =
      // avg(y) − slope·avg(x) — the same closed forms DuckDB evaluates
      xy.agg(count(lit(1)).as("n_types"),
          covar_pop(col("y"), col("x")).as("_c"),
          var_pop(col("x")).as("_v"),
          avg(col("y")).as("_my"), avg(col("x")).as("_mx"))
        .select(col("n_types"),
          round(col("_c") / col("_v"), 6).as("slope"),
          round(col("_my") - (col("_c") / col("_v")) * col("_mx"), 6)
            .as("intercept"))
    },

    // Per-LANGUAGE Zipf slopes: q185's rank-frequency fit computed within
    // each language partition — one window-free grouped rank (q173's
    // machinery) feeds every per-language regression; the oracle is
    // regr_slope per partitioned row_number ranking.
    GQuery(
      "q187_grouped_zipf",
      """WITH tok AS (SELECT lang,
        |                    unnest(list_filter(string_split(lower(text), ' '), x -> x != '')) AS t
        |             FROM documents),
        |wc AS (SELECT lang, t, count(*)::DOUBLE AS cnt FROM tok GROUP BY 1, 2),
        |r AS (SELECT lang, cnt,
        |             row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, t) AS rk
        |      FROM wc)
        |SELECT lang, count(*)::BIGINT AS n_types,
        |       round(regr_slope(ln(cnt), ln(rk)), 6) AS slope
        |FROM r GROUP BY lang""".stripMargin) { (s, dir) =>
      val wc = Tables.documents(s, dir)
        .select(col("lang"), explode(TextFunctions.tokens(lower(col("text")))).as("t"))
        .groupBy("lang", "t").agg(count(lit(1)).cast("double").as("cnt"))
        .withColumn("nc", -col("cnt"))
      val ranked = graft.operators.Ranking.groupedRank(wc, "lang",
        Seq("nc", "t"), rankCol = "rk")
      ranked.select(col("lang"), log(col("rk").cast("double")).as("x"),
          log(col("cnt")).as("y"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_types"),
          round(covar_pop(col("y"), col("x")) / var_pop(col("x")), 6).as("slope"))
    },

    // Language-ID confusion matrix: the q42 heuristic classifier evaluated
    // against the corpus labels — (true lang, predicted, count), the eval
    // artifact a filter-stage classifier ships with. One aggregate over
    // the per-doc projection; the oracle replays the classifier CASE and
    // the crosstab.
    GQuery(
      "q186_langid_confusion",
      """SELECT lang, pred_lang, count(*)::BIGINT AS n
        |FROM (
        |  SELECT lang, CASE
        |      WHEN len(regexp_extract_all(lower(text), '[\x{4e00}-\x{9fff}]')) > 0 THEN 'zh'
        |      WHEN greatest(en_s, de_s, fr_s, es_s) = 0 THEN 'und'
        |      WHEN en_s = greatest(en_s, de_s, fr_s, es_s) THEN 'en'
        |      WHEN de_s = greatest(en_s, de_s, fr_s, es_s) THEN 'de'
        |      WHEN fr_s = greatest(en_s, de_s, fr_s, es_s) THEN 'fr'
        |      ELSE 'es' END AS pred_lang
        |  FROM (
        |    SELECT lang, text,
        |      len(regexp_extract_all(lower(text), '\b(the|and|is|of)\b')) AS en_s,
        |      len(regexp_extract_all(lower(text), '\b(der|und|die|nicht)\b')) AS de_s,
        |      len(regexp_extract_all(lower(text), '\b(le|et|les|est)\b')) AS fr_s,
        |      len(regexp_extract_all(lower(text), '\b(el|los|es|una)\b')) AS es_s
        |    FROM documents))
        |GROUP BY lang, pred_lang""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("lang"), TextFunctions.langId(col("text")).as("pred_lang"))
        .groupBy("lang", "pred_lang").agg(count(lit(1)).as("n"))
    },

    // Character-entropy quality signal: Shannon entropy (nats) of each
    // document's character distribution — keyboard mash and repeated-char
    // padding score far below natural text, base64/hex blobs above it.
    // A PURE projection (higher-order array functions, no explode, no
    // shuffle — streaming-composable like the other per-row signals); the
    // oracle recomputes the same ln(n) − Σ k·ln(k)/n form from a grouped
    // character relation.
    GQuery(
      "q182_char_entropy",
      """WITH ch AS (SELECT doc_id,
        |              unnest(list_transform(range(1, length(text) + 1),
        |                                    i -> substr(text, i, 1))) AS c
        |            FROM documents),
        |cc AS (SELECT doc_id, c, count(*)::DOUBLE AS k FROM ch GROUP BY 1, 2),
        |h AS (SELECT doc_id, round(ln(sum(k)) - sum(k * ln(k)) / sum(k), 6) AS entropy
        |      FROM cc GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(h.entropy, 0.0) AS entropy
        |FROM documents d LEFT JOIN h USING (doc_id)""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir).select(col("doc_id"),
        TextFunctions.charEntropy(col("text")).as("entropy"))
    },

    // Per-GROUP exact quantiles without per-group windows: the per-language
    // length quartiles (the inputs to language-local filtering fences).
    // One global range shuffle serves every (group, quantile) pair — the
    // interpolation ranks are picked arithmetically from broadcast group
    // offsets, so a skewed language spreads across tasks instead of
    // pinning one. The oracle is quantile_cont per language.
    GQuery(
      "q178_grouped_quantiles",
      """SELECT lang, 0.25::DOUBLE AS p, round(quantile_cont(n_chars, 0.25), 6) AS q
        |FROM documents GROUP BY lang
        |UNION ALL
        |SELECT lang, 0.5::DOUBLE AS p, round(quantile_cont(n_chars, 0.5), 6) AS q
        |FROM documents GROUP BY lang
        |UNION ALL
        |SELECT lang, 0.75::DOUBLE AS p, round(quantile_cont(n_chars, 0.75), 6) AS q
        |FROM documents GROUP BY lang""".stripMargin) { (s, dir) =>
      graft.operators.Ranking.groupedQuantiles(
        Tables.documents(s, dir).select("lang", "n_chars"),
        "lang", "n_chars", Seq(0.25, 0.5, 0.75))
    },

    // Deterministic k-per-group sample: 5 hash-random docs per language,
    // identical every run (the eval-slice/inspection sampler). The
    // in-group rank comes from the same window-free grouped-rank
    // machinery as q173/q178; the oracle is the partitioned row_number
    // over the replayed md5 order.
    GQuery(
      "q179_per_group_sample",
      """WITH h AS (SELECT doc_id, lang,
        |             ('0x' || substr(md5(doc_id::VARCHAR || ':pergroup'), 1, 15))::BIGINT % 1000000 AS hk
        |           FROM documents),
        |r AS (SELECT doc_id, lang, hk,
        |             row_number() OVER (PARTITION BY lang ORDER BY hk, doc_id) AS rn
        |      FROM h)
        |SELECT doc_id, lang, rn FROM r WHERE rn <= 5""".stripMargin) { (s, dir) =>
      graft.operators.Sampling.perGroupSample(
        Tables.documents(s, dir).select("doc_id", "lang"),
        "lang", "doc_id", k = 5)
        .select("doc_id", "lang", "rn")
    },

    // Viterbi segmentation under a unigram piece LM (the SentencePiece
    // inference step): pieces = all 1-/2-char substrings of the weighted
    // vocabulary under ONE ln(cnt/total) distribution; each word scores
    // its optimal segmentation. The engine runs true DP; the oracle
    // ENUMERATES every segmentation path by recursive CTE and takes the
    // max — a green row proves the DP optimum equals the exhaustive
    // optimum for every vocabulary word (scores are left-to-right sums in
    // both engines, so max is bit-stable; only the unique optimal SCORE
    // is emitted, never an arbitrary argmax).
    GQuery(
      "q176_viterbi_segmentation",
      s"""WITH RECURSIVE
         |wc AS (SELECT word, count(*) AS cnt
         |       FROM (SELECT unnest($duckToks) AS word FROM documents)
         |       GROUP BY word),
         |pieces AS (SELECT piece, sum(cnt) AS pcnt FROM (
         |    SELECT cnt, unnest(flatten([
         |      list_transform(range(1, length(word) + 1), i -> substr(word, i, 1)),
         |      list_transform(range(1, greatest(0, length(word) - 1) + 1),
         |                     i -> substr(word, i, 2))
         |    ])) AS piece FROM wc) GROUP BY piece),
         |tot AS (SELECT sum(pcnt) AS t FROM pieces),
         |sc AS (SELECT piece, ln(pcnt / t) AS score FROM pieces CROSS JOIN tot),
         |paths(word, pos, score) AS (
         |  SELECT word, 0, 0.0::DOUBLE FROM wc
         |  UNION ALL
         |  SELECT p.word, p.pos + l.l, p.score + sc.score
         |  FROM paths p
         |  JOIN (SELECT 1 AS l UNION ALL SELECT 2) l ON p.pos + l.l <= length(p.word)
         |  JOIN sc ON sc.piece = substr(p.word, p.pos + 1, l.l))
         |SELECT word, round(max(score), 6) AS best_score
         |FROM paths WHERE pos = length(word) GROUP BY word""".stripMargin) { (s, dir) =>
      graft.operators.UnigramSeg.wordBestScores(
        Tables.documents(s, dir), "text")
    },

    // Byte-level BPE round trip (GPT-2 construction): pretokenize → map
    // UTF-8 bytes through the 256-char table → 16 trained merges → encode
    // → decode must reproduce the corpus EXACTLY — case, whitespace runs
    // and multi-byte scripts included (the zh slice is the point: its
    // chars are 3 UTF-8 bytes each, so any byte-handling bug corrupts the
    // identity). The oracle is the identity itself; unlike char-level
    // q159, byte-level decoding loses NOTHING.
    GQuery(
      "q190_bpe_bytes_roundtrip",
      "SELECT doc_id, text AS decoded FROM documents") { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val model = graft.operators.Bpe.fitBytes(docs, "text", numMerges = 16)
      graft.operators.Bpe.decodeBytes(
        graft.operators.Bpe.encodeBytes(docs, "doc_id", "text", model),
        "doc_id", "tok_ids", model)
    },

    // The pack spine over BYTE-level token ids: a 0-merge byte tokenizer
    // emits exactly one id per UTF-8 byte (the pretokens tile the text,
    // the base vocab covers all 256 bytes), so the oracle can replay the
    // whole encode→packCoordinates composition from octet_length alone —
    // zh documents pack at 3 tokens per character, which is precisely
    // what this query pins (byte-correct token accounting, not char
    // counts, feeding q116's prefix-sum arithmetic).
    GQuery(
      "q191_bpe_bytes_pack",
      """WITH t AS (SELECT doc_id, octet_length(encode(text))::BIGINT AS n
        |           FROM documents),
        |c AS (SELECT doc_id, n AS n_tokens,
        |             coalesce(sum(n) OVER (ORDER BY doc_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS tok_start
        |      FROM t WHERE n > 0)
        |SELECT doc_id, n_tokens, tok_start,
        |       (tok_start // 512) AS seq_first,
        |       ((tok_start + n_tokens - 1) // 512) AS seq_last,
        |       (tok_start % 512) AS seq_offset
        |FROM c""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val model = graft.operators.Bpe.fitBytes(docs, "text", numMerges = 0)
      val enc = graft.operators.Bpe.encodeBytes(docs, "doc_id", "text", model)
      Packing.packCoordinates(
        enc.select(col("doc_id"), size(col("tok_ids")).cast("long").as("n_tok")),
        "doc_id", "n_tok", seqLen = 512)
    },

    // Distinct-n diversity card: the fraction of n-gram occurrences that
    // are distinct types, n = 1..3 — the mode-collapse gauge a
    // synthetic-data pipeline reads before training on its own output.
    // Per n: one explode + one aggregate (count_distinct partial-
    // aggregates map-side, the exchange carries types not the corpus).
    // The oracle replays positional grams and both counts per n.
    GQuery(
      "q205_distinct_n",
      """WITH t AS (SELECT list_filter(string_split(lower(text), ' '), x -> x != '') AS toks
        |           FROM documents),
        |g1 AS (SELECT array_to_string(toks[(i+1):(i+1)], ' ') AS gram
        |       FROM (SELECT toks, unnest(range(len(toks))) AS i FROM t WHERE len(toks) >= 1)),
        |g2 AS (SELECT array_to_string(toks[(i+1):(i+2)], ' ') AS gram
        |       FROM (SELECT toks, unnest(range(len(toks) - 1)) AS i FROM t WHERE len(toks) >= 2)),
        |g3 AS (SELECT array_to_string(toks[(i+1):(i+3)], ' ') AS gram
        |       FROM (SELECT toks, unnest(range(len(toks) - 2)) AS i FROM t WHERE len(toks) >= 3))
        |SELECT 1::BIGINT AS n, count(*) AS total_ngrams,
        |       count(DISTINCT gram) AS distinct_ngrams,
        |       round(count(DISTINCT gram)::DOUBLE / count(*), 6) AS distinct_ratio FROM g1
        |UNION ALL
        |SELECT 2::BIGINT, count(*), count(DISTINCT gram),
        |       round(count(DISTINCT gram)::DOUBLE / count(*), 6) FROM g2
        |UNION ALL
        |SELECT 3::BIGINT, count(*), count(DISTINCT gram),
        |       round(count(DISTINCT gram)::DOUBLE / count(*), 6) FROM g3""".stripMargin) { (s, dir) =>
      graft.operators.Diversity.distinctN(Tables.documents(s, dir), "text")
    },

    // The 100 TB diversity card: HLL++ approx_count_distinct over the
    // same gram generator — one sketch per n crosses the exchange instead
    // of the corpus-sized gram-type universe. The q141/q71 discipline:
    // output carries the EXACT count (oracle-recomputable) plus a 5σ
    // bound check on the sketch.
    GQuery(
      "q332_distinct_n_approx",
      """WITH t AS (SELECT list_filter(string_split(lower(text), ' '), x -> x != '') AS toks
        |           FROM documents),
        |g1 AS (SELECT array_to_string(toks[(i+1):(i+1)], ' ') AS gram
        |       FROM (SELECT toks, unnest(range(len(toks))) AS i FROM t WHERE len(toks) >= 1)),
        |g2 AS (SELECT array_to_string(toks[(i+1):(i+2)], ' ') AS gram
        |       FROM (SELECT toks, unnest(range(len(toks) - 1)) AS i FROM t WHERE len(toks) >= 2)),
        |g3 AS (SELECT array_to_string(toks[(i+1):(i+3)], ' ') AS gram
        |       FROM (SELECT toks, unnest(range(len(toks) - 2)) AS i FROM t WHERE len(toks) >= 3))
        |SELECT 1::BIGINT AS n, count(*) AS total_ngrams,
        |       count(DISTINCT gram) AS distinct_ngrams, true AS approx_in_bounds FROM g1
        |UNION ALL
        |SELECT 2::BIGINT, count(*), count(DISTINCT gram), true FROM g2
        |UNION ALL
        |SELECT 3::BIGINT, count(*), count(DISTINCT gram), true FROM g3""".stripMargin) { (s, dir) =>
      graft.operators.Diversity.distinctNApprox(Tables.documents(s, dir), "text")
    },

    // HTML main-text extraction (jusText/Arc90-family block scoring):
    // the raw-crawl → text transform every curation stage downstream
    // assumes. The oracle is EXTRACTION-EXACT by construction: each doc's
    // text is wrapped in a chrome template (title/script/nav/footer —
    // all of which must drop) and the extractor must hand back the
    // original text byte-for-byte. Per-row map, zero shuffle.
    GQuery(
      "q336_html_extract",
      """SELECT doc_id, text FROM documents WHERE doc_id < 300""") { (s, dir) =>
      val docs = Tables.documents(s, dir).filter(col("doc_id") < 300)
      val html = docs.select(col("doc_id"), concat(
        lit("<html><head><title>Page</title><script>var x = '<p>junk</p>';" +
          "</script></head><body><!-- beacon --><nav><a href=\"/\">Home</a> " +
          "<a href=\"/about\">About</a></nav><p>"),
        col("text"),
        lit("</p><footer>(c) corp</footer></body></html>")).as("html"))
      graft.operators.HtmlExtract.extract(html, "doc_id", "html")
    },

    // The raw-crawl ingestion spine end to end: corpus text → chrome-
    // wrapped HTML → WARC container (ISO 28500 response records with an
    // HTTP envelope) → WarcIO.read (file-parallel scan, envelope strip)
    // → HtmlExtract block scoring → the ORIGINAL text byte-for-byte,
    // keyed by the doc id carried in the WARC-Target-URI. One oracle
    // covers the writer, the record scanner, the HTTP strip and the
    // boilerplate removal in composition.
    GQuery(
      "q337_warc_pipeline",
      """SELECT doc_id, text FROM documents WHERE doc_id < 300""") { (s, dir) =>
      val base = s"${tmpDir()}/warc-${System.nanoTime()}"
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(base))
      val docs = Tables.documents(s, dir).filter(col("doc_id") < 300)
      val pages = docs.select(
        concat(lit("http://corpus.test/doc/"), col("doc_id")).as("url"),
        concat(
          lit("<html><head><title>Page</title><script>var x = '<p>junk</p>';" +
            "</script></head><body><!-- beacon --><nav><a href=\"/\">Home</a> " +
            "<a href=\"/about\">About</a></nav><p>"),
          col("text"),
          lit("</p><footer>(c) corp</footer></body></html>")).as("payload"))
      graft.sources.WarcIO.write(pages, s"$base/crawl.warc")
      val crawled = graft.sources.WarcIO.read(s, s"$base/crawl.warc")
        .select(regexp_extract(col("url"), "/doc/(\\d+)$", 1)
          .cast("long").as("doc_id"), col("text").as("html"))
      graft.operators.HtmlExtract.extract(crawled, "doc_id", "html")
    },

    // Crawl REALITY over the same spine: a mixed WARC where only ~1/3 of
    // records are UTF-8 HTML — the rest are a binary image (PPM routed
    // untouched through `payload BINARY` to the MediaCodecs seam; `text`
    // must be null) and a non-UTF-8 page (ISO-8859-1, decoded via the
    // HTTP envelope's DECLARED charset — the reason jusText-class
    // extractors sniff Content-Type). Written through the DISTRIBUTED
    // shard writer (one WARC per partition, the crawl convention), read
    // back file-parallel. Every row's `result` is recomputable by the
    // oracle: extracted text for html, the charset-decoded page for
    // latin1, and dims+byte-exactness for the image (ok computed by a
    // genuine byte/raster compare against the regenerated PPM).
    GQuery(
      "q338_warc_mixed_media",
      """SELECT doc_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'html' WHEN 1 THEN 'ppm' ELSE 'latin1' END AS kind,
        |  CASE doc_id % 3
        |    WHEN 0 THEN text
        |    WHEN 1 THEN 'ppm:' || (2 + doc_id % 5) || 'x' || (2 + doc_id % 4) || ':true'
        |    ELSE 'café ' || doc_id || ' résumé ±°ß'
        |  END AS result
        |FROM documents WHERE doc_id < 150""".stripMargin) { (s, dir) =>
      val base = s"${tmpDir()}/warcmix-${System.nanoTime()}"
      def ppmFor(id: Long): Array[Byte] = {
        val (w, h) = ((2 + id % 5).toInt, (2 + id % 4).toInt)
        graft.operators.MediaCodecs.encodePpm(w, h,
          Array.tabulate(w * h * 3)(i => ((id * 7 + i) % 256).toByte))
      }
      val docs = Tables.documents(s, dir).filter(col("doc_id") < 150)
        .select(col("doc_id"), col("text"))
      val mkPayload = udf { (id: Long, text: String) =>
        (id % 3) match {
          case 0 => ("<html><head><title>Page</title></head><body><nav>" +
            "<a href=\"/\">Home</a> <a href=\"/a\">About</a></nav><p>" + text +
            "</p><footer>(c) corp</footer></body></html>")
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          case 1 => ppmFor(id)
          case _ => s"café $id résumé ±°ß"
            .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
        }
      }
      val pages = docs.select(
        concat(lit("http://corpus.test/"),
          when(col("doc_id") % 3 === 0, "html")
            .when(col("doc_id") % 3 === 1, "ppm").otherwise("latin1"),
          lit("/"), col("doc_id")).as("url"),
        mkPayload(col("doc_id"), col("text")).as("payload"),
        when(col("doc_id") % 3 === 0, "text/html; charset=utf-8")
          .when(col("doc_id") % 3 === 1, "image/x-portable-pixmap")
          .otherwise("text/plain; charset=iso-8859-1").as("content_type"))
      graft.sources.WarcIO.writeShards(pages.repartition(4), base,
        contentTypeCol = Some("content_type"))
      val crawled = graft.sources.WarcIO.read(s, base)
        .select(
          regexp_extract(col("url"), "/(\\d+)$", 1).cast("long").as("doc_id"),
          regexp_extract(col("url"), "corpus\\.test/([a-z0-9]+)/", 1).as("kind"),
          col("payload"), col("text"))
      // image verification: byte-exact payload round trip + raster decode
      // match against the regenerated PPM + text routed null
      val ppmOk = udf { (id: Long, payload: Array[Byte], text: String) =>
        val expected = ppmFor(id)
        val decoded = graft.operators.MediaCodecs.decodePpm(payload)
        val expDec = graft.operators.MediaCodecs.decodePpm(expected)
        val ok = text == null &&
          java.util.Arrays.equals(payload, expected) &&
          decoded.isDefined && expDec.isDefined &&
          decoded.get._1 == expDec.get._1 && decoded.get._2 == expDec.get._2 &&
          java.util.Arrays.equals(decoded.get._3, expDec.get._3)
        s"ppm:${2 + id % 5}x${2 + id % 4}:$ok"
      }
      val html = crawled.filter(col("kind") === "html")
      val extracted = graft.operators.HtmlExtract.extract(
        html.select(col("doc_id"), col("text").as("html")), "doc_id", "html")
        .select(col("doc_id"), lit("html").as("kind"), col("text").as("result"))
      val latin1 = crawled.filter(col("kind") === "latin1")
        .select(col("doc_id"), col("kind"), col("text").as("result"))
      val ppm = crawled.filter(col("kind") === "ppm")
        .select(col("doc_id"), col("kind"),
          ppmOk(col("doc_id"), col("payload"), col("text")).as("result"))
      extracted.unionByName(latin1).unionByName(ppm)
    },

    // CDX-indexed RANDOM ACCESS over the crawl container — the 100 TB
    // read path: build the sorted CDXJ index (urlkey/digest/offset per
    // record) from a WARC shard, round-trip it through the text format,
    // select 1/5th of the records BY INDEX, and pull exactly those via
    // byte-offset seeks (WarcIO.fetchRecord — the shard is never
    // re-scanned). Extraction equality against the original text proves
    // every stored offset byte-exact in composition with the writer,
    // the HTTP envelope strip and the boilerplate remover.
    GQuery(
      "q339_cdx_random_access",
      """SELECT doc_id, text FROM documents WHERE doc_id < 250 AND doc_id % 5 = 0""") { (s, dir) =>
      val base = s"${tmpDir()}/cdx-${System.nanoTime()}"
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(base))
      val docs = Tables.documents(s, dir).filter(col("doc_id") < 250)
      val pages = docs.select(
        concat(lit("http://corpus.test/doc/"), col("doc_id")).as("url"),
        concat(
          lit("<html><head><title>Page</title><script>var x = '<p>junk</p>';" +
            "</script></head><body><!-- beacon --><nav><a href=\"/\">Home</a> " +
            "<a href=\"/about\">About</a></nav><p>"),
          col("text"),
          lit("</p><footer>(c) corp</footer></body></html>")).as("payload"))
      graft.sources.WarcIO.write(pages, s"$base/crawl.warc")
      val idx = graft.sources.CdxIO.index(s, s"$base/crawl.warc")
      graft.sources.CdxIO.writeCdxj(idx, s"$base/crawl.cdxj")
      val selected = graft.sources.CdxIO.readCdxj(s, s"$base/crawl.cdxj")
        .withColumn("doc_id",
          regexp_extract(col("url"), "/doc/(\\d+)$", 1).cast("long"))
        .filter(col("doc_id") % 5 === 0)
      val recs = graft.sources.CdxIO.fetchRecords(selected)
        .select(regexp_extract(col("url"), "/doc/(\\d+)$", 1)
          .cast("long").as("doc_id"), col("text").as("html"))
      graft.operators.HtmlExtract.extract(recs, "doc_id", "html")
    },

    // STREAMING crawl ingest end to end (the q103 discipline applied to
    // the warc source): two AvailableNow drains over ONE checkpoint, a
    // new shard landing between them — exactly-once at the shard
    // granularity means the sink holds each record exactly once, which
    // the oracle (a plain recompute from documents) only matches if the
    // second drain picked up ONLY the new shard. Composes the streaming
    // source with the envelope strip, charset decode and HtmlExtract.
    GQuery(
      "q340_warc_stream",
      """SELECT doc_id, text FROM documents WHERE doc_id < 200""") { (s, dir) =>
      val base = s"${tmpDir()}/warcstream-${System.nanoTime()}"
      val inDir = s"$base/in"
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(inDir))
      def pagesFor(lo: Long, hi: Long) =
        Tables.documents(s, dir)
          .filter(col("doc_id") >= lo && col("doc_id") < hi)
          .select(
            concat(lit("http://corpus.test/doc/"), col("doc_id")).as("url"),
            concat(
              lit("<html><head><title>Page</title></head><body><nav>" +
                "<a href=\"/\">Home</a> <a href=\"/a\">About</a></nav><p>"),
              col("text"),
              lit("</p><footer>(c) corp</footer></body></html>")).as("payload"))
      def drain(): Unit = {
        val q = s.readStream.format("warc").load(inDir)
          .select(col("url"), col("text"))
          .writeStream.format("parquet")
          .option("path", s"$base/out")
          .option("checkpointLocation", s"$base/ckpt")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        if (!q.awaitTermination(120000)) {
          q.stop()
          throw new IllegalStateException("q340: AvailableNow drain timed out")
        }
      }
      graft.sources.WarcIO.write(pagesFor(0, 100), s"$inDir/shard-000.warc")
      drain()
      // the crawl produces its next shard (name sorts after, the contract)
      graft.sources.WarcIO.write(pagesFor(100, 200), s"$inDir/shard-001.warc")
      drain()
      val crawled = s.read.parquet(s"$base/out")
        .select(regexp_extract(col("url"), "/doc/(\\d+)$", 1)
          .cast("long").as("doc_id"), col("text").as("html"))
      graft.operators.HtmlExtract.extract(crawled, "doc_id", "html")
    },

    // Outlink extraction — crawled page → LINK-GRAPH edges (the PageRank
    // / host-authority input) plus the rel=canonical URL-dedup key. The
    // fixture exercises the three RFC 3986 resolution classes (rooted,
    // ../ traversal against the page path, absolute cross-host) and a
    // dropped mailto:; every resolved URL and anchor is string-exact in
    // the oracle. One per-row flatMap, zero shuffle.
    GQuery(
      "q341_link_extract",
      """SELECT doc_id, 'link' AS rel,
        |       'http://corpus.test/doc/' || (doc_id + 1) AS url,
        |       'next doc' AS anchor
        |FROM documents WHERE doc_id < 300
        |UNION ALL
        |SELECT doc_id, 'link', 'http://corpus.test/a/rel/' || (doc_id % 7),
        |       'up link' FROM documents WHERE doc_id < 300
        |UNION ALL
        |SELECT doc_id, 'link', 'http://other.site/abs/' || doc_id,
        |       'elsewhere' FROM documents WHERE doc_id < 300
        |UNION ALL
        |SELECT doc_id, 'canonical', 'http://corpus.test/canon/' || doc_id,
        |       '' FROM documents WHERE doc_id < 300""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir).filter(col("doc_id") < 300)
      val pages = docs.select(col("doc_id"),
        concat(lit("http://corpus.test/a/b/doc"), col("doc_id")).as("url"),
        concat(
          lit("<html><head><link rel=\"canonical\" href=\"/canon/"),
          col("doc_id"),
          lit("\"></head><body><a href=\"/doc/"), col("doc_id") + 1,
          lit("\">next doc</a> <a href=\"../rel/"), col("doc_id") % 7,
          lit("\">up link</a> <a href=\"http://other.site/abs/"), col("doc_id"),
          lit("\">elsewhere</a> <a href=\"mailto:x@y.z\">mail</a><p>"),
          col("text"), lit("</p></body></html>")).as("html"))
      val links = graft.operators.LinkExtract
        .extract(pages, "doc_id", "html", "url")
        .select(col("doc_id"), lit("link").as("rel"),
          col("link").as("url"), col("anchor"))
      val canon = graft.operators.LinkExtract
        .canonical(pages, "doc_id", "html", "url")
        .select(col("doc_id"), lit("canonical").as("rel"),
          col("canonical").as("url"), lit("").as("anchor"))
      links.unionByName(canon)
    },

    // WET export round trip over PER-RECORD gzip members: extracted text
    // persists as ISO 28500 `conversion` records (no HTTP envelope — the
    // derived-text artifact crawls ship beside raw WARCs), one gzip
    // member per record so the COMPRESSED file stays randomly
    // addressable; the oracle replays text and record typing after a
    // write → multi-member sequential read round trip.
    GQuery(
      "q342_wet_export",
      """SELECT doc_id, 'conversion' AS warc_type,
        |       'text/plain; charset=utf-8' AS content_type, text
        |FROM documents WHERE doc_id < 300""".stripMargin) { (s, dir) =>
      val base = s"${tmpDir()}/wet-${System.nanoTime()}"
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(base))
      val docs = Tables.documents(s, dir).filter(col("doc_id") < 300)
        .select(concat(lit("http://corpus.test/doc/"), col("doc_id")).as("url"),
          col("text"))
      graft.sources.WarcIO.writeWet(docs, s"$base/corpus.wet.warc.gz")
      graft.sources.WarcIO.read(s, s"$base/corpus.wet.warc.gz")
        .select(regexp_extract(col("url"), "/doc/(\\d+)$", 1)
          .cast("long").as("doc_id"), col("warc_type"), col("content_type"),
          col("text"))
    },

    // robots.txt compliance (RFC 9309) — the legal filter in front of
    // every crawl-derived corpus. Three hosts with distinct policies
    // (longest-match Allow-over-Disallow, an agent-specific total block,
    // a wildcard-anchored extension rule); rules compile ONCE per host
    // (per-row map on the 3-row robots table), pages join on the host
    // key — never a per-page re-parse. Every verdict is recomputable by
    // the oracle from doc_id arithmetic.
    GQuery(
      "q343_robots_filter",
      """SELECT doc_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'h0.test' WHEN 1 THEN 'h1.test'
        |       ELSE 'h2.test' END AS host,
        |  CASE WHEN doc_id % 3 = 1 THEN false
        |       WHEN doc_id % 3 = 0 AND doc_id % 4 = 1 THEN false
        |       WHEN doc_id % 3 = 2 AND doc_id % 4 = 3 THEN false
        |       ELSE true END AS allowed
        |FROM documents WHERE doc_id < 300""".stripMargin) { (s, dir) =>
      import s.implicits._
      val docs = Tables.documents(s, dir).filter(col("doc_id") < 300)
      val pages = docs.select(col("doc_id"),
        when(col("doc_id") % 3 === 0, "h0.test")
          .when(col("doc_id") % 3 === 1, "h1.test")
          .otherwise("h2.test").as("host"),
        concat(lit("http://"),
          when(col("doc_id") % 3 === 0, "h0.test")
            .when(col("doc_id") % 3 === 1, "h1.test")
            .otherwise("h2.test"),
          when(col("doc_id") % 4 === 0, concat(lit("/public/"), col("doc_id")))
            .when(col("doc_id") % 4 === 1, concat(lit("/private/"), col("doc_id")))
            .when(col("doc_id") % 4 === 2, concat(lit("/private/ok/"), col("doc_id")))
            .otherwise(concat(lit("/data/"), col("doc_id"), lit(".bin"))))
          .as("url"))
      val robots = Seq(
        ("h0.test", "User-agent: *\nDisallow: /private/\nAllow: /private/ok\n"),
        ("h1.test", "User-agent: graftbot\nDisallow: /\n\nUser-agent: *\nDisallow:\n"),
        ("h2.test", "User-agent: *\nDisallow: /*.bin$\n"))
        .toDF("host", "robots_txt")
      val compiled = graft.operators.RobotsTxt.compileRules(robots, "graftbot")
      graft.operators.RobotsTxt.filterAllowed(pages, compiled)
        .select(col("doc_id"), col("host"), col("allowed"))
    },

    // Sitemap extraction (sitemaps.org) — the crawl-discovery expansion
    // robots.txt points at. Five per-host urlset documents are BUILT in
    // the query (one aggregate over the docs, entries in doc order),
    // then exploded back through the parser: every loc and lastmod is
    // string-exact in the oracle. Per-row flatMap over the per-host
    // table, zero shuffle beyond the fixture's own build aggregate.
    GQuery(
      "q344_sitemap_extract",
      """SELECT doc_id,
        |  'http://h' || (doc_id % 5) || '.test/page/' || doc_id AS loc,
        |  CASE WHEN doc_id % 2 = 0
        |       THEN '2026-0' || (doc_id % 9 + 1) || '-15' ELSE '' END AS lastmod
        |FROM documents WHERE doc_id < 300""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir).filter(col("doc_id") < 300)
        .select(col("doc_id"), (col("doc_id") % 5).as("h"))
      val entry = concat(
        lit("<url><loc>http://h"), col("h"), lit(".test/page/"), col("doc_id"),
        lit("</loc>"),
        when(col("doc_id") % 2 === 0,
          concat(lit("<lastmod>2026-0"), col("doc_id") % 9 + 1,
            lit("-15</lastmod>"))).otherwise(lit("")),
        lit("</url>"))
      val perHost = docs.select(col("h"), struct(col("doc_id"), entry.as("e")).as("s"))
        .groupBy("h").agg(concat(lit("<urlset>"),
          concat_ws("", transform(array_sort(collect_list(col("s"))),
            x => x.getField("e"))),
          lit("</urlset>")).as("xml"))
      graft.operators.Sitemaps.extract(perHost, "h", "xml")
        .select(regexp_extract(col("loc"), "/page/(\\d+)$", 1)
          .cast("long").as("doc_id"), col("loc"), col("lastmod"))
    },

    // Perceptual image hash (dHash) — every step integer-exact (9x8
    // grid, (r+g+b)/3 integer grayscale, one bit per adjacent
    // comparison), so the oracle replays all 64 bits of every image's
    // hash from the raster formula. The multimodal-dedup key: equal
    // hashes catch re-encoded duplicates (codec invariance is
    // spec-pinned across PPM/BMP/PNG).
    GQuery(
      "q345_image_dhash",
      """WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 200),
        |g AS (SELECT doc_id, i,
        |        (((doc_id*31 + (3*i)*7) % 256) + ((doc_id*31 + (3*i+1)*7) % 256)
        |          + ((doc_id*31 + (3*i+2)*7) % 256)) // 3 AS g
        |      FROM ids, UNNEST(range(72)) AS t(i)),
        |bits AS (SELECT a.doc_id, ((a.i // 9) * 8 + (a.i % 9))::INT AS bit
        |         FROM g a JOIN g b ON a.doc_id = b.doc_id AND b.i = a.i + 1
        |         WHERE a.i % 9 < 8 AND b.g > a.g)
        |SELECT ids.doc_id,
        |       coalesce(sum(CASE WHEN bit = 63 THEN -9223372036854775808
        |                         ELSE (1::BIGINT << bit) END), 0)::BIGINT AS dhash
        |FROM ids LEFT JOIN bits ON ids.doc_id = bits.doc_id
        |GROUP BY ids.doc_id""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir).filter(col("doc_id") < 200)
        .select("doc_id")
      val mk = udf((id: Long) => graft.operators.MediaCodecs.encodePpm(9, 8,
        Array.tabulate(216)(j => ((id * 31 + j * 7) % 256).toByte)))
      graft.operators.ImageHash.dHashDf(
        docs.select(col("doc_id"), mk(col("doc_id")).as("img")), "doc_id", "img")
    },

    // Image NEAR-DUP pairs: 200 base images + 200 one-byte-perturbed
    // twins (ids +1000); Spark finds pairs via the pigeonhole
    // chunk-banded join (never all-pairs), the oracle replays EVERY
    // hash and brute-forces ALL pairs — the q49-style recall proof that
    // the banding misses nothing within the Hamming radius.
    GQuery(
      "q346_image_near_dup",
      """WITH ids AS (SELECT doc_id AS id FROM documents WHERE doc_id < 200
        |             UNION ALL
        |             SELECT doc_id + 1000 FROM documents WHERE doc_id < 200),
        |g AS (SELECT id, i,
        |        ((CASE WHEN id >= 1000 AND i = 0
        |               THEN (((id-1000)*31) % 256 + 40) % 256
        |               ELSE ((CASE WHEN id >= 1000 THEN id-1000 ELSE id END)*31
        |                     + (3*i)*7) % 256 END)
        |         + ((CASE WHEN id >= 1000 THEN id-1000 ELSE id END)*31 + (3*i+1)*7) % 256
        |         + ((CASE WHEN id >= 1000 THEN id-1000 ELSE id END)*31 + (3*i+2)*7) % 256) // 3 AS g
        |      FROM ids, UNNEST(range(72)) AS t(i)),
        |bits AS (SELECT a.id, ((a.i // 9) * 8 + (a.i % 9))::INT AS bit
        |         FROM g a JOIN g b ON a.id = b.id AND b.i = a.i + 1
        |         WHERE a.i % 9 < 8 AND b.g > a.g),
        |h AS (SELECT ids.id,
        |        coalesce(sum(CASE WHEN bit = 63 THEN -9223372036854775808
        |                          ELSE (1::BIGINT << bit) END), 0)::BIGINT AS h
        |      FROM ids LEFT JOIN bits ON ids.id = bits.id GROUP BY ids.id)
        |SELECT a.id AS id_a, b.id AS id_b,
        |       bit_count(xor(a.h, b.h))::BIGINT AS hamming
        |FROM h a JOIN h b ON a.id < b.id
        |WHERE bit_count(xor(a.h, b.h)) <= 6""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir).filter(col("doc_id") < 200)
        .select("doc_id")
      val ids = docs.select(col("doc_id").as("id"))
        .unionByName(docs.select((col("doc_id") + 1000).as("id")))
      val mk = udf((id: Long) => {
        val base = if (id >= 1000) id - 1000 else id
        val bytes = Array.tabulate(216)(j => ((base * 31 + j * 7) % 256).toByte)
        if (id >= 1000) bytes(0) = (((base * 31) % 256 + 40) % 256).toByte
        graft.operators.MediaCodecs.encodePpm(9, 8, bytes)
      })
      val hashes = graft.operators.ImageHash.dHashDf(
        ids.select(col("id"), mk(col("id")).as("img")), "id", "img")
      graft.operators.ImageHash.nearDupPairs(hashes, maxHamming = 6, chunks = 8)
    },

    // Per-frame video dHash signatures: 4-frame concatenated-PPM videos
    // through the splitPpmStream container seam — all 64 bits of every
    // frame's hash replayed by the oracle from the (id, frame) raster
    // formula. The video-dedup signature generator.
    GQuery(
      "q347_video_frame_hashes",
      """WITH ids AS (SELECT doc_id AS id FROM documents WHERE doc_id < 100),
        |fr AS (SELECT id, f FROM ids, UNNEST(range(4)) AS t(f)),
        |g AS (SELECT id, f, i,
        |        (((id*31 + f*101 + (3*i)*7) % 256)
        |         + ((id*31 + f*101 + (3*i+1)*7) % 256)
        |         + ((id*31 + f*101 + (3*i+2)*7) % 256)) // 3 AS g
        |      FROM fr, UNNEST(range(72)) AS t(i)),
        |bits AS (SELECT a.id, a.f, ((a.i // 9) * 8 + (a.i % 9))::INT AS bit
        |         FROM g a JOIN g b ON a.id = b.id AND a.f = b.f AND b.i = a.i + 1
        |         WHERE a.i % 9 < 8 AND b.g > a.g)
        |SELECT fr.id, fr.f::INT AS frame_idx,
        |       coalesce(sum(CASE WHEN bit = 63 THEN -9223372036854775808
        |                         ELSE (1::BIGINT << bit) END), 0)::BIGINT AS dhash
        |FROM fr LEFT JOIN bits ON fr.id = bits.id AND fr.f = bits.f
        |GROUP BY fr.id, fr.f""".stripMargin) { (s, dir) =>
      val ids = Tables.documents(s, dir).filter(col("doc_id") < 100)
        .select(col("doc_id").as("id"))
      val mkVideo = udf((id: Long) =>
        (0 until 4).map(f => graft.operators.MediaCodecs.encodePpm(9, 8,
          Array.tabulate(216)(j => ((id * 31 + f * 101 + j * 7) % 256).toByte)))
          .reduce(_ ++ _))
      graft.operators.ImageHash.videoFrameHashes(
        ids.select(col("id"), mkVideo(col("id")).as("video")), "id", "video")
    },

    // Video NEAR-DUP pairs: 100 base videos + 100 twins with ONE frame
    // replaced (ids +1000, frame 3 → seed 9). Spark pairs by the
    // inverted-index join on frame-hash sets (videos with no shared
    // frame never pair); the oracle replays EVERY frame hash and
    // brute-forces ALL pair jaccards — the recall proof at video
    // granularity.
    GQuery(
      "q348_video_near_dup",
      """WITH ids AS (SELECT doc_id AS id FROM documents WHERE doc_id < 100
        |             UNION ALL
        |             SELECT doc_id + 1000 FROM documents WHERE doc_id < 100),
        |fr AS (SELECT id, f,
        |         CASE WHEN id >= 1000 THEN id - 1000 ELSE id END AS b,
        |         CASE WHEN id >= 1000 AND f = 3 THEN 9 ELSE f END AS ef
        |       FROM ids, UNNEST(range(4)) AS t(f)),
        |g AS (SELECT id, f, i,
        |        (((b*31 + ef*101 + (3*i)*7) % 256)
        |         + ((b*31 + ef*101 + (3*i+1)*7) % 256)
        |         + ((b*31 + ef*101 + (3*i+2)*7) % 256)) // 3 AS g
        |      FROM fr, UNNEST(range(72)) AS t(i)),
        |bits AS (SELECT a.id, a.f, ((a.i // 9) * 8 + (a.i % 9))::INT AS bit
        |         FROM g a JOIN g b ON a.id = b.id AND a.f = b.f AND b.i = a.i + 1
        |         WHERE a.i % 9 < 8 AND b.g > a.g),
        |h AS (SELECT fr.id, fr.f,
        |        coalesce(sum(CASE WHEN bit = 63 THEN -9223372036854775808
        |                          ELSE (1::BIGINT << bit) END), 0)::BIGINT AS h
        |      FROM fr LEFT JOIN bits ON fr.id = bits.id AND fr.f = bits.f
        |      GROUP BY fr.id, fr.f),
        |d AS (SELECT DISTINCT id, h FROM h),
        |sz AS (SELECT id, count(*) AS n FROM d GROUP BY id),
        |sh AS (SELECT a.id AS id_a, b.id AS id_b, count(*) AS shared
        |       FROM d a JOIN d b ON a.h = b.h AND a.id < b.id
        |       GROUP BY a.id, b.id)
        |SELECT id_a, id_b, shared,
        |       round(shared::DOUBLE / (sa.n + sb.n - shared), 6) AS jaccard
        |FROM sh JOIN sz sa ON sa.id = sh.id_a JOIN sz sb ON sb.id = sh.id_b
        |WHERE shared::DOUBLE / (sa.n + sb.n - shared) >= 0.5""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir).filter(col("doc_id") < 100)
        .select(col("doc_id").as("id"))
      val ids = docs.unionByName(docs.select((col("id") + 1000).as("id")))
      val mkVideo = udf((id: Long) => {
        val base = if (id >= 1000) id - 1000 else id
        (0 until 4).map { f =>
          val ef = if (id >= 1000 && f == 3) 9 else f
          graft.operators.MediaCodecs.encodePpm(9, 8,
            Array.tabulate(216)(j => ((base * 31 + ef * 101 + j * 7) % 256).toByte))
        }.reduce(_ ++ _)
      })
      val fh = graft.operators.ImageHash.videoFrameHashes(
        ids.select(col("id"), mkVideo(col("id")).as("video")), "id", "video")
      graft.operators.ImageHash.videoNearDupPairs(fh, minJaccard = 0.5)
    },

    // Audio energy-delta fingerprint — the audio leg of the multimodal
    // dedup triple: WAV PCM through the codec seam, one bit per
    // adjacent-frame energy comparison (Σ s² per 16-sample frame,
    // integer-exact), so the oracle replays all 64 bits of every hash
    // from the sample formula.
    GQuery(
      "q349_audio_fingerprint",
      """WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 150),
        |e AS (SELECT doc_id, f,
        |        sum(((doc_id*31 + (f*16 + k)*7) % 2003 - 1001)
        |            * ((doc_id*31 + (f*16 + k)*7) % 2003 - 1001)) AS e
        |      FROM ids, UNNEST(range(65)) AS tf(f), UNNEST(range(16)) AS tk(k)
        |      GROUP BY doc_id, f),
        |bits AS (SELECT a.doc_id, a.f::INT AS bit
        |         FROM e a JOIN e b ON a.doc_id = b.doc_id AND b.f = a.f + 1
        |         WHERE b.e > a.e)
        |SELECT ids.doc_id,
        |       coalesce(sum(CASE WHEN bit = 63 THEN -9223372036854775808
        |                         ELSE (1::BIGINT << bit) END), 0)::BIGINT AS ahash
        |FROM ids LEFT JOIN bits ON ids.doc_id = bits.doc_id
        |GROUP BY ids.doc_id""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir).filter(col("doc_id") < 150)
        .select("doc_id")
      val mkWav = udf((id: Long) => graft.operators.MediaCodecs.encodeWav(8000,
        Array.tabulate[Short](65 * 16)(i =>
          ((id * 31 + i * 7) % 2003 - 1001).toShort)))
      graft.operators.AudioHash.aHashDf(
        docs.select(col("doc_id"), mkWav(col("doc_id")).as("audio")),
        "doc_id", "audio")
    },

    // Audio NEAR-DUP pairs: 150 clips + 150 twins with one frame's
    // samples shifted (ids +1000, frame 10 + 500) — a contour edit that
    // flips at most two comparisons. Spark pairs via the pigeonhole
    // banding; the oracle replays every fingerprint and brute-forces
    // ALL pair Hamming distances (the recall proof at audio
    // granularity).
    GQuery(
      "q350_audio_near_dup",
      """WITH ids AS (SELECT doc_id AS id FROM documents WHERE doc_id < 150
        |             UNION ALL
        |             SELECT doc_id + 1000 FROM documents WHERE doc_id < 150),
        |s AS (SELECT id, f, k,
        |        ((CASE WHEN id >= 1000 THEN id - 1000 ELSE id END)*31
        |          + (f*16 + k)*7) % 2003 - 1001
        |        + CASE WHEN id >= 1000 AND f = 10 THEN 500 ELSE 0 END AS v
        |      FROM ids, UNNEST(range(65)) AS tf(f), UNNEST(range(16)) AS tk(k)),
        |e AS (SELECT id, f, sum(v*v) AS e FROM s GROUP BY id, f),
        |bits AS (SELECT a.id, a.f::INT AS bit
        |         FROM e a JOIN e b ON a.id = b.id AND b.f = a.f + 1
        |         WHERE b.e > a.e),
        |h AS (SELECT ids.id,
        |        coalesce(sum(CASE WHEN bit = 63 THEN -9223372036854775808
        |                          ELSE (1::BIGINT << bit) END), 0)::BIGINT AS h
        |      FROM ids LEFT JOIN bits ON ids.id = bits.id GROUP BY ids.id)
        |SELECT a.id AS id_a, b.id AS id_b,
        |       bit_count(xor(a.h, b.h))::BIGINT AS hamming
        |FROM h a JOIN h b ON a.id < b.id
        |WHERE bit_count(xor(a.h, b.h)) <= 6""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir).filter(col("doc_id") < 150)
        .select(col("doc_id").as("id"))
      val ids = docs.unionByName(docs.select((col("id") + 1000).as("id")))
      val mkWav = udf((id: Long) => {
        val base = if (id >= 1000) id - 1000 else id
        graft.operators.MediaCodecs.encodeWav(8000,
          Array.tabulate[Short](65 * 16) { i =>
            val v = (base * 31 + i * 7) % 2003 - 1001
            (if (id >= 1000 && i / 16 == 10) v + 500 else v).toShort
          })
      })
      val hashes = graft.operators.AudioHash.aHashDf(
        ids.select(col("id"), mkWav(col("id")).as("audio")), "id", "audio")
      graft.operators.AudioHash.nearDupPairs(hashes, maxHamming = 6, chunks = 8)
    },

    // Crawl frontier scheduling: scored candidates minus the seen set,
    // capped per host (politeness, a KEYED window) then globally
    // budgeted (TakeOrdered bounded heap). Deterministic url tiebreaks
    // make the wave resumable; every selected row and its host_rank is
    // recomputable by the oracle.
    GQuery(
      "q351_crawl_frontier",
      """WITH cand AS (SELECT 'http://h' || (doc_id % 7) || '.test/p/' || doc_id AS url,
        |                     'h' || (doc_id % 7) || '.test' AS host,
        |                     (doc_id * 37) % 997 AS score
        |              FROM documents WHERE doc_id < 300),
        |seen AS (SELECT 'http://h' || (doc_id % 7) || '.test/p/' || doc_id AS url
        |         FROM documents WHERE doc_id < 300 AND doc_id % 5 = 0),
        |fresh AS (SELECT c.* FROM cand c LEFT JOIN seen s ON c.url = s.url
        |          WHERE s.url IS NULL),
        |ranked AS (SELECT url, host, score,
        |             row_number() OVER (PARTITION BY host
        |                                ORDER BY score DESC, url) AS host_rank
        |           FROM fresh)
        |SELECT url, host, score, host_rank::BIGINT AS host_rank
        |FROM ranked WHERE host_rank <= 10
        |ORDER BY score DESC, url LIMIT 40""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir).filter(col("doc_id") < 300)
      val cand = docs.select(
        concat(lit("http://h"), col("doc_id") % 7, lit(".test/p/"),
          col("doc_id")).as("url"),
        ((col("doc_id") * 37) % 997).as("score"))
      val seen = docs.filter(col("doc_id") % 5 === 0).select(
        concat(lit("http://h"), col("doc_id") % 7, lit(".test/p/"),
          col("doc_id")).as("url"))
      graft.operators.Frontier.select(cand, seen, perHost = 10, total = 40)
        .select(col("url"), col("host"), col("score"),
          col("host_rank").cast("long").as("host_rank"))
    },

    // Corpus-overlap card: trigram-vocabulary sharing between two source
    // slices via inclusion-exclusion over three HLL++ sketches — the
    // mixture/decontamination first-look at 100 TB (the exact
    // distinct-intersection join would shuffle two corpus-sized type
    // universes; here three fixed-size sketches cross the exchange).
    // Trigrams, not unigrams: the synthetic corpus saturates its token
    // inventory in every slice (any slice pair shares ~all unigrams —
    // a degenerate card), while the trigram universes genuinely differ
    // (jaccard ~0.02 at sf0.01). Output carries the exact counts (oracle
    // side) + the 5σ bound on the sketch estimate (q141/q71 discipline).
    GQuery(
      "q335_corpus_overlap",
      """WITH ga AS (SELECT DISTINCT array_to_string(toks[(i+1):(i+3)], ' ') AS g
        |            FROM (SELECT list_filter(string_split(lower(text), ' '),
        |                         x -> x != '') AS toks
        |                  FROM documents WHERE source = 'src1'),
        |                 UNNEST(range(len(toks) - 2)) AS t(i)),
        |gb AS (SELECT DISTINCT array_to_string(toks[(i+1):(i+3)], ' ') AS g
        |       FROM (SELECT list_filter(string_split(lower(text), ' '),
        |                    x -> x != '') AS toks
        |             FROM documents WHERE source = 'src2'),
        |            UNNEST(range(len(toks) - 2)) AS t(i)),
        |u AS (SELECT g FROM ga UNION SELECT g FROM gb)
        |SELECT (SELECT count(*) FROM ga) AS n_a,
        |       (SELECT count(*) FROM gb) AS n_b,
        |       (SELECT count(*) FROM u) AS n_union,
        |       (SELECT count(*) FROM ga) + (SELECT count(*) FROM gb)
        |         - (SELECT count(*) FROM u) AS n_intersect,
        |       round(((SELECT count(*) FROM ga) + (SELECT count(*) FROM gb)
        |         - (SELECT count(*) FROM u))::DOUBLE
        |         / (SELECT count(*) FROM u), 6) AS jaccard,
        |       true AS approx_in_bounds""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      graft.operators.Overlap.vocabOverlapCard(
        docs.filter(col("source") === "src1"),
        docs.filter(col("source") === "src2"), "text", n = 3)
    },

    // Signed feature-hashing doc embedding: a MODEL-FREE vector per doc
    // (dim j accumulates ±1 per token, sign = the low hash bit) —
    // integer-exact, so the oracle replays every coordinate from the
    // md5-60 contract. The cheap embedding that feeds the ANN family
    // before any model exists; one typed kernel pass per doc, no
    // token×dim explode, zero shuffle.
    GQuery(
      "q225_hashed_doc_embedding",
      s"""WITH tok AS (SELECT doc_id, unnest($duckToks) AS t FROM documents),
         |dj AS (SELECT doc_id, t, unnest(range(16)) AS j FROM tok),
         |s AS (SELECT doc_id, j::BIGINT AS dim,
         |        sum(CASE WHEN (('0x' || substr(md5(t || ':' || j::VARCHAR), 1, 15))::BIGINT & 1) = 1
         |                 THEN 1 ELSE -1 END)::BIGINT AS v
         |      FROM dj GROUP BY doc_id, j)
         |SELECT doc_id, dim, v FROM s""".stripMargin) { (s, dir) =>
      graft.operators.TfIdf.hashedEmbedding(
          Tables.documents(s, dir), "doc_id", "text", dim = 16)
        .select(col("doc_id"), posexplode(col("hvec")).as(Seq("dim", "v")))
        .select(col("doc_id"), col("dim").cast("long").as("dim"), col("v"))
    },

    // The model-free embedding RETRIEVES: cosine top-5 over the q225
    // hashed doc vectors (queries = first 10 docs) — exact-KNN's
    // broadcast+heap plan over integer-exact vectors, so the oracle can
    // replay the vectors, every distance and the (dist, id) ranking.
    // Closes the loop: hash-embed → ANN works before any model exists.
    GQuery(
      "q226_hashed_embedding_knn",
      s"""WITH tok AS (SELECT doc_id, unnest($duckToks) AS t FROM documents),
         |dj AS (SELECT doc_id, t, unnest(range(16)) AS j FROM tok),
         |s AS (SELECT doc_id, j,
         |        sum(CASE WHEN (('0x' || substr(md5(t || ':' || j::VARCHAR), 1, 15))::BIGINT & 1) = 1
         |                 THEN 1 ELSE -1 END)::DOUBLE AS v
         |      FROM dj GROUP BY doc_id, j),
         |dot AS (SELECT q.doc_id AS qid, b.doc_id AS nid,
         |          sum(q.v * b.v) AS d, sum(q.v * q.v) AS nq, sum(b.v * b.v) AS nb
         |        FROM s q JOIN s b ON q.j = b.j
         |        WHERE q.doc_id < 10 AND b.doc_id != q.doc_id
         |        GROUP BY q.doc_id, b.doc_id),
         |r AS (SELECT qid, nid,
         |        row_number() OVER (PARTITION BY qid ORDER BY
         |          CASE WHEN nq = 0 OR nb = 0 THEN 1.0
         |               ELSE 1.0 - d / (sqrt(nq) * sqrt(nb)) END, nid) AS rank
         |      FROM dot)
         |SELECT qid AS query_id, nid AS neighbor_id, rank
         |FROM r WHERE rank <= 5""".stripMargin) { (s, dir) =>
      val emb = graft.operators.TfIdf.hashedEmbedding(
          Tables.documents(s, dir), "doc_id", "text", dim = 16)
        .select(col("doc_id").as("vec_id"),
          col("hvec").cast("array<float>").as("embedding"))
      graft.operators.Knn.knn(emb.filter(col("vec_id") < 10), emb, k = 5,
          excludeSelf = true)
        .select(col("query_id"), col("neighbor_id"),
          col("rank").cast("long").as("rank"))
    },

    // ONE hard-EM (Viterbi-training) iteration of the unigram tokenizer
    // (the SentencePiece E/M pair, Viterbi variant): segment every vocab
    // word under the current round-6-quantized inventory — exact ties
    // break to the lexicographically smallest piece-LENGTH sequence —
    // count winning pieces occurrence-weighted, re-normalize. Unused
    // pieces drop out (the pruning that concentrates mass). Quantized
    // scores make every path sum the identical left-to-right double in
    // both engines, so the oracle replays the SELECTION by exhaustive
    // path enumeration with the same tie rule, then the counts and the
    // re-normalization.
    GQuery(
      "q224_unigram_hard_em",
      s"""WITH RECURSIVE
         |wc AS (SELECT word, count(*) AS cnt
         |       FROM (SELECT unnest($duckToks) AS word FROM documents)
         |       GROUP BY word),
         |pieces AS (SELECT piece, sum(cnt) AS pcnt FROM (
         |    SELECT cnt, unnest(flatten([
         |      list_transform(range(1, length(word) + 1), i -> substr(word, i, 1)),
         |      list_transform(range(1, greatest(0, length(word) - 1) + 1),
         |                     i -> substr(word, i, 2))
         |    ])) AS piece FROM wc) GROUP BY piece),
         |tot AS (SELECT sum(pcnt) AS t FROM pieces),
         |sc AS (SELECT piece, round(ln(pcnt / t), 6) AS score
         |       FROM pieces CROSS JOIN tot),
         |paths(word, pos, lenpath, pieces_s, score) AS (
         |  SELECT word, 0, '', '', 0.0::DOUBLE FROM wc
         |  UNION ALL
         |  SELECT p.word, p.pos + l.l, p.lenpath || l.l::VARCHAR,
         |         CASE WHEN p.pieces_s = '' THEN sc.piece
         |              ELSE p.pieces_s || '|' || sc.piece END,
         |         p.score + sc.score
         |  FROM paths p
         |  JOIN (SELECT 1 AS l UNION ALL SELECT 2) l ON p.pos + l.l <= length(p.word)
         |  JOIN sc ON sc.piece = substr(p.word, p.pos + 1, l.l)),
         |best AS (SELECT word, pieces_s FROM (
         |    SELECT word, pieces_s,
         |           row_number() OVER (PARTITION BY word
         |             ORDER BY score DESC, lenpath) AS rn
         |    FROM paths WHERE pos = length(word)) WHERE rn = 1),
         |used AS (SELECT b.word, unnest(string_split(b.pieces_s, '|')) AS piece
         |         FROM best b),
         |c2 AS (SELECT u.piece, sum(wc.cnt)::BIGINT AS em_cnt
         |       FROM used u JOIN wc ON wc.word = u.word GROUP BY u.piece),
         |t2 AS (SELECT sum(em_cnt) AS t FROM c2)
         |SELECT piece, em_cnt, round(ln(em_cnt / t), 6) AS new_score
         |FROM c2 CROSS JOIN t2""".stripMargin) { (s, dir) =>
      graft.operators.UnigramSeg.hardEmIteration(
        Tables.documents(s, dir), "text")
    },

    // Heaps'-law vocabulary-growth fit: V(N) ~ K·N^beta over the corpus
    // in doc-id order — the companion card to the q185 Zipf fit ("how
    // fast does everything vocab-keyed grow as this corpus scales?").
    // Window-free: per-doc token and new-type counts are aggregates,
    // both running totals are range-shuffle prefix sums, the log-log
    // regression is one closed-form aggregate. The oracle replays the
    // windows and the regression.
    GQuery(
      "q212_heaps_fit",
      """WITH t AS (SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '),
        |             x -> x != '')) AS term FROM documents),
        |n AS (SELECT d.doc_id, coalesce(c.n, 0) AS n
        |      FROM documents d LEFT JOIN
        |        (SELECT doc_id, count(*) AS n FROM t GROUP BY doc_id) c USING (doc_id)),
        |f AS (SELECT term, min(doc_id) AS fd FROM t GROUP BY term),
        |v AS (SELECT d.doc_id, coalesce(x.v, 0) AS v
        |      FROM documents d LEFT JOIN
        |        (SELECT fd AS doc_id, count(*) AS v FROM f GROUP BY fd) x USING (doc_id)),
        |c AS (SELECT n.doc_id,
        |        sum(n.n) OVER (ORDER BY n.doc_id) AS bigN,
        |        sum(v.v) OVER (ORDER BY n.doc_id) AS bigV
        |      FROM n JOIN v ON n.doc_id = v.doc_id),
        |x AS (SELECT ln(bigN::DOUBLE) AS lx, ln(bigV::DOUBLE) AS ly
        |      FROM c WHERE bigN > 0 AND bigV > 0)
        |SELECT count(*) AS n_points,
        |       round(covar_pop(ly, lx) / var_pop(lx), 6) AS beta,
        |       round(avg(ly) - covar_pop(ly, lx) / var_pop(lx) * avg(lx), 6) AS log_k
        |FROM x""".stripMargin) { (s, dir) =>
      graft.operators.Heaps.heapsFit(Tables.documents(s, dir), "doc_id", "text")
    },

    // WordPiece greedy segmentation over the corpus's distinct words —
    // the third segmenter of the tokenizer family (BPE: merge-ranked;
    // unigram: Viterbi-optimal; WordPiece: longest-match greedy with ##
    // continuations). Vocabulary is corpus-derived and bounded (all
    // single chars + the ≥2-count 2-grams per position class), broadcast;
    // the walk runs map-side over distinct words only. Greedy is a
    // single-successor relation, so the oracle materializes the
    // per-(word, pos) choice and follows it with a recursive CTE — no
    // argmax inside the recursion.
    GQuery(
      "q209_wordpiece",
      """WITH RECURSIVE
        |w AS (SELECT DISTINCT unnest(list_filter(string_split(lower(text), ' '),
        |        x -> x != '')) AS word FROM documents),
        |pos AS (SELECT word, unnest(range(len(word))) AS p FROM w),
        |big AS (SELECT word, p, substr(word, p + 1, 2) AS s
        |        FROM pos WHERE p + 2 <= len(word)),
        |vinit AS (SELECT s FROM big WHERE p = 0 GROUP BY s HAVING count(*) >= 2),
        |vcont AS (SELECT s FROM big WHERE p > 0 GROUP BY s HAVING count(*) >= 2),
        |g AS (SELECT pos.word, pos.p,
        |        CASE WHEN p + 2 <= len(word)
        |              AND ((p = 0 AND substr(word, p+1, 2) IN (SELECT s FROM vinit))
        |                OR (p > 0 AND substr(word, p+1, 2) IN (SELECT s FROM vcont)))
        |             THEN 2 ELSE 1 END AS l
        |      FROM pos),
        |walk AS (
        |  SELECT word, 0 AS p, 0 AS idx FROM w
        |  UNION ALL
        |  SELECT walk.word, walk.p + g.l, walk.idx + 1
        |  FROM walk JOIN g ON g.word = walk.word AND g.p = walk.p
        |  WHERE walk.p + g.l < len(walk.word))
        |SELECT walk.word, walk.idx::BIGINT AS idx,
        |       CASE WHEN walk.p = 0 THEN substr(walk.word, 1, g.l)
        |            ELSE '##' || substr(walk.word, walk.p + 1, g.l) END AS piece
        |FROM walk JOIN g ON g.word = walk.word AND g.p = walk.p""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val vocab = graft.operators.WordPiece.vocabFromCorpus(docs, "text",
        maxLen = 2, minCount = 2)
      graft.operators.WordPiece.encodeWords(docs, "text", vocab, maxLen = 2)
        .select(col("word"), col("idx").cast("long").as("idx"), col("piece"))
    },

    // BLOCKLIST tagging (Aho-Corasick): per-doc overlapping occurrence
    // counts for a multi-term literal list in ONE pass per document —
    // O(len + hits) independent of |terms|, vs the O(len·terms) per-term
    // scan the oracle replays (the cross-join + position-scan form is the
    // semantics spec; the automaton is the scale path). "slow fast" pins
    // cross-word substring matching.
    GQuery(
      "q252_blocklist_tags",
      """WITH terms AS (SELECT unnest(['table', 'spark', 'slow fast', 'customer', 'vector']) AS term),
        |m AS (SELECT d.doc_id, t.term,
        |        len(list_filter(range(1, length(lower(d.text)) - length(t.term) + 2),
        |            i -> substr(lower(d.text), i::INT, length(t.term)::INT) = t.term)) AS n
        |      FROM documents d CROSS JOIN terms t)
        |SELECT doc_id, term, n::BIGINT AS n_hits FROM m WHERE n > 0""".stripMargin) {
      (s, dir) =>
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), lower(col("text")).as("text"))
      graft.operators.Blocklist.tagMatches(docs, "doc_id", "text",
          Seq("table", "spark", "slow fast", "customer", "vector"))
        .select(col("id").as("doc_id"), col("term"), col("n_hits"))
    },

    // Blocklist GATE: the per-doc rollup a filter stage reads — total and
    // distinct hits over ALL docs (zero-hit docs surface with zeros) plus
    // the gate verdict at a hit budget.
    GQuery(
      "q253_blocklist_gate",
      """WITH terms AS (SELECT unnest(['table', 'spark', 'slow fast', 'customer', 'vector']) AS term),
        |m AS (SELECT d.doc_id, t.term,
        |        len(list_filter(range(1, length(lower(d.text)) - length(t.term) + 2),
        |            i -> substr(lower(d.text), i::INT, length(t.term)::INT) = t.term)) AS n
        |      FROM documents d CROSS JOIN terms t),
        |r AS (SELECT doc_id,
        |        coalesce(sum(CASE WHEN n > 0 THEN n END), 0)::BIGINT AS total_hits,
        |        coalesce(sum(CASE WHEN n > 0 THEN 1 END), 0)::BIGINT AS distinct_terms
        |      FROM m GROUP BY doc_id)
        |SELECT doc_id, total_hits, distinct_terms,
        |       total_hits >= 8 AS blocked
        |FROM r""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), lower(col("text")).as("text"))
      graft.operators.Blocklist.hitCounts(docs, "doc_id", "text",
          Seq("table", "spark", "slow fast", "customer", "vector"))
        .select(col("id").as("doc_id"), col("total_hits"),
          col("distinct_terms"), (col("total_hits") >= 8).as("blocked"))
    },

    // CROSS-GROUP QUANTILE NORMALIZATION: each doc's length score mapped
    // onto the GLOBAL score distribution at its within-language percent
    // rank — after this, the p-th longest doc of EVERY language carries
    // the same score, so one global threshold treats languages fairly
    // (incomparable per-group scorer scales are the curation problem this
    // solves). The oracle replays grouped percent rank, the global sorted
    // lookup position and the join.
    GQuery(
      "q259_quantile_normalize",
      """WITH s AS (SELECT doc_id, lang,
        |             len(list_filter(string_split(lower(text), ' '), x -> x != ''))::BIGINT AS score
        |           FROM documents),
        |n AS (SELECT count(*) AS nn FROM s),
        |p AS (SELECT doc_id, lang, score,
        |        round(percent_rank() OVER (PARTITION BY lang ORDER BY score, doc_id), 6) AS pr
        |      FROM s),
        |g AS (SELECT score, row_number() OVER (ORDER BY score, doc_id) AS r FROM s),
        |ps AS (SELECT p.doc_id, p.lang, p.score,
        |              (round(p.pr * (n.nn - 1)) + 1)::BIGINT AS gpos
        |       FROM p CROSS JOIN n)
        |SELECT ps.doc_id, ps.lang, ps.score, g.score AS norm_score
        |FROM ps JOIN g ON g.r = ps.gpos""".stripMargin) { (s, dir) =>
      val scored = Tables.documents(s, dir).select(col("doc_id"), col("lang"),
        size(graft.functions.TextFunctions.tokens(lower(col("text"))))
          .cast("long").as("score"))
      graft.operators.Ranking.quantileNormalize(scored, "lang", "score", "doc_id")
        .select("doc_id", "lang", "score", "norm_score")
    },

    // PMI collocations: adjacent-bigram pointwise mutual information over
    // exact integer counts (the only fp is one fixed expression tree per
    // pair) — high-PMI high-count pairs are glued/templated phrases, the
    // corpus-health signal boilerplate detection reads. Top-20 by PMI via
    // a bounded TakeOrdered; the oracle replays counts, the PMI tree and
    // the cut (parallel-unnest zip = the adjacent pairing).
    GQuery(
      "q262_pmi_collocations",
      """WITH tk AS (SELECT list_filter(string_split(lower(text), ' '), x -> x != '') AS t
        |            FROM documents),
        |un AS (SELECT unnest(t) AS w FROM tk),
        |uni AS (SELECT w, count(*) AS c FROM un GROUP BY w),
        |nu AS (SELECT count(*) AS nu FROM un),
        |bg AS (SELECT unnest(t[1:len(t)-1]) AS w1, unnest(t[2:len(t)]) AS w2
        |       FROM tk WHERE len(t) >= 2),
        |nb AS (SELECT count(*) AS nb FROM bg),
        |bi AS (SELECT w1, w2, count(*) AS c_ab FROM bg GROUP BY w1, w2
        |       HAVING count(*) >= 30),
        |j AS (SELECT bi.w1, bi.w2, bi.c_ab, ua.c AS c_a, ub.c AS c_b
        |      FROM bi JOIN uni ua ON ua.w = bi.w1 JOIN uni ub ON ub.w = bi.w2),
        |p AS (SELECT w1, w2, c_ab,
        |        ln((c_ab::DOUBLE * nu.nu * nu.nu) / (nb.nb::DOUBLE * c_a * c_b)) AS pmi
        |      FROM j CROSS JOIN nu CROSS JOIN nb)
        |SELECT w1, w2, c_ab, round(pmi, 6) AS pmi
        |FROM p ORDER BY pmi DESC, w1, w2 LIMIT 20""".stripMargin) { (s, dir) =>
      graft.operators.TfIdf.pmiCollocations(
        Tables.documents(s, dir), "text", minCount = 30L, topK = 20)
    },

    // MIXED-LANGUAGE (code-switching) card: chunk each doc into
    // non-overlapping 32-token windows, langid each chunk, roll up per doc
    // (chunk count, distinct predicted languages, dominant language with a
    // deterministic count-then-lexicographic tie rule, mixed flag) — the
    // signal a per-DOC langid misses when documents code-switch. The
    // oracle replays chunking (q106's arithmetic at overlap 0), the q42
    // langid CASE per chunk, and the argmax-with-ties rollup.
    GQuery(
      "q266_mixed_language_card",
      """WITH t AS (SELECT doc_id,
        |                  list_filter(string_split(text, ' '), x -> x != '') AS toks
        |           FROM documents),
        |i AS (SELECT doc_id, toks,
        |             unnest(range((len(toks) - 1) // 32 + 1)) AS ci
        |      FROM t WHERE len(toks) > 0),
        |ch AS (SELECT doc_id, ci,
        |              array_to_string(toks[(ci*32 + 1):least(len(toks), ci*32 + 32)], ' ') AS chunk
        |       FROM i),
        |cl AS (SELECT doc_id, ci, CASE
        |         WHEN len(regexp_extract_all(lower(chunk), '[\x{4e00}-\x{9fff}]')) > 0 THEN 'zh'
        |         WHEN greatest(en_s, de_s, fr_s, es_s) = 0 THEN 'und'
        |         WHEN en_s = greatest(en_s, de_s, fr_s, es_s) THEN 'en'
        |         WHEN de_s = greatest(en_s, de_s, fr_s, es_s) THEN 'de'
        |         WHEN fr_s = greatest(en_s, de_s, fr_s, es_s) THEN 'fr'
        |         ELSE 'es' END AS cl
        |       FROM (
        |         SELECT doc_id, ci, chunk,
        |           len(regexp_extract_all(lower(chunk), '\b(the|and|is|of)\b')) AS en_s,
        |           len(regexp_extract_all(lower(chunk), '\b(der|und|die|nicht)\b')) AS de_s,
        |           len(regexp_extract_all(lower(chunk), '\b(le|et|les|est)\b')) AS fr_s,
        |           len(regexp_extract_all(lower(chunk), '\b(el|los|es|una)\b')) AS es_s
        |         FROM ch)),
        |cnt AS (SELECT doc_id, cl, count(*) AS n FROM cl GROUP BY doc_id, cl),
        |mx AS (SELECT doc_id, max(n) AS mn FROM cnt GROUP BY doc_id),
        |dom AS (SELECT cnt.doc_id, min(cnt.cl) AS dominant_lang
        |        FROM cnt JOIN mx ON mx.doc_id = cnt.doc_id AND cnt.n = mx.mn
        |        GROUP BY cnt.doc_id)
        |SELECT cl.doc_id, count(*) AS n_chunks,
        |       count(DISTINCT cl.cl) AS n_langs,
        |       any_value(dom.dominant_lang) AS dominant_lang,
        |       count(DISTINCT cl.cl) > 1 AS mixed
        |FROM cl JOIN dom ON dom.doc_id = cl.doc_id
        |GROUP BY cl.doc_id""".stripMargin) { (s, dir) =>
      import graft.functions.TextFunctions
      val chunks = TextFunctions.chunkByTokens(Tables.documents(s, dir),
          "doc_id", "text", maxTokens = 32, overlap = 0)
        .select(col("doc_id"), TextFunctions.langId(col("chunk")).as("cl"))
      val cnt = chunks.groupBy("doc_id", "cl").agg(count(lit(1)).as("n"))
      val mx = cnt.groupBy("doc_id").agg(max("n").as("mn"))
      val dom = cnt.join(mx, "doc_id").filter(col("n") === col("mn"))
        .groupBy("doc_id").agg(min("cl").as("dominant_lang"))
      chunks.groupBy("doc_id")
        .agg(count(lit(1)).as("n_chunks"),
          count_distinct(col("cl")).as("n_langs"))
        .join(dom, "doc_id")
        .select(col("doc_id"), col("n_chunks"), col("n_langs"),
          col("dominant_lang"), (col("n_langs") > 1).as("mixed"))
    },

    // The crawl loop LIVE: two deterministic waves against a loopback
    // HTTP server — frontier (crawl-delay-budgeted politeness) → real
    // HTTP fetch → distributed WARC shard write → file-parallel read →
    // link extraction → robots filter → NEXT frontier wave. Every stage
    // is the production operator; the oracle is the hand-derived crawl
    // trace (seeds from the live sitemap, /private/* blocked by the live
    // robots.txt, the wave-2 budget of 3 = floor(6s / Crawl-delay 2s)
    // dropping the 4th candidate, duplicate discoveries of /p/2 from two
    // pages occupying ONE slot).
    GQuery(
      "q352_crawl_loop_live",
      """SELECT wave::BIGINT AS wave, path, ok FROM (VALUES
        |  (1, '/p/0', true), (1, '/p/1', true),
        |  (2, '/p/2', true), (2, '/p/3', true), (2, '/p/4', true))
        |  t(wave, path, ok)""".stripMargin) { (s, dir) =>
      import s.implicits._
      val tag = s"c${System.nanoTime()}"
      val base = s"${tmpDir()}/live-$tag"
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(base))
      def put(name: String, content: String): String = {
        val p = java.nio.file.Paths.get(s"$base/$name")
        java.nio.file.Files.write(p,
          content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        p.toString
      }
      // a 7-page site: page N links its tree children 2N+1/2N+2, a promo
      // to /p/2 (duplicate discovery), a robots-blocked /private/N; page
      // 1 also promotes /p/5 (the candidate the wave-2 budget drops)
      def page(n: Int): String = {
        val kids = Seq(2 * n + 1, 2 * n + 2).filter(_ <= 6)
          .map(k => s"""<a href="/$tag/p/$k">child $k</a>""").mkString(" ")
        val extra = if (n == 1) s"""<a href="/$tag/p/5">promo5</a>""" else ""
        s"""<html><head><title>p $n</title></head><body>
           |<p>page $n content</p>$kids
           |<a href="/$tag/p/2">promo</a>$extra
           |<a href="/$tag/private/$n">secret</a></body></html>""".stripMargin
      }
      val pageUrls = (0 to 6).map { n =>
        graft.operators.HttpFixture.serveAt(s"$tag/p/$n",
          put(s"p$n.html", page(n)))
      }
      val ep = graft.operators.HttpFixture.endpoint()
      val host = ep.stripPrefix("http://")
      val robotsUrl = graft.operators.HttpFixture.serveAt(s"$tag/robots.txt",
        put("robots.txt",
          "User-agent: *\nDisallow: */private/\nCrawl-delay: 2\n"))
      val sitemapUrl = graft.operators.HttpFixture.serveAt(s"$tag/sitemap.xml",
        put("sitemap.xml", "<urlset>" + (0 to 2).map(n =>
          s"<url><loc>$ep/$tag/p/$n</loc></url>").mkString + "</urlset>"))
      require(pageUrls.head == s"$ep/$tag/p/0", "fixture URL layout")
      // the distributed fetch kernel (executor-side HTTP GET)
      val fetch = udf((u: String) => {
        val conn = new java.net.URL(u).openConnection()
          .asInstanceOf[java.net.HttpURLConnection]
        conn.setConnectTimeout(5000)
        conn.setReadTimeout(5000)
        val in = conn.getInputStream
        try new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8)
        finally { in.close(); conn.disconnect() }
      })
      // live compliance surface: robots rules + crawl-delay compiled once
      val robotsTable = Seq((host, robotsUrl)).toDF("host", "robots_url")
        .select(col("host"), fetch(col("robots_url")).as("robots_txt"))
      val compiled = graft.operators.RobotsTxt.compileRules(robotsTable, "graftbot")
      val delays = graft.operators.RobotsTxt.compileDelays(robotsTable, "graftbot")
      // seeds from the live sitemap
      val seeds = graft.operators.Sitemaps.extract(
          Seq((host, sitemapUrl)).toDF("host", "xml_url")
            .select(col("host"), fetch(col("xml_url")).as("xml")),
          "host", "xml")
        .select(col("loc").as("url"), lit(1L).as("score"))
      def crawlWave(urls: org.apache.spark.sql.DataFrame, dir: String) = {
        val fetched = urls.select(col("url"), fetch(col("url")).as("payload"))
        graft.sources.WarcIO.writeShards(fetched.repartition(2), dir)
        graft.sources.WarcIO.read(s, dir)
      }
      // wave 1: Crawl-delay 2s over a 4s wave = 2 fetches (of 3 seeds)
      val empty = Seq.empty[String].toDF("url")
      val wave1 = graft.operators.Frontier.select(seeds, empty,
        perHost = 5, total = 5, hostDelays = Some(delays), waveSeconds = 4.0)
      val w1 = crawlWave(wave1.select("url"), s"$base/w1")
      // discovered links -> robots filter -> wave 2 (budget 3 = floor(6/2))
      val links = graft.operators.LinkExtract.extract(
        w1.select(col("url").as("page_url"), col("text").as("html")),
        "page_url", "html", "page_url")
      val cand = links.select(col("link").as("url"), lit(1L).as("score"))
      val allowed = graft.operators.RobotsTxt.filterAllowed(cand, compiled)
        .filter(col("allowed")).drop("allowed")
      val wave2 = graft.operators.Frontier.select(allowed, wave1.select("url"),
        perHost = 5, total = 5, hostDelays = Some(delays), waveSeconds = 6.0)
      val w2 = crawlWave(wave2.select("url"), s"$base/w2")
      def waveRows(w: org.apache.spark.sql.DataFrame, wave: Long) =
        w.select(lit(wave).as("wave"),
          regexp_extract(col("url"), "(/p/\\d+)$", 1).as("path"),
          contains(col("text"), concat(lit("page "),
            regexp_extract(col("url"), "/p/(\\d+)$", 1),
            lit(" content"))).as("ok"))
      waveRows(w1, 1L).unionByName(waveRows(w2, 2L))
    },

    // Compressed-audio metadata probe: MPEG-1 Layer III frame-header walk
    // (public spec, header-only — decode stays on the documented stub).
    // The fixture is a synthesized silent CBR stream, so the oracle
    // replays every field from the generation formula: duration is
    // frames x 1152 / 44100 (integer-exact), bitrate/channels from the
    // id arithmetic. Per-row map, zero shuffle.
    GQuery(
      "q353_mp3_probe",
      """SELECT doc_id, 'mp3' AS container, 'mp3' AS codec,
        |  ((20 + doc_id % 10) * 1152 * 1000) // 44100 AS duration_ms,
        |  44100 AS sample_rate,
        |  (CASE WHEN doc_id % 2 = 0 THEN 2 ELSE 1 END)::INT AS channels,
        |  (CASE doc_id % 4 WHEN 0 THEN 64 WHEN 1 THEN 96 WHEN 2 THEN 128
        |        ELSE 160 END)::INT AS bitrate_kbps,
        |  0::INT AS width, 0::INT AS height
        |FROM documents WHERE doc_id < 200""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir).filter(col("doc_id") < 200)
        .select("doc_id")
      val rates = Array(64, 96, 128, 160)
      val mk = udf((id: Long) => MediaCodecs.encodeMp3Silence(
        nFrames = (20 + id % 10).toInt,
        bitrateKbps = rates((id % 4).toInt),
        sampleRate = 44100,
        channels = if (id % 2 == 0) 2 else 1))
      Multimodal.mediaProbe(
        docs.select(col("doc_id"), mk(col("doc_id")).as("bytes")),
        "doc_id", "bytes")
    },

    // Compressed-video metadata probe: ISO BMFF box walk (ftyp brand,
    // moov/mvhd timescale+duration, trak/tkhd 16.16 dimensions) — no
    // sample data exists or is touched. Every field replayed by the
    // oracle from the id arithmetic (timescale 1000 makes duration_ms
    // round-trip exactly).
    GQuery(
      "q354_mp4_probe",
      """SELECT doc_id, 'mp4' AS container,
        |  CASE WHEN doc_id % 2 = 0 THEN 'isom' ELSE 'mp42' END AS codec,
        |  1000 + (doc_id * 37) % 9000 AS duration_ms,
        |  0::INT AS sample_rate, 0::INT AS channels, 0::INT AS bitrate_kbps,
        |  (160 + (doc_id % 8) * 16)::INT AS width,
        |  (96 + (doc_id % 5) * 24)::INT AS height
        |FROM documents WHERE doc_id < 200""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir).filter(col("doc_id") < 200)
        .select("doc_id")
      val mk = udf((id: Long) => MediaCodecs.encodeMp4Stub(
        durationMs = 1000 + (id * 37) % 9000,
        width = (160 + (id % 8) * 16).toInt,
        height = (96 + (id % 5) * 24).toInt,
        brand = if (id % 2 == 0) "isom" else "mp42"))
      Multimodal.mediaProbe(
        docs.select(col("doc_id"), mk(col("doc_id")).as("bytes")),
        "doc_id", "bytes")
    },

    // Sharded CDX index — Common Crawl's own layout: the index
    // range-partitions by urlkey into sorted gzipped shards plus a
    // driver-side cluster.idx, then reads back file-parallel. Also pins
    // the ISO 28500 writer conformance upgrade: every record now carries
    // a caller-supplied WARC-Date (month varies by doc), and the CDX
    // timestamp is its 14-digit form — not the epoch zero-pad.
    GQuery(
      "q355_cdx_sharded",
      """SELECT doc_id,
        |  'test,corpus)/doc/' || doc_id AS urlkey,
        |  '20260' || (doc_id % 8 + 1) || '15000000' AS timestamp,
        |  'text/html' AS mime
        |FROM documents WHERE doc_id < 250""".stripMargin) { (s, dir) =>
      val base = s"${tmpDir()}/cdxshard-${System.nanoTime()}"
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(base))
      val docs = Tables.documents(s, dir).filter(col("doc_id") < 250)
      val pages = docs.select(
        concat(lit("http://corpus.test/doc/"), col("doc_id")).as("url"),
        concat(lit("<html><body><p>"), col("text"), lit("</p></body></html>"))
          .as("payload"),
        concat(lit("2026-0"), col("doc_id") % 8 + 1, lit("-15T00:00:00Z"))
          .as("warc_date"))
      graft.sources.WarcIO.writeShards(pages.repartition(3), s"$base/warc",
        dateCol = Some("warc_date"))
      val idx = graft.sources.CdxIO.index(s, s"$base/warc")
      graft.sources.CdxIO.writeCdxjShards(idx, s"$base/cdx", shards = 4)
      graft.sources.CdxIO.readCdxjShards(s, s"$base/cdx")
        .select(regexp_extract(col("url"), "/doc/(\\d+)$", 1)
          .cast("long").as("doc_id"),
          col("urlkey"), col("timestamp"), col("mime"))
    },

    // Shard-pruned index lookup — the 100 TB point-read path end to end:
    // a key set (every 10th doc, the takedown-list shape) probes
    // cluster.idx driver-side, ONLY the covering sorted shards are read,
    // and the hits chase through the coalesced byte-range fetch into the
    // WARC — so neither the index nor the corpus is ever scanned.
    // Extraction equality against the original text proves the whole
    // chain (surt key arithmetic, cluster ranges, shard filter, offsets).
    GQuery(
      "q356_cdx_pruned_lookup",
      """SELECT doc_id, text FROM documents
        |WHERE doc_id < 200 AND doc_id % 10 = 0""".stripMargin) { (s, dir) =>
      val base = s"${tmpDir()}/cdxlkp-${System.nanoTime()}"
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(base))
      val docs = Tables.documents(s, dir).filter(col("doc_id") < 200)
      val pages = docs.select(
        concat(lit("http://corpus.test/doc/"), col("doc_id")).as("url"),
        concat(
          lit("<html><head><title>Page</title></head><body><nav>" +
            "<a href=\"/\">Home</a></nav><p>"),
          col("text"),
          lit("</p><footer>(c) corp</footer></body></html>")).as("payload"))
      graft.sources.WarcIO.writeShards(pages.repartition(3), s"$base/warc")
      graft.sources.CdxIO.writeCdxjShards(
        graft.sources.CdxIO.index(s, s"$base/warc"), s"$base/cdx", shards = 5)
      val keys = (0 until 200 by 10).map(i => s"test,corpus)/doc/$i")
      val hits = graft.sources.CdxIO.lookupKeys(s, s"$base/cdx", keys)
      val recs = graft.sources.CdxIO.fetchRecords(hits)
        .select(regexp_extract(col("url"), "/doc/(\\d+)$", 1)
          .cast("long").as("doc_id"), col("text").as("html"))
      graft.operators.HtmlExtract.extract(recs, "doc_id", "html")
    },

    // Multimodal describe card over a MIXED corpus (MP3 in both MPEG-1
    // and MPEG-2 framing, MP4, WAV, and junk that quarantines to the
    // null-container row): one aggregate over the header-only probes —
    // the first look a 100 TB media corpus gets, payload bytes never
    // crossing an exchange. Every aggregate is replayed by the oracle
    // from the synthesis arithmetic (MP3 duration via the per-frame
    // floor(samples*1e6/rate) microsecond accumulation, identical for
    // 1152/44100 and 576/22050).
    GQuery(
      "q357_media_card",
      """WITH m AS (SELECT doc_id,
        |  CASE doc_id % 4 WHEN 0 THEN 'mp3' WHEN 1 THEN 'mp4'
        |       WHEN 2 THEN 'wav' ELSE NULL END AS container,
        |  CASE doc_id % 4 WHEN 0 THEN 'mp3' WHEN 1 THEN 'mp42'
        |       WHEN 2 THEN 'pcm_s16le' ELSE NULL END AS codec,
        |  CASE doc_id % 4
        |    WHEN 0 THEN ((20 + doc_id % 10) * 26122) // 1000
        |    WHEN 1 THEN 1000 + (doc_id * 37) % 9000
        |    WHEN 2 THEN 100 + (doc_id % 5) * 10
        |    ELSE NULL END AS duration_ms,
        |  CASE doc_id % 4 WHEN 1 THEN (160 + (doc_id % 8) * 16)::INT
        |       WHEN 3 THEN NULL ELSE 0::INT END AS width,
        |  CASE doc_id % 4 WHEN 1 THEN (96 + (doc_id % 5) * 24)::INT
        |       WHEN 3 THEN NULL ELSE 0::INT END AS height
        |  FROM documents WHERE doc_id < 200)
        |SELECT container, count(*) AS n,
        |  count(DISTINCT codec) AS n_codecs,
        |  sum(duration_ms)::BIGINT AS total_duration_ms,
        |  max(duration_ms)::BIGINT AS max_duration_ms,
        |  max(width) AS max_width, max(height) AS max_height
        |FROM m GROUP BY container""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir).filter(col("doc_id") < 200)
        .select("doc_id")
      val mk = udf((id: Long) => ((id % 4) match {
        case 0 => MediaCodecs.encodeMp3Silence((20 + id % 10).toInt, 128,
          sampleRate = if (id % 8 == 0) 44100 else 22050,
          version = if (id % 8 == 0) 1 else 2)
        case 1 => MediaCodecs.encodeMp4Stub(1000 + (id * 37) % 9000,
          (160 + (id % 8) * 16).toInt, (96 + (id % 5) * 24).toInt, "mp42")
        case 2 => MediaCodecs.encodeWav(8000,
          new Array[Short]((800 + (id % 5) * 80).toInt))
        case _ => s"just text $id".getBytes("UTF-8")
      }): Array[Byte])
      Multimodal.mediaCard(
        docs.select(col("doc_id"), mk(col("doc_id")).as("bytes")),
        "doc_id", "bytes")
    },

    // Frontier RECRAWL: the seen-set carries last-fetch times and only
    // RECENTLY-fetched URLs stay excluded — pages fetched before the
    // recrawl horizon rejoin the pool (a continuous crawl refreshes;
    // a grow-only seen set never would). now/horizon are explicit
    // inputs, so the wave is deterministic and the oracle replays the
    // whole schedule including per-host ranks.
    GQuery(
      "q358_frontier_recrawl",
      """WITH cand AS (SELECT 'http://h' || (doc_id % 5) || '.test/p/' || doc_id AS url,
        |                     'h' || (doc_id % 5) || '.test' AS host,
        |                     (doc_id * 13) % 97 AS score
        |              FROM documents WHERE doc_id < 240),
        |seen AS (SELECT 'http://h' || (doc_id % 5) || '.test/p/' || doc_id AS url,
        |                1000 + doc_id AS fetched_at
        |         FROM documents WHERE doc_id < 240 AND doc_id % 3 = 0),
        |fresh AS (SELECT c.* FROM cand c
        |          LEFT JOIN (SELECT url FROM seen WHERE fetched_at > 1200 - 150) s
        |            ON c.url = s.url
        |          WHERE s.url IS NULL),
        |ranked AS (SELECT url, host, score,
        |             row_number() OVER (PARTITION BY host
        |                                ORDER BY score DESC, url) AS host_rank
        |           FROM fresh)
        |SELECT url, host, score, host_rank::BIGINT AS host_rank
        |FROM ranked WHERE host_rank <= 8
        |ORDER BY score DESC, url LIMIT 30""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir).filter(col("doc_id") < 240)
      val cand = docs.select(
        concat(lit("http://h"), col("doc_id") % 5, lit(".test/p/"),
          col("doc_id")).as("url"),
        ((col("doc_id") * 13) % 97).as("score"))
      val seen = docs.filter(col("doc_id") % 3 === 0).select(
        concat(lit("http://h"), col("doc_id") % 5, lit(".test/p/"),
          col("doc_id")).as("url"),
        (lit(1000) + col("doc_id")).as("fetched_at"))
      graft.operators.Frontier.selectWithRecrawl(cand, seen,
          perHost = 8, total = 30, nowSeconds = 1200L,
          recrawlAfterSeconds = 150L)
        .select(col("url"), col("host"), col("score"),
          col("host_rank").cast("long").as("host_rank"))
    },

    // Cross-crawl payload dedup via ISO 28500 `revisit` records: the
    // current crawl's payloads digest-join against the PREVIOUS crawl's
    // CDX index; matched fetches persist as zero-payload revisit records
    // pointing at the prior capture, new pages as full responses. The
    // oracle replays which third of the corpus re-fetched unchanged
    // (doc_id % 3 = 0 keeps its old payload; the rest changed or are
    // new), and the read-back proves revisits carry no body bytes.
    GQuery(
      "q359_warc_revisit_dedup",
      """SELECT doc_id,
        |  CASE WHEN doc_id < 150 AND doc_id % 3 = 0
        |       THEN 'revisit' ELSE 'response' END AS warc_type,
        |  CASE WHEN doc_id < 150 AND doc_id % 3 = 0 THEN ''
        |       WHEN doc_id < 150 THEN '<p>v2 ' || text || '</p>'
        |       ELSE '<p>' || text || '</p>' END AS body
        |FROM documents WHERE doc_id < 200""".stripMargin) { (s, dir) =>
      val base = s"${tmpDir()}/revisit-${System.nanoTime()}"
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(base))
      val docs = Tables.documents(s, dir)
      // previous crawl: docs 0..149, payload v1
      val prev = docs.filter(col("doc_id") < 150).select(
        concat(lit("http://corpus.test/doc/"), col("doc_id")).as("url"),
        concat(lit("<p>"), col("text"), lit("</p>")).as("payload"))
      graft.sources.WarcIO.writeShards(prev.repartition(2), s"$base/prev")
      val prevIdx = graft.sources.CdxIO.index(s, s"$base/prev")
      // current crawl: docs 0..199; every 3rd old page is UNCHANGED
      // (identical payload -> revisit), the others changed (v2) or are new
      val cur = docs.filter(col("doc_id") < 200).select(
        concat(lit("http://corpus.test/doc/"), col("doc_id")).as("url"),
        when(col("doc_id") < 150 && col("doc_id") % 3 =!= 0,
          concat(lit("<p>v2 "), col("text"), lit("</p>")))
          .otherwise(concat(lit("<p>"), col("text"), lit("</p>")))
          .as("payload"))
      val receipt = graft.sources.WarcIO.writeShardsWithRevisits(
        cur.repartition(3), s"$base/cur", prevIdx)
      require(receipt.agg(sum(col("revisits"))).head.getLong(0) == 50L,
        "every unchanged re-fetch must dedup to a revisit record")
      graft.sources.WarcIO.read(s, s"$base/cur")
        .select(regexp_extract(col("url"), "/doc/(\\d+)$", 1)
          .cast("long").as("doc_id"),
          col("warc_type"), col("text").as("body"))
    },
  )
}
