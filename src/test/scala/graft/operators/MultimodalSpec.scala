package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Multimodal.synthesizeFromText(
    Seq((1L, "hello world"), (2L, "spark engine"), (3L, "x")).toDF("id", "t"), "id", "t")

  test("synthesized media table matches the multimodal schema") {
    assert(media.schema.fieldNames.toSeq == Seq("media_id", "modality", "bytes", "meta"))
    val mods = media.select("modality").collect().map(_.getString(0)).toSet
    assert(mods.subsetOf(Set("image", "audio", "video")))
  }

  test("extractFeatures appends a fixed-length feature vector per row") {
    val out = Multimodal.extractFeatures(media, nFeatures = 8)
    assert(out.count() == 3)
    val feats = out.select("features").collect().map(_.getSeq[Float](0))
    assert(feats.forall(_.size == 8))
    // stub = normalized byte histogram: sums to ~1 for non-empty payloads
    feats.foreach(f => assert(math.abs(f.sum - 1.0f) < 1e-4))
  }

  test("feature extraction is deterministic and partition-invariant") {
    val a = Multimodal.extractFeatures(media.repartition(3), 8)
      .orderBy("media_id").collect().map(_.getSeq[Float](4))
    val b = Multimodal.extractFeatures(media.repartition(1), 8)
      .orderBy("media_id").collect().map(_.getSeq[Float](4))
    assert(a.toSeq == b.toSeq)
  }

  test("sampleFrames operator explodes kept frames with exact chunk content") {
    val payload = "ab" * 400 // 800 bytes -> chunks of 256: 4 chunks (last=32)
    val df = Multimodal.synthesizeFromText(
      Seq((2L, payload)).toDF("id", "t"), "id", "t") // id 2 -> video
    val frames = Multimodal.sampleFrames(df, everyN = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getAs[Array[Byte]](2)))
      .sortBy(_._2)
    assert(frames.map(f => (f._1, f._2, f._3.length)).toSeq ==
      Seq((2L, 0, 256), (2L, 1, 256))) // original chunks 0 and 2 kept
    assert(new String(frames(0)._3, "UTF-8") == payload.substring(0, 256))
    assert(new String(frames(1)._3, "UTF-8") == payload.substring(512, 768))
  }

  test("resize operator re-stamps meta dims and payload header, preserves schema") {
    val out = Multimodal.resize(media, 32, 16).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).schema.fieldNames.toSeq == media.schema.fieldNames.toSeq)
    val bytes = out(1L).getAs[Array[Byte]]("bytes")
    assert(bytes(0) == 32.toByte && bytes(1) == 16.toByte)
    assert(bytes.length == 2 + math.min(64, "hello world".length))
    val meta = out(1L).getAs[org.apache.spark.sql.Row]("meta")
    assert(meta.getInt(0) == 32 && meta.getInt(1) == 16)
  }

  test("stub codec seams: resize stamps dims, frame sampling chunks payload") {
    val payload = Array.tabulate(1000)(_.toByte)
    val resized = Multimodal.StubCodec.resize(payload, 32, 16)
    assert(resized(0) == 32.toByte && resized(1) == 16.toByte)
    val frames = Multimodal.StubCodec.sampleFrames(payload, everyN = 2)
    assert(frames.size == 2) // 4 chunks of 256 -> every 2nd
  }

  test("imagePatchStats: partial edge tiles keep true pixel counts; sums equal brute force") {
    // BMP fixture is 10x7 — 4x4 patches -> 3x2 grid with partial edges
    val ids = Seq(1L, 4L).toDF("doc_id") // % 3 == 1 carries BMP
    val bmp = Multimodal.synthesizeBmp(ids, "doc_id")
    val got = Multimodal.imagePatchStats(bmp, patchW = 4, patchH = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)) ->
        (r.getInt(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    // brute force from the decoded raster
    val decoded = bmp.collect().map(r =>
      r.getLong(r.fieldIndex("media_id")) ->
        MediaCodecs.JvmCodec.decodeImage(
          r.getAs[Array[Byte]](r.fieldIndex("bytes"))).get)
    decoded.foreach { case (id, (w, h, px)) =>
      assert(w == 10 && h == 7)
      for (pr <- 0 until 2; pc <- 0 until 3) {
        var n = 0; var rs = 0L; var gs = 0L; var bs = 0L
        for (y <- pr * 4 until math.min(h, pr * 4 + 4);
             x <- pc * 4 until math.min(w, pc * 4 + 4)) {
          val p = y * w + x
          n += 1
          rs += px(p * 3) & 0xff; gs += px(p * 3 + 1) & 0xff
          bs += px(p * 3 + 2) & 0xff
        }
        assert(got((id, pr, pc)) == ((n, rs, gs, bs)),
          s"id=$id patch ($pr,$pc)")
      }
      // edge tiles: width-2 last column, height-3 last row
      assert(got((id, 0, 2))._1 == 8 && got((id, 1, 0))._1 == 12 &&
        got((id, 1, 2))._1 == 6)
    }
  }

  test("audioFrameFeatures: energies sum to the full-signal energy; ZC continuous across frames") {
    val ids = Seq(3L).toDF("doc_id") // odd id carries WAV (441 samples)
    val wav = Multimodal.synthesizeReal(ids, "doc_id")
    val frames = Multimodal.audioFrameFeatures(wav, frameSize = 100)
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4)))
    assert(frames.map(_._2).sum == 441 && frames.length == 5)
    val (_, samples) = MediaCodecs.JvmCodec.decodeAudio(
      wav.collect().head.getAs[Array[Byte]]("bytes")).get
    val totalEnergy = samples.map(s => s.toLong * s).sum
    assert(frames.map(_._3).sum == totalEnergy)
    val totalZc = (1 until samples.length)
      .count(i => (samples(i) >= 0) != (samples(i - 1) >= 0)).toLong
    assert(frames.map(_._4).sum == totalZc,
      "cross-frame crossings must not be dropped or double-counted")
  }
}
