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
}
