package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.{Asset, AssetMeta}

/** Multimodal plumbing: typed decode stub, thumbnail math, frame slicing. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val assets = Seq(
    Asset(1L, "0123456789abcdef".getBytes("UTF-8"), AssetMeta("png", 1920, 1080, 0L)),
    Asset(2L, "xyz".getBytes("UTF-8"), AssetMeta("wav", 0, 0, 1500L)),
    Asset(3L, Array.empty[Byte], AssetMeta("mp4", 640, 480, 2000L)))

  test("decodeStub: typed mapPartitions pipeline with deterministic features") {
    val out = Multimodal.decodeStub(assets.toDS(), thumbMax = 64)
      .collect().map(f => f.id -> f).toMap
    assert(out(1L).nBytes == 16 && out(1L).format == "png")
    assert(out(1L).thumbW == 64 && out(1L).thumbH == 36)   // 1920×1080 → 64×36
    assert(out(2L).nBytes == 3 && out(3L).nBytes == 0)
    // fingerprint is deterministic across runs
    val again = Multimodal.decodeStub(assets.toDS()).collect().map(f => f.id -> f.byteFingerprint).toMap
    assert(out.map { case (k, v) => k -> v.byteFingerprint } == again)
  }

  test("thumbDims preserves aspect, never upsizes, never hits zero") {
    assert(Multimodal.thumbDims(1920, 1080, 64) == ((64, 36)))
    assert(Multimodal.thumbDims(1080, 1920, 64) == ((36, 64)))
    assert(Multimodal.thumbDims(30, 20, 64) == ((30, 20)))
    assert(Multimodal.thumbDims(10000, 1, 64) == ((64, 1)))
  }

  test("frameSample slices the binary into fixed-stride frames") {
    val df = Seq((1L, "aaaabbbbcc".getBytes("UTF-8"))).toDF("id", "content")
    val frames = Multimodal.frameSample(df, "id", "content", 4)
      .collect().map(r => (r.getLong(1), new String(r.getAs[Array[Byte]]("frame"), "UTF-8")))
    assert(frames.toSeq == Seq((0L, "aaaa"), (1L, "bbbb"), (2L, "cc")))
  }

  test("frameSample emits ZERO frames for empty content (no descending-sequence ghost frames)") {
    val df = Seq((1L, Array.empty[Byte]), (2L, "ab".getBytes("UTF-8"))).toDF("id", "content")
    val frames = Multimodal.frameSample(df, "id", "content", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(frames.toSeq == Seq((2L, 0L)))
  }
}
