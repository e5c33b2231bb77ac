package graft

import graft.multimodal.BinaryPipeline
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  lazy val t = TestSpark.tables

  test("binary payload roundtrip: synthesize → decodeFeatures") {
    val media = BinaryPipeline.synthesize(spark, 100)
    val feats = BinaryPipeline.decodeFeatures(media).collect()
    assert(feats.length == 100)
    feats.foreach { f =>
      assert(f.n_bytes == 76) // 12-byte header + 64-byte body
      assert(f.features.length == BinaryPipeline.StubCodec.FeatureDim)
      assert(f.width >= 32 && f.height >= 32)
    }
    // deterministic: same id → same features
    val again = BinaryPipeline.decodeFeatures(BinaryPipeline.synthesize(spark, 100))
      .collect().map(f => f.media_id -> f.features.toSeq).toMap
    feats.foreach(f => assert(again(f.media_id) == f.features.toSeq))
  }

  test("resize halves dims deterministically; frame sampling strides") {
    val media = BinaryPipeline.synthesize(spark, 50)
    val resized = BinaryPipeline.resize(media, 64).collect()
    resized.foreach { r =>
      assert(r.width <= 64 || r.height <= 64)
      assert(r.payload.length >= 13)
    }
    val frames = BinaryPipeline.sampleFrames(media, 2)
    assert(frames.count() == 50 * 2) // 4 frames of 16B per 64B body, stride 2
    assert(frames.columns.toSeq ==
      Seq("media_id", "modality", "frame_idx", "frame_bytes"))
  }

  test("media features join back to documents") {
    val media = BinaryPipeline.synthesize(spark, 40)
    val joined = BinaryPipeline.joinWithDocuments(
      BinaryPipeline.decodeFeatures(media), t.documents)
    assert(joined.count() == 40)
    assert(joined.columns.contains("lang"))
  }

  test("m02 frame sampling is deterministic: stride-2 keeps frames 0 and 2") {
    val rows = BinaryPipeline.m02(spark).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // 2000 media, id%3==0 -> audio (667), else image (1333); 64-byte body
    // = 4 frames of 16 bytes; stride 2 keeps 2 frames x 16 bytes each
    assert(rows("audio") == ((1334L, 667L, 21344L)), s"audio: ${rows("audio")}")
    assert(rows("image") == ((2666L, 1333L, 42656L)), s"image: ${rows("image")}")
  }
}
