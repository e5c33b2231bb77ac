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

  test("m04 pHash near-dup equals the driver-side band+Hamming " +
    "expectation, and banding recall on the planted pairs is 1.0") {
    def phashOf(payload: Array[Byte]): Long = {
      val body = java.util.Arrays.copyOfRange(payload, 12,
        math.min(payload.length, 12 + 64))
      val mean = body.map(_ & 0xff).map(_.toLong).sum / body.length
      body.indices.foldLeft(0L) { (ph, j) =>
        if ((body(j) & 0xff) > mean) ph | (1L << j) else ph
      }
    }
    // rebuild the synthetic corpus driver-side with the same plant rule
    val media = (0L until 2000L).map { id =>
      val modality = if (id % 3 == 0) "audio" else "image"
      val payload =
        if (id % 10 == 7 && id >= 12) {
          val base = BinaryPipeline.StubCodec.encode(id - 12,
            if ((id - 12) % 3 == 0) "audio" else "image")
          val tmp = base(12 + 5)
          base(12 + 5) = base(12 + 40)
          base(12 + 40) = tmp
          base
        } else BinaryPipeline.StubCodec.encode(id, modality)
      (id, modality, phashOf(payload))
    }
    def band(ph: Long, b: Int): Long = (ph >> (16 * b)) & 0xffffL
    val expected = (for {
      (ia, ma, pa) <- media
      (ib, mb, pb) <- media
      if ia < ib && ma == mb
      if (0 until 4).exists(b => band(pa, b) == band(pb, b))
      d = java.lang.Long.bitCount(pa ^ pb)
      if d <= 6
    } yield (ma, ia, ib, d.toLong))
    // every planted (id−12, id) pair must survive banding + verify: the
    // sum-preserving byte SWAP keeps the mean threshold fixed ⇒ only the
    // 2 swapped positions can flip ⇒ ≥2 clean bands (pigeonhole)
    val plants = media.collect { case (id, m, _)
      if id % 10 == 7 && id >= 12 => (m, id - 12, id) }
    plants.foreach { case (m, a, b) =>
      assert(expected.exists(e => e._1 == m && e._2 == a && e._3 == b),
        s"planted pair ($a,$b) missing from kernel expectation")
    }
    val want = expected.groupBy(_._1).map { case (m, ps) =>
      m -> ((ps.size.toLong, ps.map(_._3).distinct.size.toLong,
        ps.map(_._4).sum))
    }
    val got = BinaryPipeline.m04(spark).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == want, s"m04 $got != expected $want")

    // m05: the same verified pairs mapped to blast radius — removable
    // media = distinct higher ids, affected docs = their source_doc
    // (id / 4 per the synthesizer)
    val wantBlast = expected.groupBy(_._1).map { case (m, ps) =>
      val removable = ps.map(_._3).distinct
      m -> ((removable.size.toLong, removable.map(_ / 4).distinct.size.toLong))
    }
    val gotBlast = BinaryPipeline.m05(spark).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(gotBlast == wantBlast, s"m05 $gotBlast != expected $wantBlast")
  }
}
