package graft

import graft.multimodal.BinaryPipeline
import graft.multimodal.BinaryPipeline.MediaCodec
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  lazy val t = TestSpark.tables

  /** Spec-local TGA RLE byte cost — an independent reimplementation of
    * the packetization rule (never calls encodeTga), so byte-size pins
    * on the variable-length container are a genuine second computation
    * path, like the BMP/PPM closed forms. */
  private def tgaLen(w: Int, h: Int, rgb: Array[Byte]): Long = {
    def px(i: Int): Int = ((rgb(3 * i) & 0xff) << 16) |
      ((rgb(3 * i + 1) & 0xff) << 8) | (rgb(3 * i + 2) & 0xff)
    var bytes = 18L + 26L
    for (y <- 0 until h) {
      val base = y * w
      var i = 0
      while (i < w) {
        var run = 1
        while (i + run < w && run < 128 && px(base + i + run) == px(base + i))
          run += 1
        if (run >= 2) { bytes += 4; i += run }
        else {
          var j = i
          while (j < w && j - i < 128 &&
            !(j < w - 1 && px(base + j) == px(base + j + 1))) j += 1
          bytes += 1 + 3L * (j - i)
          i = j
        }
      }
    }
    bytes
  }

  /** The synthesis rule's rgb bytes for an image id — rebuilt locally so
    * spec expectations never depend on synthPayload internals. */
  private def synthRgb(id: Long): (Int, Int, Array[Byte]) = {
    val (w, h) = (BinaryPipeline.imgW(id), BinaryPipeline.imgH(id))
    val rgb = new Array[Byte](3 * w * h)
    for (i <- 0 until w * h) {
      val hsh = graft.functions.HashImpls.mix64((id << 20) ^ i)
      rgb(3 * i) = (hsh & 0xff).toByte
      rgb(3 * i + 1) = ((hsh >> 8) & 0xff).toByte
      rgb(3 * i + 2) = ((hsh >> 16) & 0xff).toByte
    }
    (w, h, rgb)
  }

  // ---- codec-level gates (no Spark): the decode is REAL, so it is
  // value-gated like any codec — exact round-trips on the true byte
  // layouts, not schema checks. ------------------------------------

  test("BMP round-trip: encode → decode returns the exact pixels, and " +
    "the container is byte-valid (magic, offsets, padding, bottom-up)") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 20) {
      val w = 1 + rnd.nextInt(40)
      val h = 1 + rnd.nextInt(30)
      val rgb = Array.fill(3 * w * h)(rnd.nextInt(256).toByte)
      val bmp = MediaCodec.encodeBmp(w, h, rgb)
      // container facts
      assert(bmp(0) == 'B' && bmp(1) == 'M')
      assert(bmp.length == 54 + MediaCodec.rowStride(w) * h)
      val (dw, dh, back) = MediaCodec.decodeBmp(bmp)
      assert(dw == w && dh == h)
      assert(back.toSeq == rgb.toSeq, s"pixel round-trip failed at ${w}x$h")
    }
    // the decoder honors the header's data offset and BGR order: pixel
    // (0,0) red channel lives at offset 54 + (h-1)*stride + 2
    val one = MediaCodec.encodeBmp(1, 2, Array[Byte](10, 20, 30, 40, 50, 60))
    assert((one(54 + MediaCodec.rowStride(1) * 1 + 2) & 0xff) == 10,
      "top row red must sit in the BOTTOM-stored scanline, BGR order")
  }

  test("WAV round-trip: exact samples back, and the chunk walk skips " +
    "unknown chunks before data") {
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 20) {
      val s = Array.fill(1 + rnd.nextInt(2000))(rnd.nextInt(65536).toShort)
      val wav = MediaCodec.encodeWav(8000, s)
      assert(wav.length == 44 + 2 * s.length)
      val (rate, back) = MediaCodec.decodeWav(wav)
      assert(rate == 8000 && back.toSeq == s.toSeq)
    }
    // splice a LIST chunk between fmt and data: a real reader must skip it
    val s = Array[Short](100, -200, 300)
    val wav = MediaCodec.encodeWav(8000, s)
    val junk = Array[Byte]('L', 'I', 'S', 'T', 6, 0, 0, 0, 1, 2, 3, 4, 5, 6)
    val spliced = wav.take(36) ++ junk ++ wav.drop(36)
    // fix the RIFF size field
    val total = spliced.length - 8
    spliced(4) = total.toByte; spliced(5) = (total >> 8).toByte
    spliced(6) = (total >> 16).toByte; spliced(7) = (total >> 24).toByte
    val (_, back) = MediaCodec.decodeWav(spliced)
    assert(back.toSeq == s.toSeq, "chunk walk must skip the LIST chunk")
    assert(MediaCodec.bodyOffset(spliced) == 44 + junk.length + 8 - 8,
      "bodyOffset must point at the walked data chunk, not offset 44")
  }

  test("codec rejects garbage and wrong formats loudly") {
    intercept[Exception](MediaCodec.decodeBmp("not a bmp at all".getBytes))
    intercept[Exception](MediaCodec.decodeWav("RIFFxxxxJUNK".getBytes ++
      new Array[Byte](40)))
    intercept[Exception](MediaCodec.sniff(Array[Byte](1, 2, 3)))
    // round-8 (round-7 advice): a chunk len past the payload end must be
    // a clean codec error, not an ArrayIndexOutOfBounds or endless walk
    val wav = MediaCodec.encodeWav(8000, Array[Short](1, 2, 3))
    wav(40) = 127 // data chunk len = huge
    val e = intercept[IllegalArgumentException](MediaCodec.decodeWav(wav))
    assert(e.getMessage.contains("declares len"))
    val e2 = intercept[IllegalArgumentException](MediaCodec.bodyOffset(wav))
    assert(e2.getMessage.contains("declares len"))
  }

  test("PPM round-trip: encode → decode exact pixels; header comments " +
    "and the single-whitespace maxval terminator are honored") {
    val rnd = new scala.util.Random(13)
    for (_ <- 1 to 20) {
      val w = 1 + rnd.nextInt(40)
      val h = 1 + rnd.nextInt(30)
      val rgb = Array.fill(3 * w * h)(rnd.nextInt(256).toByte)
      val ppm = MediaCodec.encodePpm(w, h, rgb)
      assert(ppm(0) == 'P' && ppm(1) == '6')
      assert(MediaCodec.sniff(ppm) == "ppm")
      val (dw, dh, back) = MediaCodec.decodePpm(ppm)
      assert(dw == w && dh == h)
      assert(back.toSeq == rgb.toSeq, s"pixel round-trip failed at ${w}x$h")
      // bodyOffset = first pixel byte (the ASCII header's real length)
      assert(MediaCodec.bodyOffset(ppm) == ppm.length - 3 * w * h)
    }
    // a real P6 reader skips #-comments in the header
    val rgb = Array[Byte](1, 2, 3, 4, 5, 6)
    val commented =
      "P6\n# made by graft\n2 1\n# maxval next\n255\n".getBytes("US-ASCII") ++ rgb
    val (cw, ch, cb) = MediaCodec.decodePpm(commented)
    assert(cw == 2 && ch == 1 && cb.toSeq == rgb.toSeq)
    // truncated pixel data fails loudly
    val ppm = MediaCodec.encodePpm(2, 2, Array.fill(12)(7.toByte))
    intercept[IllegalArgumentException](
      MediaCodec.decodePpm(ppm.dropRight(1)))
  }

  test("TGA round-trip: RLE encode → decode returns the exact pixels; " +
    "byte size matches the independent packetization twin") {
    val rnd = new scala.util.Random(19)
    for (_ <- 1 to 20) {
      val w = 1 + rnd.nextInt(40)
      val h = 1 + rnd.nextInt(30)
      // low-entropy pixels (9 colors) so genuine runs occur and the RLE
      // leg is exercised, not just raw packets
      val rgb = new Array[Byte](3 * w * h)
      for (i <- 0 until w * h) {
        val c = rnd.nextInt(3) * 100
        rgb(3 * i) = c.toByte
        rgb(3 * i + 1) = (rnd.nextInt(3) * 50).toByte
        rgb(3 * i + 2) = 7.toByte
      }
      val tga = MediaCodec.encodeTga(w, h, rgb)
      assert(MediaCodec.sniff(tga) == "tga")
      assert(tga.length == tgaLen(w, h, rgb),
        s"TGA byte size must match the packetization twin at ${w}x$h")
      val (dw, dh, back) = MediaCodec.decodeTga(tga)
      assert(dw == w && dh == h)
      assert(back.toSeq == rgb.toSeq, s"pixel round-trip failed at ${w}x$h")
    }
    // a constant-color row longer than 128 pixels must SPLIT its run
    // into multiple RLE packets (the 7-bit count cap)
    val wide = Array.fill(3 * 300 * 1)(42.toByte)
    val t = MediaCodec.encodeTga(300, 1, wide)
    // 300 identical pixels → packets of 128+128+44 → 3 × 4 bytes
    assert(t.length == 18 + 12 + 26, s"run-split length: ${t.length}")
    val (_, _, wb) = MediaCodec.decodeTga(t)
    assert(wb.toSeq == wide.toSeq)
    // bottom-up storage: with two distinct rows, the FIRST packet after
    // the header must carry the BOTTOM row's color, in BGR order
    val rows = Array[Byte](10, 20, 30, 10, 20, 30,   // top row (2 px)
                           1, 2, 3, 1, 2, 3)         // bottom row
    val two = MediaCodec.encodeTga(2, 2, rows)
    assert((two(18) & 0xff) == 0x81, "2-px run ⇒ RLE control 0x81")
    assert(two(19) == 3 && two(20) == 2 && two(21) == 1,
      "bottom row first, BGR order")
  }

  test("TGA decoder validates the variable-length stream loudly: " +
    "truncated packets, overruns, missing footer") {
    val rgb = Array.tabulate(3 * 8 * 8)(i =>
      (graft.functions.HashImpls.mix64(i.toLong) & 0xff).toByte)
    val tga = MediaCodec.encodeTga(8, 8, rgb)
    // footer stripped → not sniffable as TGA at all
    intercept[Exception](MediaCodec.sniff(tga.dropRight(26)))
    val e0 = intercept[IllegalArgumentException](
      MediaCodec.decodeTga(tga.dropRight(26)))
    assert(e0.getMessage.contains("footer"))
    // packet bytes removed (footer re-attached) → truncated stream error
    val cut = tga.take(tga.length - 26 - 5) ++ tga.takeRight(26)
    val e1 = intercept[IllegalArgumentException](MediaCodec.decodeTga(cut))
    assert(e1.getMessage.contains("truncated")
      || e1.getMessage.contains("past the stream end"))
    // a control byte inflated past the remaining image → overrun error
    val bad = tga.clone()
    bad(18) = 0xff.toByte // RLE run of 128 ≫ the 8 pixels left in row 0
    val e2 = intercept[IllegalArgumentException](MediaCodec.decodeTga(bad))
    assert(e2.getMessage.contains("overruns"))
  }

  test("FLAC round trip is LOSSLESS over arbitrary s16 (white noise, " +
    "silence, ramps, full-scale extremes, multi-frame) and the length " +
    "twin prices the encoder exactly") {
    val rnd = new scala.util.Random(29)
    val signals = Seq(
      Array.tabulate(700)(_ => (rnd.nextInt(65536) - 32768).toShort),
      Array.fill(300)(0.toShort),
      Array.tabulate(512)(i => (i * 100 - 25000).toShort), // linear ramp
      Array[Short](32767, -32768, 32767, -32768, 0, 1, -1),
      Array.tabulate(256)(i => (1000 * math.sin(i / 5.0)).toShort))
    signals.foreach { s =>
      val p = MediaCodec.encodeFlac(8000, s)
      assert(MediaCodec.sniff(p) == "flac")
      val (rate, back) = MediaCodec.decodeFlac(p)
      assert(rate == 8000 && back.toSeq == s.toSeq,
        "FLAC decode must reproduce the input bit-exactly")
      // the codec-free length twin replays the predictor/Rice election
      assert(BinaryPipeline.flacBytes(s.map(_.toInt)) == p.length.toLong,
        s"flacBytes twin diverges from the encoder (${s.take(4).toSeq}...)")
      // bodyOffset = end of metadata (magic 4 + header 4 + STREAMINFO 34)
      assert(MediaCodec.bodyOffset(p) == 42)
    }
  }

  test("FLAC fixed-predictor election: order 2 wins on a linear ramp " +
    "(residuals vanish), order 0 on white noise") {
    // a linear signal is annihilated by the order-2 predictor
    // 2s[i-1] - s[i-2]; white noise defeats prediction entirely
    val ramp = Array.tabulate(256)(i => i * 7 - 800)
    val (o1, k1, _) = MediaCodec.flacChoose(ramp, 256)
    assert(o1 == 2 && k1 == 0, s"ramp should elect order 2/k 0: ($o1, $k1)")
    val rnd = new scala.util.Random(31)
    val noise = Array.tabulate(256)(_ => rnd.nextInt(65536) - 32768)
    val (o0, k0, _) = MediaCodec.flacChoose(noise, 256)
    assert(o0 == 0 && k0 >= 14,
      s"white noise should elect order 0 at a high Rice k: ($o0, $k0)")
    // and a ramp compresses far below raw while noise does not
    val rampBytes = MediaCodec.encodeFlac(8000, ramp.map(_.toShort)).length
    assert(rampBytes < 2 * 256 / 4,
      s"order-2 + rice(0) should crush a ramp: $rampBytes bytes")
  }

  test("FLAC smooth-signal corpus leg elects the HIGH orders: quadratic " +
    "ids drive order 3, cubic ids order 4, every frame, with near-zero " +
    "Rice k; round trip stays lossless and the length twin prices it") {
    // ids 0 / 48 land on the quad / cubic leg of synthSample's PTM
    // generator (id % 24 == 0 is the smooth class; the hash bit picks
    // the leg) — the corpus now genuinely exercises the decode-side
    // orders 3-4 the encoder previously never elected
    for ((id, wantOrder) <- Seq((0L, 3), (48L, 4))) {
      val n = BinaryPipeline.wavN(id)
      val s = Array.tabulate(n)(i => BinaryPipeline.synthSample(id, i))
      val ints = s.map(_.toInt)
      for (off <- 0 until n by 256) {
        val frame = ints.slice(off, math.min(off + 256, n))
        val (o, k, _) = MediaCodec.flacChoose(frame, frame.length)
        assert(o == wantOrder,
          s"id=$id frame@$off elected order $o, want $wantOrder")
        assert(k <= 4,
          s"smooth residuals should sit at tiny Rice k, got $k (id=$id)")
      }
      val p = MediaCodec.encodeFlac(8000, s)
      assert(MediaCodec.sniff(p) == "flac")
      val (rate, back) = MediaCodec.decodeFlac(p)
      assert(rate == 8000 && back.toSeq == s.toSeq,
        s"order-$wantOrder round trip must be lossless")
      assert(BinaryPipeline.flacBytes(ints) == p.length.toLong,
        s"flacBytes twin diverges on the smooth leg (id=$id)")
      // predictive coding is the point here: the smooth leg compresses
      // far below the 2-bytes/sample raw stream (noise docs cannot)
      assert(p.length < 2 * n / 3,
        s"smooth leg should compress ≥3x: ${p.length} bytes for $n samples")
    }
  }

  test("FLAC integrity rungs all fire: header CRC-8, frame CRC-16, " +
    "STREAMINFO MD5, truncation, bad magic") {
    val s = Array.tabulate(300)(i =>
      (graft.functions.HashImpls.mix64(i.toLong) & 0xffff).toShort)
    val p = MediaCodec.encodeFlac(8000, s)
    def tampered(off: Int): Array[Byte] = {
      val b = p.clone(); b(off) = (b(off) ^ 0x01).toByte; b
    }
    // frame header byte (just past the 42-byte metadata): CRC-8 or sync
    val e1 = intercept[Exception](MediaCodec.decodeFlac(tampered(46)))
    assert(e1.getMessage.contains("CRC-8") || e1.getMessage.contains("sync")
      || e1.getMessage.contains("frame number"), e1.getMessage)
    // a residual byte mid-frame: CRC-16 (or the MD5 backstop)
    val e2 = intercept[Exception](MediaCodec.decodeFlac(tampered(80)))
    assert(e2.getMessage.contains("CRC-16") || e2.getMessage.contains("MD5")
      || e2.getMessage.contains("range"), e2.getMessage)
    // STREAMINFO MD5 byte: every frame decodes, the signature must catch it
    val e3 = intercept[Exception](MediaCodec.decodeFlac(tampered(30)))
    assert(e3.getMessage.contains("MD5"), e3.getMessage)
    // truncated stream: clean codec error, not an index error
    val e4 = intercept[Exception](
      MediaCodec.decodeFlac(p.take(p.length - 3)))
    assert(e4.getMessage.contains("truncated")
      || e4.getMessage.contains("CRC"), e4.getMessage)
    val e5 = intercept[Exception](MediaCodec.decodeFlac("nope".getBytes))
    assert(e5.getMessage.contains("not a FLAC"), e5.getMessage)
  }

  test("the dispatch seam: the same pixels through BMP, PPM, TGA and " +
    "PNG produce identical decoded images and identical features") {
    // BGR-bottom-up-padded vs RGB-top-down-unpadded vs RLE-packetized
    // vs filtered-entropy-coded: if any decoder mishandles its layout,
    // the containers disagree here
    val rnd = new scala.util.Random(17)
    for (_ <- 1 to 10) {
      val w = 1 + rnd.nextInt(30)
      val h = 1 + rnd.nextInt(20)
      val rgb = Array.fill(3 * w * h)(rnd.nextInt(256).toByte)
      val bmp = MediaCodec.encodeBmp(w, h, rgb)
      val ppm = MediaCodec.encodePpm(w, h, rgb)
      val tga = MediaCodec.encodeTga(w, h, rgb)
      val png = MediaCodec.encodePng(w, h, rgb)
      assert(MediaCodec.decodeImage(bmp)._3.toSeq ==
        MediaCodec.decodeImage(ppm)._3.toSeq)
      assert(MediaCodec.decodeImage(bmp)._3.toSeq ==
        MediaCodec.decodeImage(tga)._3.toSeq)
      assert(MediaCodec.decodeImage(bmp)._3.toSeq ==
        MediaCodec.decodeImage(png)._3.toSeq)
      val (mb, wb, hb, fb) = MediaCodec.features(bmp)
      val (mp, wp, hp, fp) = MediaCodec.features(ppm)
      val (mt, wt, ht, ft) = MediaCodec.features(tga)
      val (mg, wg, hg, fg) = MediaCodec.features(png)
      assert(mb == mp && wb == wp && hb == hp)
      assert(mb == mt && wb == wt && hb == ht)
      assert(mb == mg && wb == wg && hb == hg)
      assert(fb.toSeq == fp.toSeq && fb.toSeq == ft.toSeq &&
        fb.toSeq == fg.toSeq,
        "features must be bit-identical across containers")
    }
  }

  test("PPM flows through resize (stays PPM), frame sampling, and pHash " +
    "(golden over content bytes)") {
    import spark.implicits._
    // deterministic 8x8 image; PPM content bytes ARE the rgb array, so
    // the pHash expectation is computable from the input independently
    // of the codec internals
    val rgb = Array.tabulate(3 * 8 * 8)(i =>
      (graft.functions.HashImpls.mix64(i.toLong) & 0xff).toByte)
    val ppm = MediaCodec.encodePpm(8, 8, rgb)
    val media = Seq(
      BinaryPipeline.MediaRow(0L, "image", ppm, 0L)).toDS()
    // resize: container preserved, dims reduced, pixels decodable
    val rz = BinaryPipeline.resize(media, 4).collect().head
    assert(MediaCodec.sniff(rz.payload) == "ppm",
      "resize must re-encode a PPM as a PPM")
    assert(rz.width == 4 && rz.height == 4)
    val (rw, rh, rback) = MediaCodec.decodePpm(rz.payload)
    assert(rw == 4 && rh == 4 && rback.length == 48)
    // frame sampling: scanlines of the decoded image
    val frames = BinaryPipeline.sampleFrames(media, 2).collect()
    assert(frames.length == 4) // rows 0, 2, 4, 6 of 8
    assert(frames.map(_.getAs[Array[Byte]](3)).forall(_.length == 24))
    // pHash golden: mean-threshold over the first 64 CONTENT bytes
    val body = rgb.take(64)
    val mean = body.map(_ & 0xff).map(_.toLong).sum / 64
    var expected = 0L
    for (j <- 0 until 64) if ((body(j) & 0xff) > mean) expected |= (1L << j)
    val got = BinaryPipeline.phash(media).collect().head.getLong(2)
    assert(got == expected, f"pHash mismatch: got $got%016x want $expected%016x")
  }

  test("m06 content sums: the codec round trip equals the codec-free " +
    "twin payload by payload") {
    import spark.implicits._
    // the m06 aggregate compares per-modality SUMS; this pins the
    // per-payload equality the sums are built from, over all SEVEN
    // containers (48 consecutive ids cover every id % 12 class: FLAC,
    // PCM WAV, IMA ADPCM, BMP, TGA, PNG, PPM)
    val sample = (0L until 48L)
    val viaCodec = BinaryPipeline
      .resize(BinaryPipeline.synthesize(spark, 48), 16)
      .collect().map { r =>
        val body = MediaCodec.sniff(r.payload) match {
          case "bmp" | "ppm" | "tga" | "png" =>
            MediaCodec.decodeImage(r.payload)._3
              .foldLeft(0L)((a, b) => a + (b & 0xff))
          case "wav" | "adpcm" | "flac" =>
            MediaCodec.decodeAudio(r.payload)._2
              .foldLeft(0L)((a, v) => a + (v & 0xff) + ((v >> 8) & 0xff))
        }
        r.media_id -> body
      }.toMap
    sample.foreach { id =>
      assert(viaCodec(id) == BinaryPipeline.m06ContentSum(id),
        s"m06 content sum diverges from the codec-free twin at id=$id")
    }
  }

  test("image features are computed from the decoded pixels (golden " +
    "check on a hand-built 2x1 image)") {
    // pixels: (255,0,0) and (0,0,255) → meanR = meanB = 0.5, meanG = 0
    val bmp = MediaCodec.encodeBmp(2, 1,
      Array[Byte](255.toByte, 0, 0, 0, 0, 255.toByte))
    val (mod, w, h, f) = MediaCodec.features(bmp)
    assert(mod == "image" && w == 2 && h == 1)
    assert(math.abs(f(0) - 0.5f) < 1e-6, s"meanR: ${f(0)}")
    assert(math.abs(f(1)) < 1e-6, s"meanG: ${f(1)}")
    assert(math.abs(f(2) - 0.5f) < 1e-6, s"meanB: ${f(2)}")
    // luma: 0.299*255 vs 0.114*255 → mean 0.2065, min 0.114, max 0.299
    assert(math.abs(f(3) - 0.2065f) < 1e-4)
    assert(math.abs(f(4) - 0.114f) < 1e-4)
    assert(math.abs(f(5) - 0.299f) < 1e-4)
    assert(f(7) == 2.0f) // aspect
  }

  test("audio features are computed from the decoded samples (golden " +
    "check on a hand-built square wave)") {
    val s = Array[Short](16384, -16384, 16384, -16384)
    val (mod, w, h, f) = MediaCodec.features(MediaCodec.encodeWav(8000, s))
    assert(mod == "audio" && w == 4 && h == 1)
    assert(math.abs(f(0)) < 1e-6, "DC mean of a symmetric square wave is 0")
    assert(math.abs(f(1) - 0.5f) < 1e-6, s"RMS: ${f(1)}")
    assert(math.abs(f(2) - 0.5f) < 1e-6, s"mean|s|: ${f(2)}")
    assert(f(3) == 1.0f, "every adjacent pair crosses zero")
    assert(math.abs(f(4) - 0.5f) < 1e-6, "peak")
    assert(math.abs(f(5) - 1.0f) < 1e-6, "mean |delta| = 32768/32768")
    assert(math.abs(f(6) - 4.0f / 8000) < 1e-9, "duration")
  }

  // ---- pipeline-level gates ---------------------------------------

  test("binary payload roundtrip: synthesize → decodeFeatures, with " +
    "byte sizes matching the container layout arithmetic") {
    val media = BinaryPipeline.synthesize(spark, 100)
    val feats = BinaryPipeline.decodeFeatures(media).collect()
    assert(feats.length == 100)
    feats.foreach { f =>
      val id = f.media_id
      if (id % 3 == 0) {
        assert(f.modality == "audio")
        assert(f.width == BinaryPipeline.wavN(id) && f.height == 1)
        // audio arithmetic forks by coding: PCM is 44 + 2 bytes/sample,
        // IMA ADPCM (id%6==3) is the closed block form, FLAC (id%12==0)
        // is the codec-free st16FlacLen twin (itself pinned against the
        // encoder in the FLAC tests below)
        val expectAudio =
          if (id % 6 == 3) MediaCodec.adpcmBytes(BinaryPipeline.wavN(id))
          else if (id % 12 == 0) BinaryPipeline.st16FlacLen(id)
          else 44 + 2L * BinaryPipeline.wavN(id)
        assert(f.n_bytes == expectAudio, s"id=$id audio container size")
      } else {
        assert(f.modality == "image")
        val (w, h) = (BinaryPipeline.imgW(id), BinaryPipeline.imgH(id))
        assert(f.width == w)
        assert(f.height == h)
        // container arithmetic per the round-11 graded dispatch:
        // id%6==1 → BMP (54-byte header + 4-padded bottom-up rows),
        // id%6==4 → RLE TGA (header + packet stream + footer; byte cost
        //           from the spec-local packetization twin),
        // id%6==5 → PNG (byte cost from the codec-free st16PngLen
        //           twin, itself pinned against the encoder above),
        // id%6==2 → PPM (ASCII "P6\nw h\n255\n" header + packed RGB)
        val expectBytes =
          if (id % 6 == 1) 54 + MediaCodec.rowStride(w).toLong * h
          else if (id % 6 == 4) { val (_, _, rgb) = synthRgb(id); tgaLen(w, h, rgb) }
          else if (id % 6 == 5) BinaryPipeline.st16PngLen(id)
          else s"P6\n$w $h\n255\n".length.toLong + 3L * w * h
        assert(f.n_bytes == expectBytes, s"id=$id container size")
      }
      assert(f.features.length == MediaCodec.FeatureDim)
    }
    // deterministic: same id → same features
    val again = BinaryPipeline.decodeFeatures(BinaryPipeline.synthesize(spark, 100))
      .collect().map(f => f.media_id -> f.features.toSeq).toMap
    feats.foreach(f => assert(again(f.media_id) == f.features.toSeq))
  }

  test("resize produces valid containers at reduced dims; frame " +
    "sampling emits the stride-2 scanlines/blocks") {
    val media = BinaryPipeline.synthesize(spark, 50)
    val resized = BinaryPipeline.resize(media, 16).collect()
    resized.foreach { r =>
      if (r.modality == "image") {
        // resize must preserve the arrival container: BMP stays BMP,
        // TGA stays TGA, PNG stays PNG, PPM stays PPM (sniffed, never
        // trusted from metadata)
        val expectKind =
          if (r.media_id % 6 == 1) "bmp"
          else if (r.media_id % 6 == 4) "tga"
          else if (r.media_id % 6 == 5) "png"
          else "ppm"
        assert(MediaCodec.sniff(r.payload) == expectKind, s"id=${r.media_id}")
        val (w, h, _) = MediaCodec.decodeImage(r.payload) // still valid
        assert(w == r.width && h == r.height)
        assert(w <= 16 || h <= 16)
      } else {
        // audio also round-trips in its arrival coding: ADPCM stays
        // ADPCM (re-quantized), FLAC stays FLAC (re-coded losslessly),
        // PCM stays PCM
        val expectKind =
          if (r.media_id % 6 == 3) "adpcm"
          else if (r.media_id % 12 == 0) "flac" else "wav"
        assert(MediaCodec.sniff(r.payload) == expectKind, s"id=${r.media_id}")
        val (_, s) = MediaCodec.decodeAudio(r.payload) // still valid
        assert(s.length == r.width && s.length <= 16)
      }
    }
    // stride-2 frame counts follow the container arithmetic
    val frames = BinaryPipeline.sampleFrames(media, 2)
      .groupBy("media_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 50L).foreach { id =>
      val expect =
        if (id % 3 == 0)
          ((BinaryPipeline.wavN(id) + BinaryPipeline.AudioBlock - 1) /
            BinaryPipeline.AudioBlock + 1) / 2
        else (BinaryPipeline.imgH(id) + 1) / 2
      assert(frames(id) == expect.toLong, s"id=$id")
    }
  }

  test("graded corpus exercises all seven containers through the sniff " +
    "dispatch (FLAC/WAV by id%12, ADPCM/BMP/TGA/PNG/PPM by id%6), and " +
    "decode is magic-driven") {
    val media = BinaryPipeline.synthesize(spark, 99).collect()
    val byKind = media.groupBy(m => MediaCodec.sniff(m.payload))
      .view.mapValues(_.length).toMap
    // 0..98: id%12==0 (0,12,…,96) → 9 FLAC; id%12==6 (6,18,…,90) → 8
    // PCM WAV; id%6==3 (3,…,93) → 16 IMA ADPCM; id%6==1 (1,7,…,97) →
    // 17 BMP; id%6==4 (4,…,94) → 16 TGA; id%6==5 (5,…,95) → 16 PNG;
    // id%6==2 → 17 PPM
    assert(byKind == Map("flac" -> 9, "wav" -> 8, "adpcm" -> 16,
      "bmp" -> 17, "tga" -> 16, "png" -> 16, "ppm" -> 17), byKind)
    // the two image containers carry the SAME decoded content for the
    // same id-rule pixels: decode(BMP(id)) at id and decode(PPM(id'))
    // agree with their own synthesis rule, and features are computed
    // from decoded bytes, so the feature path is container-invariant
    media.filter(_.modality == "image").foreach { m =>
      val (w, h, rgb) = MediaCodec.decodeImage(m.payload)
      assert(w == BinaryPipeline.imgW(m.media_id) &&
        h == BinaryPipeline.imgH(m.media_id))
      assert(rgb.length == 3 * w * h)
    }
  }

  test("media features join back to documents") {
    val media = BinaryPipeline.synthesize(spark, 40)
    val joined = BinaryPipeline.joinWithDocuments(
      BinaryPipeline.decodeFeatures(media), t.documents)
    assert(joined.count() == 40)
    assert(joined.columns.contains("lang"))
  }

  test("m02 equals the frame-walk arithmetic recomputed driver-side " +
    "(the same arithmetic the DuckDB oracle runs)") {
    val want = (0L until BinaryPipeline.NMedia.toLong).flatMap { id =>
      if (id % 3 == 0) {
        val ns = BinaryPipeline.wavN(id)
        val blocks = (ns + BinaryPipeline.AudioBlock - 1) / BinaryPipeline.AudioBlock
        (0 until blocks by 2).map(f => ("audio", id,
          2L * math.min(BinaryPipeline.AudioBlock, ns - BinaryPipeline.AudioBlock * f)))
      } else {
        (0 until BinaryPipeline.imgH(id) by 2).map(_ =>
          ("image", id, 3L * BinaryPipeline.imgW(id)))
      }
    }.groupBy(_._1).map { case (m, fs) =>
      m -> ((fs.size.toLong, fs.map(_._2).distinct.size.toLong,
        fs.map(_._3).sum))
    }
    val got = BinaryPipeline.m02(spark).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == want, s"m02 $got != $want")
  }

  test("m04 pHash near-dup equals the driver-side band+Hamming " +
    "expectation, and banding recall on the planted pairs is 1.0") {
    def phashOf(payload: Array[Byte]): Long = {
      val off = MediaCodec.bodyOffset(payload)
      val body = java.util.Arrays.copyOfRange(payload, off,
        math.min(payload.length, off + 64))
      val mean = body.map(_ & 0xff).map(_.toLong).sum / body.length
      body.indices.foldLeft(0L) { (ph, j) =>
        if ((body(j) & 0xff) > mean) ph | (1L << j) else ph
      }
    }
    // rebuild the synthetic corpus driver-side with the same plant rule
    val media = (0L until BinaryPipeline.NMedia.toLong).map { id =>
      val modality = if (id % 3 == 0) "audio" else "image"
      val payload =
        if (id % 10 == 7 && id >= 12) {
          val base = BinaryPipeline.synthPayload(id - 12)
          val off = MediaCodec.bodyOffset(base)
          val tmp = base(off + 5)
          base(off + 5) = base(off + 40)
          base(off + 40) = tmp
          base
        } else BinaryPipeline.synthPayload(id)
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

  test("IMA ADPCM: lossy round trip equals the quantizer-replay twin, " +
    "byte size is the closed block form, multi-block state carries") {
    val rnd = new scala.util.Random(17)
    for (trial <- 1 to 20) {
      // lengths straddle the 505-sample block boundary: single-block,
      // exact-boundary, and multi-block payloads all round-trip
      val n = if (trial % 4 == 0) 505 * (1 + trial / 4)
              else 1 + rnd.nextInt(1300)
      val s = Array.fill(n)(rnd.nextInt(65536).toShort)
      val p = MediaCodec.encodeAdpcm(8000, s)
      assert(p.length == MediaCodec.adpcmBytes(n), s"n=$n byte size")
      assert(MediaCodec.sniff(p) == "adpcm")
      val (rate, back) = MediaCodec.decodeAdpcm(p)
      assert(rate == 8000 && back.length == n)
      // decode(encode(s)) must equal the independent replay — the twin
      // every csum oracle VALUES row is computed from
      assert(back.toSeq == BinaryPipeline.adpcmReplay(s).toSeq,
        s"n=$n decode != quantizer replay")
      // block anchors: every 505th sample is stored RAW in the block
      // header, so it reconstructs exactly
      var k = 0
      while (k < n) { assert(back(k) == s(k), s"block anchor $k"); k += 505 }
    }
    // the coding tracks a smooth signal closely: reconstruction error
    // bounded by the adaptive step (loose sanity bound, not a golden)
    val smooth = Array.tabulate(600)(i =>
      (8000 * math.sin(i / 25.0)).toShort)
    val (_, rec) = MediaCodec.decodeAdpcm(MediaCodec.encodeAdpcm(8000, smooth))
    val maxErr = smooth.zip(rec).map { case (a, b) => math.abs(a - b) }.max
    assert(maxErr <= 2000, s"smooth-signal max error $maxErr")
  }

  test("IMA ADPCM rejects truncation and corruption loudly") {
    val s = Array.fill(700)(123.toShort)
    val p = MediaCodec.encodeAdpcm(8000, s)
    // truncated mid-block: the fact count promises more samples than
    // the data chunk holds
    val cut = java.util.Arrays.copyOf(p, p.length - 100)
    // fix the RIFF + data sizes so the CHUNK walk succeeds and the
    // block-bound check is what fires
    def put32(b: Array[Byte], off: Int, v: Int): Unit = {
      b(off) = v.toByte; b(off + 1) = (v >> 8).toByte
      b(off + 2) = (v >> 16).toByte; b(off + 3) = (v >> 24).toByte
    }
    put32(cut, 4, cut.length - 8)
    put32(cut, 56, cut.length - 60)
    val e = intercept[IllegalArgumentException](MediaCodec.decodeAdpcm(cut))
    assert(e.getMessage.contains("too short"), e.getMessage)
    // corrupt step index past the 89-entry table
    val bad = p.clone()
    bad(62) = 120.toByte // block header step index
    val e2 = intercept[IllegalArgumentException](MediaCodec.decodeAdpcm(bad))
    assert(e2.getMessage.contains("step index"), e2.getMessage)
    // an unsupported WAVE format tag is a loud sniff error
    val alien = p.clone()
    alien(20) = 2 // MS ADPCM, not implemented
    val e3 = intercept[Exception](MediaCodec.sniff(alien))
    assert(e3.getMessage.contains("format tag"), e3.getMessage)
  }

  test("m07 transcode-to-PCM: lossless over the decoded stream, images " +
    "pass through byte-identical, per-container rollup is exact") {
    // full-corpus expectation from the synthesis rules + twins: the
    // transcoded content sum per id IS st16ContentSum (PCM re-encode is
    // lossless over the decoded samples); bytes in/out from the
    // container layout arithmetic (TGA in-bytes via the real payload —
    // the packet walk has no closed form)
    val got = BinaryPipeline.m07(spark)
    val wantFull = (0L until BinaryPipeline.NMedia).map { id =>
      val container =
        if (id % 12 == 0) "flac" else if (id % 12 == 6) "wav"
        else if (id % 6 == 3) "adpcm"
        else if (id % 6 == 1) "bmp" else if (id % 6 == 4) "tga"
        else if (id % 6 == 5) "png" else "ppm"
      val plenIn =
        if (id % 6 == 3) graft.multimodal.BinaryPipeline.MediaCodec
          .adpcmBytes(BinaryPipeline.wavN(id))
        else if (id % 12 == 0) BinaryPipeline.st16FlacLen(id)
        else if (id % 3 == 0) 44L + 2L * BinaryPipeline.wavN(id)
        else BinaryPipeline.synthPayload(id).length.toLong
      val plenOut =
        if (id % 3 == 0) 44L + 2L * BinaryPipeline.wavN(id) else plenIn
      (container, plenIn, plenOut, BinaryPipeline.st16ContentSum(id))
    }.groupBy(_._1).view.mapValues { rows =>
      (rows.size.toLong, rows.map(_._2).sum, rows.map(_._3).sum,
        rows.map(_._4).sum)
    }.toMap
    val rows = got.collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(rows == wantFull, s"m07 $rows != $wantFull")
    // the compression-ratio audit must be non-trivial: ADPCM bytes_out
    // (PCM) is ~2.7x bytes_in over this corpus (4-bit codes ~4x, minus
    // the 60-byte header + 256-byte block padding on short files);
    // images are identical in/out. FLAC is a MIXED class since the
    // round-13 smooth leg: noise ids (id % 24 == 12) do not compress
    // (slightly above their PCM, documented), smooth ids (id % 24 == 0)
    // crush >= 3x, so the class aggregate now sits BELOW its PCM.
    val ad = rows("adpcm")
    assert(ad._3 > 2 * ad._2, s"ADPCM expansion missing: $ad")
    (0L until BinaryPipeline.NMedia).filter(_ % 12 == 0).foreach { id =>
      val pcm = 44L + 2L * BinaryPipeline.wavN(id)
      val fin = BinaryPipeline.st16FlacLen(id)
      if (id % 24 == 0)
        assert(3 * fin < 2 * pcm, s"smooth id=$id should crush: $fin vs $pcm")
      else
        assert(fin > pcm, s"noise id=$id should exceed PCM: $fin vs $pcm")
    }
    val fl = rows("flac")
    assert(fl._3 > fl._2,
      s"mixed FLAC class should now compress below its PCM: $fl")
    Seq("bmp", "tga", "png", "ppm").foreach { c =>
      assert(rows(c)._2 == rows(c)._3, s"$c must pass through: ${rows(c)}")
    }
    assert(rows.keySet ==
      Set("flac", "wav", "adpcm", "bmp", "tga", "png", "ppm"))
  }

  test("st16's codec-free twins match the real containers for EVERY id: " +
    "full-res TGA length rule and full-content sums vs actual decode") {
    (0L until BinaryPipeline.NMedia).foreach { id =>
      val p = BinaryPipeline.synthPayload(id)
      // the oracle's TGA plen column comes from st16TgaLen, never from
      // encodeTga — pin the independent packet-walk arithmetic against
      // the real encoder's output byte-for-byte
      if (id % 6 == 4)
        assert(BinaryPipeline.st16TgaLen(id) == p.length,
          s"id=$id st16TgaLen != real TGA length ${p.length}")
      // the oracle's PNG plen column comes from st16PngLen — the
      // independent filter-choice + fixed-Huffman-bit-cost arithmetic —
      // pinned against the real encoder's output byte-for-byte
      if (id % 6 == 5)
        assert(BinaryPipeline.st16PngLen(id) == p.length,
          s"id=$id st16PngLen != real PNG length ${p.length}")
      // the oracle's FLAC plen column comes from st16FlacLen — the
      // independent predictor/Rice-election bit-cost arithmetic —
      // pinned against the real encoder's output byte-for-byte
      if (id % 12 == 0)
        assert(BinaryPipeline.st16FlacLen(id) == p.length,
          s"id=$id st16FlacLen != real FLAC length ${p.length}")
      // the oracle's csum column comes from the synthesis rule, never
      // from the codec — pin it against the real encode→sniff→decode
      val (_, _, plen, csum) = BinaryPipeline.decodeIngest(
        BinaryPipeline.MediaRow(
          id, if (id % 3 == 0) "audio" else "image", p, id / 4))
      assert(plen == p.length)
      assert(csum == BinaryPipeline.st16ContentSum(id),
        s"id=$id decoded content sum != synthesis-rule twin")
    }
  }

  // ---- PNG (round 11): the entropy-coded sixth container ----

  /** Spec-local PNG chunk walk (no CRC check — the codec does that). */
  private def pngChunks(p: Array[Byte]): Seq[(String, Array[Byte])] = {
    def be32(off: Int): Int = ((p(off) & 0xff) << 24) |
      ((p(off + 1) & 0xff) << 16) | ((p(off + 2) & 0xff) << 8) |
      (p(off + 3) & 0xff)
    var off = 8
    val out = scala.collection.mutable.Buffer[(String, Array[Byte])]()
    while (off + 8 <= p.length) {
      val len = be32(off)
      out += new String(p, off + 4, 4, "US-ASCII") ->
        java.util.Arrays.copyOfRange(p, off + 8, off + 8 + len)
      off += 12 + len
    }
    out.toSeq
  }

  /** Spec-local PNG builder — an INDEPENDENT encoder path: chunk + CRC
    * framing written here, the zlib stream produced by
    * java.util.zip.Deflater (real LZ77 + Huffman), so decodePng is
    * proven against a second DEFLATE implementation, not just the
    * codec's own fixed-Huffman subset. Options exercise the spec rules
    * the codec's encoder never emits: multi-IDAT and ancillary chunks. */
  private def specPng(w: Int, h: Int, filtered: Array[Byte],
                      multiIdat: Boolean = false,
                      extraChunk: Option[String] = None,
                      colorType: Int = 2): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def be32(v: Int): Array[Byte] =
      Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      out.write(be32(data.length), 0, 4)
      val t = typ.getBytes("US-ASCII")
      out.write(t, 0, 4)
      out.write(data, 0, data.length)
      val crc = new java.util.zip.CRC32
      crc.update(t, 0, 4)
      crc.update(data, 0, data.length)
      out.write(be32(crc.getValue.toInt), 0, 4)
    }
    out.write(MediaCodec.PngSignature, 0, 8)
    chunk("IHDR", be32(w) ++ be32(h) ++
      Array[Byte](8, colorType.toByte, 0, 0, 0))
    val d = new java.util.zip.Deflater()
    d.setInput(filtered)
    d.finish()
    val buf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](1024)
    while (!d.finished()) buf.write(tmp, 0, d.deflate(tmp))
    d.end()
    val z = buf.toByteArray
    if (multiIdat) {
      val cut = z.length / 2
      chunk("IDAT", java.util.Arrays.copyOfRange(z, 0, cut))
      extraChunk.foreach(t => chunk(t, "meta".getBytes("US-ASCII")))
      chunk("IDAT", java.util.Arrays.copyOfRange(z, cut, z.length))
    } else {
      extraChunk.foreach(t => chunk(t, "meta".getBytes("US-ASCII")))
      chunk("IDAT", z)
    }
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Spec-local filter application for a FORCED filter type — a second
    * transcription of the five spec filters (never calls the codec). */
  private def forceFilter(t: Int, w: Int, h: Int,
                          rgb: Array[Byte]): Array[Byte] = {
    val stride = 3 * w
    val filtered = new Array[Byte](h * (1 + stride))
    for (y <- 0 until h) {
      filtered(y * (1 + stride)) = t.toByte
      for (i <- 0 until stride) {
        val x = rgb(y * stride + i) & 0xff
        val a = if (i >= 3) rgb(y * stride + i - 3) & 0xff else 0
        val b = if (y > 0) rgb((y - 1) * stride + i) & 0xff else 0
        val c = if (y > 0 && i >= 3) rgb((y - 1) * stride + i - 3) & 0xff
                else 0
        val pred = t match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case _ =>
            val pa = math.abs(b - c)
            val pb = math.abs(a - c)
            val pc = math.abs(a + b - 2 * c)
            if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
        }
        filtered(y * (1 + stride) + 1 + i) = (x - pred).toByte
      }
    }
    filtered
  }

  test("PNG round-trip: adaptive filters + hand-rolled fixed-Huffman " +
    "DEFLATE decode back to the exact pixels via the JDK's inflater") {
    val rnd = new scala.util.Random(77)
    for ((w, h) <- Seq((1, 1), (1, 9), (9, 1), (8, 8), (37, 23))) {
      val rgb = Array.fill(3 * w * h)(rnd.nextInt(256).toByte)
      val p = MediaCodec.encodePng(w, h, rgb)
      assert(MediaCodec.sniff(p) == "png")
      val (dw, dh, back) = MediaCodec.decodePng(p)
      assert((dw, dh) == ((w, h)))
      assert(back.sameElements(rgb), s"${w}x$h round trip")
    }
    // structured content must engage the ADAPTIVE choice (noise mostly
    // ties; a constant image makes Sub/Up win different rows): read the
    // winning filter types back out of the real payload
    val const = Array.fill(3 * 12 * 12)(42.toByte)
    val p = MediaCodec.encodePng(12, 12, const)
    assert(MediaCodec.decodePng(p)._3.sameElements(const))
    val idat = pngChunks(p).collect { case ("IDAT", d) => d }
      .reduce(_ ++ _)
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat)
    val raw = new Array[Byte](12 * (1 + 36))
    var got = 0
    while (!inf.finished() && got < raw.length)
      got += inf.inflate(raw, got, raw.length - got)
    inf.end()
    val types = (0 until 12).map(y => raw(y * 37) & 0xff)
    assert(types.forall(_ <= 4))
    assert(types.distinct.length >= 2,
      s"adaptive filter choice degenerate on structured content: $types")
  }

  test("PNG decoder inverts all five spec filters and accepts a second " +
    "DEFLATE implementation (JDK Deflater), multi-IDAT streams and " +
    "ancillary chunks") {
    val rnd = new scala.util.Random(99)
    val (w, h) = (11, 7)
    val rgb = Array.fill(3 * w * h)(rnd.nextInt(256).toByte)
    (0 to 4).foreach { t =>
      val (dw, dh, back) =
        MediaCodec.decodePng(specPng(w, h, forceFilter(t, w, h, rgb)))
      assert((dw, dh) == ((w, h)) && back.sameElements(rgb),
        s"filter type $t")
    }
    // mixed filters per row + the stream split across two IDAT chunks
    // with an ancillary chunk between them (lowercase first letter →
    // skip, per spec §5.4)
    val stride = 3 * w
    val mixed = new Array[Byte](h * (1 + stride))
    (0 until h).foreach { y =>
      val one = forceFilter(y % 5, w, h, rgb)
      System.arraycopy(one, y * (1 + stride), mixed, y * (1 + stride),
        1 + stride)
    }
    val (dw, dh, back) = MediaCodec.decodePng(
      specPng(w, h, mixed, multiIdat = true, extraChunk = Some("tEXt")))
    assert((dw, dh) == ((w, h)) && back.sameElements(rgb))
  }

  test("PNG decoder rejects corruption loudly: CRC flip, truncation, " +
    "unknown critical chunk, bad filter type, over/undersized IDAT, " +
    "unsupported color type") {
    val rgb = Array.tabulate(3 * 9 * 5)(i => (i * 7).toByte)
    val good = MediaCodec.encodePng(9, 5, rgb)
    // flip one byte INSIDE the IDAT data: chunk framing intact, CRC must
    // catch it before the inflater ever runs
    val crcFlip = good.clone()
    val off = MediaCodec.bodyOffset(good) + 3
    crcFlip(off) = (crcFlip(off) ^ 0x40).toByte
    val e1 = intercept[Exception](MediaCodec.decodePng(crcFlip))
    assert(e1.getMessage.contains("CRC"), e1.getMessage)
    // truncation mid-chunk
    intercept[Exception](
      MediaCodec.decodePng(java.util.Arrays.copyOf(good, good.length - 6)))
    // unknown CRITICAL chunk (uppercase first letter) must reject
    val e2 = intercept[Exception](MediaCodec.decodePng(
      specPng(9, 5, forceFilter(0, 9, 5, rgb), extraChunk = Some("JUNK"))))
    assert(e2.getMessage.contains("critical"), e2.getMessage)
    // filter type 7 is not a spec filter
    val badFilter = forceFilter(0, 9, 5, rgb)
    badFilter(0) = 7
    val e3 = intercept[Exception](MediaCodec.decodePng(specPng(9, 5, badFilter)))
    assert(e3.getMessage.contains("filter"), e3.getMessage)
    // IDAT inflating to more / fewer bytes than IHDR implies
    intercept[Exception](MediaCodec.decodePng(
      specPng(9, 5, forceFilter(0, 9, 5, rgb) :+ 0.toByte)))
    intercept[Exception](MediaCodec.decodePng(
      specPng(9, 5, forceFilter(0, 9, 5, rgb).dropRight(1))))
    // grayscale (color type 0) is not this decoder's subset
    val e4 = intercept[Exception](MediaCodec.decodePng(
      specPng(9, 5, forceFilter(0, 9, 5, rgb), colorType = 0)))
    assert(e4.getMessage.contains("truecolor"), e4.getMessage)
  }

  test("PNG flows through resize (stays PNG, m06PngLen twin matches), " +
    "frame sampling and pHash body offsets") {
    import spark.implicits._
    // graded PNG ids: id%6==5
    val ids = (0L until 120L).filter(_ % 6 == 5)
    val media = spark.createDataset(
      ids.map(id => BinaryPipeline.MediaRow(
        id, "image", BinaryPipeline.synthPayload(id), id / 4)))
    val resized = BinaryPipeline.resize(media, 16).collect()
    resized.foreach { r =>
      assert(MediaCodec.sniff(r.payload) == "png", "resize must stay PNG")
      val (w, h, _) = MediaCodec.decodePng(r.payload)
      assert(w == r.width && h == r.height)
      assert(BinaryPipeline.m06PngLen(r.media_id) == r.payload.length,
        s"id=${r.media_id} m06PngLen != resized PNG length")
    }
    // pHash hashes the zlib body located via the real chunk walk
    ids.foreach { id =>
      val p = BinaryPipeline.synthPayload(id)
      val off = MediaCodec.bodyOffset(p)
      // the body starts with the zlib header this encoder writes
      assert((p(off) & 0xff) == 0x78 && (p(off + 1) & 0xff) == 0x01)
    }
  }
}
