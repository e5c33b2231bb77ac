package graft.multimodal

import java.nio.ByteBuffer

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY §2): media as opaque `binary`
  * columns + typed metadata, with decode/feature-extraction running as a
  * per-partition batch pass.
  *
  * The decode kernel itself is STUBBED (no image/audio libs in this
  * container): [[StubCodec.decode]] parses a deterministic fake header
  * instead of real JPEG/PNG bytes. Everything around it — the schema, the
  * binary payload handling, the mapPartitions batch shape (amortizing
  * per-partition codec init, exactly how a JNI/FFI decoder is driven), and
  * the partitioning story — is real and tested. Swapping StubCodec for a
  * real one changes no plumbing.
  */
object BinaryPipeline {

  case class MediaRow(
      media_id: Long,
      modality: String,        // "image" | "audio"
      payload: Array[Byte],    // opaque encoded bytes
      source_doc: Long)

  case class MediaFeatures(
      media_id: Long,
      modality: String,
      source_doc: Long,
      width: Int,
      height: Int,
      n_bytes: Long,
      features: Array[Float])  // fixed-dim feature vector

  /** Deterministic fake codec. A real implementation decodes
    * payload → pixels/samples; the stub reads the 12-byte header the
    * synthesizer wrote and hashes the body into features. */
  object StubCodec {
    val FeatureDim = 8

    def encode(id: Long, modality: String): Array[Byte] = {
      val body = new Array[Byte](64)
      var i = 0
      while (i < body.length) {
        body(i) = (graft.functions.HashImpls.mix64(id * 64 + i) & 0xff).toByte
        i += 1
      }
      val buf = ByteBuffer.allocate(12 + body.length)
      buf.putInt((id % 640 + 32).toInt)  // width
      buf.putInt((id % 480 + 32).toInt)  // height
      buf.putInt(body.length)
      buf.put(body)
      buf.array()
    }

    /** The stub for the real decoder (???-equivalent, see scaladoc). */
    def decode(payload: Array[Byte]): (Int, Int, Array[Float]) = {
      val buf = ByteBuffer.wrap(payload)
      val w = buf.getInt
      val h = buf.getInt
      val n = buf.getInt
      val feats = new Array[Float](FeatureDim)
      var i = 0
      while (i < n) {
        feats(i % FeatureDim) += (buf.get() & 0xff) / 255.0f
        i += 1
      }
      (w, h, feats)
    }
  }

  /** Deterministic synthetic media table (seeded by id). */
  def synthesize(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { r =>
      val id = r
      val modality = if (id % 3 == 0) "audio" else "image"
      MediaRow(id, modality, StubCodec.encode(id, modality), id / 4)
    }
  }

  /** Decode + feature-extract as a per-partition batch pass. Partition
    * sizing note for 100 TB of media: repartition upstream so a partition
    * is O(100 MB) of payload (`spark.sql.files.maxPartitionBytes` for file
    * sources); codec state is initialized once per partition, not per row.
    */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition codec init would go here (JNI handles, model load)
      rows.map { m =>
        val (w, h, feats) = StubCodec.decode(m.payload)
        MediaFeatures(m.media_id, m.modality, m.source_doc, w, h, m.payload.length.toLong, feats)
      }
    }
  }

  case class ResizedMedia(
      media_id: Long,
      modality: String,
      width: Int,
      height: Int,
      payload: Array[Byte])

  /** Resize (image) / frame-sample (video-like) as a per-partition batch
    * pass. STUB: the real kernel is a pixel resample; the stub rewrites the
    * header dims and down-samples the payload bytes deterministically —
    * the plumbing (schema in/out, batch shape, partition sizing) is what
    * this API pins down. */
  def resize(media: Dataset[MediaRow], maxDim: Int): Dataset[ResizedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val buf = ByteBuffer.wrap(m.payload)
        val w = buf.getInt; val h = buf.getInt; val n = buf.getInt
        // ceiling division so the longer edge lands within maxDim
        val scale = math.max(1,
          (math.max(w, h) + math.max(1, maxDim) - 1) / math.max(1, maxDim))
        val (nw, nh) = (math.max(1, w / scale), math.max(1, h / scale))
        val body = new Array[Byte](math.max(1, n / scale))
        var i = 0
        while (i < body.length) { body(i) = m.payload(12 + i * scale); i += 1 }
        val out = ByteBuffer.allocate(12 + body.length)
        out.putInt(nw); out.putInt(nh); out.putInt(body.length); out.put(body)
        ResizedMedia(m.media_id, m.modality, nw, nh, out.array())
      }
    }
  }

  /** Every `stride`-th frame of a multi-frame payload (video frame
    * sampling analog): explode one row per sampled frame. STUB frame
    * boundaries = fixed 16-byte strides of the body. */
  def sampleFrames(media: Dataset[MediaRow], stride: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      val nFrames = math.max(1, (m.payload.length - 12) / 16)
      (0 until nFrames by stride).map { f =>
        (m.media_id, m.modality, f,
          java.util.Arrays.copyOfRange(m.payload, 12 + f * 16,
            math.min(m.payload.length, 12 + (f + 1) * 16)))
      }
    }.toDF("media_id", "modality", "frame_idx", "frame_bytes")
  }

  /** m01 — the multimodal pipeline as a graded query: synthesize a
    * deterministic media table (seeded by id), decode + feature-extract
    * per partition, aggregate per modality. Rows-only (binary payloads
    * and the stub codec are engine-specific); determinism comes from the
    * seeded synthesis and order-free aggregates. */
  def m01(spark: SparkSession): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    decodeFeatures(synthesize(spark, 2000)).toDF()
      .groupBy(col("modality"))
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("n_bytes")).as("total_bytes"),
        max(col("width")).cast("long").as("max_width"),
        round(avg(col("features")(0)), 4).as("avg_f0"))
      .orderBy("modality")
  }

  /** m02 — frame sampling as a graded query: every 2nd frame of each
    * synthesized payload, aggregated per modality (frame counts, bytes
    * retained). The explode is flatMap (map-side, output rows ∝ frames /
    * stride); only the tiny per-modality aggregate shuffles. Rows-only
    * for the same reason as m01. */
  def m02(spark: SparkSession): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    sampleFrames(synthesize(spark, 2000), stride = 2)
      .groupBy(col("modality"))
      .agg(
        count(lit(1)).as("n_frames"),
        countDistinct(col("media_id")).as("n_media"),
        sum(length(col("frame_bytes"))).as("bytes_kept"))
      .orderBy("modality")
  }

  /** m03 — content-hash dedup over opaque binary payloads, the FIRST
    * step of any media-ingest pipeline (hash the raw encoded bytes
    * BEFORE any decode — exact-copy mass never reaches the codec). The
    * payload here is the document's raw UTF-8 bytes cast to `binary`
    * standing in for encoded media bytes; the fingerprint is md5
    * computed ON the binary column, and the per-source rollup reports
    * payload counts, unique-fingerprint counts, and byte volume. At
    * 100 TB this is a single map-side hash per payload plus a tiny
    * per-source aggregate — no payload bytes cross the shuffle (the
    * md5 projection drops them before the Exchange). SQL-oracled
    * (unlike m01/m02's stub codec): DuckDB's md5 over the same UTF-8
    * text bytes must yield identical dedup counts, proving the
    * binary-side hashing is byte-faithful to the source text. */
  def m03(t: graft.Tables): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    t.documents
      .select(col("source"), col("text").cast("binary").as("payload"))
      .select(col("source"), md5(col("payload")).as("fp"),
        length(col("payload")).as("n_bytes"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_payloads"),
        countDistinct(col("fp")).as("n_unique_payloads"),
        sum(col("n_bytes")).cast("bigint").as("total_bytes"))
      .orderBy("source")
  }

  /** Synthetic media with PLANTED near-duplicates: every id ≡ 7 (mod 10)
    * with id ≥ 12 carries the payload of id−12 (same modality class —
    * 12 ≡ 0 mod 3) with two body bytes SWAPPED — the re-encoded/
    * re-compressed copy a crawl always contains. The perturbation is a
    * swap (not an XOR) deliberately: a swap preserves the body byte SUM,
    * so the pHash mean threshold provably cannot move, only the two
    * swapped positions can change their bit, ≤2 pHash bits flip, and
    * with 4 bands the pigeonhole guarantees ≥2 clean bands — banding
    * recall on plants is 1.0 STRUCTURALLY (an XOR perturbation shifts
    * the mean by 1–2 and any byte near the threshold could flip too,
    * making the same claim merely fixture-empirical). The spec pins it. */
  def synthesizeNearDups(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    synthesize(spark, n).map { m =>
      if (m.media_id % 10 == 7 && m.media_id >= 12) {
        val base = StubCodec.encode(m.media_id - 12,
          if ((m.media_id - 12) % 3 == 0) "audio" else "image")
        val tmp = base(12 + 5)
        base(12 + 5) = base(12 + 40)
        base(12 + 40) = tmp
        MediaRow(m.media_id, m.modality, base, m.source_doc)
      } else m
    }
  }

  /** 64-bit perceptual hash over the payload BODY: bit j = body[j] >
    * body mean — the aHash family's threshold-against-mean shape (real
    * pHash thresholds DCT coefficients; the stub thresholds raw bytes —
    * same locality property: a small payload perturbation flips few
    * bits). Runs in the same mapPartitions batch shape as the codec. */
  def phash(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val body = java.util.Arrays.copyOfRange(m.payload, 12,
          math.min(m.payload.length, 12 + 64))
        var sum = 0L
        body.foreach(b => sum += (b & 0xff))
        val mean = sum / math.max(1, body.length)
        var ph = 0L
        var j = 0
        while (j < body.length) {
          if ((body(j) & 0xff) > mean) ph |= (1L << j)
          j += 1
        }
        (m.media_id, m.modality, ph)
      }
    }.toDF("media_id", "modality", "ph")
  }

  /** m04 — perceptual-hash near-duplicate detection over media payloads
    * (the visual-dedup step of a multimodal curation pipeline: exact
    * hashing (m03) misses every re-encode; pHash Hamming distance
    * catches them). Same machinery as d03's SimHash text dedup applied
    * to the binary modality: the 64-bit pHash splits into 4×16-bit
    * bands, candidates share ≥1 band (a pair within Hamming ≤3 ALWAYS
    * co-buckets by pigeonhole — recall 1.0 on the planted class), and
    * candidates verify with exact `bit_count(a^b) ≤ 6`. Never all-pairs:
    * the self-join is an equi-join on (band_idx, band_val), O(bucket²)
    * only within buckets. Rows-only (binary payloads + stub codec);
    * MultimodalSpec pins the exact expected pair set driver-side. */
  /** Verified pHash near-dup pairs (band-bucketed candidates + exact
    * Hamming ≤ 6) — shared by m04's pair census and m05's blast-radius
    * audit. */
  private def phashPairs(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.functions._
    val ph = phash(synthesizeNearDups(spark, 2000))
    val bands = ph.select(col("media_id"), col("modality"), col("ph"),
      posexplode(array((0 until 4).map(b =>
        expr(s"(ph >> ${16 * b}) & 65535")): _*)).as(Seq("band_idx", "band")))
    bands.as("a")
      .join(bands.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band") === col("b.band") &&
          col("a.media_id") < col("b.media_id") &&
          col("a.modality") === col("b.modality"))
      .select(col("a.modality").as("modality"),
        col("a.media_id").as("id_a"), col("b.media_id").as("id_b"),
        col("a.ph").as("ph_a"), col("b.ph").as("ph_b"))
      .distinct()
      .filter(expr("bit_count(ph_a ^ ph_b) <= 6"))
  }

  def m04(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.functions._
    phashPairs(spark)
      .groupBy("modality")
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("id_b")).as("n_dup_media"),
        sum(expr("cast(bit_count(ph_a ^ ph_b) as bigint)"))
          .as("hamming_sum"))
      .orderBy("modality")
  }

  /** m05 — cross-modal dedup blast radius: media near-dup pairs (m04's
    * verified pHash pairs) mapped back to the DOCUMENTS that carry the
    * removable copies — the audit a multimodal curation pass needs
    * before dropping media (dropping a dup image mutates every document
    * embedding it; the affected-doc count is the review queue). The
    * higher id of each pair is the removable copy (min-id survivorship,
    * d01's rule applied to media); affected docs = distinct source_doc
    * of removable media. Rows-only (synthesized corpus + stub codec);
    * MultimodalSpec pins the exact expectation. */
  def m05(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.functions._
    val owners = synthesizeNearDups(spark, 2000).toDF()
      .select(col("media_id").as("id_b"), col("modality"),
        col("source_doc"))
    phashPairs(spark)
      .select(col("modality"), col("id_b")).distinct()
      .join(owners, Seq("modality", "id_b"))
      .groupBy("modality")
      .agg(countDistinct(col("id_b")).as("n_removable_media"),
        countDistinct(col("source_doc")).as("n_affected_docs"))
      .orderBy("modality")
  }

  /** Join extracted media features back to their source documents —
    * multimodal columns co-live with text in one table. */
  def joinWithDocuments(features: Dataset[MediaFeatures], docs: DataFrame): DataFrame =
    features.toDF()
      .join(docs, col("source_doc") === col("doc_id"))
      .select(col("media_id"), col("modality"), col("doc_id"),
        col("width"), col("height"), col("n_bytes"), col("lang"))
}
