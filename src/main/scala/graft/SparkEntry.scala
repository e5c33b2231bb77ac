package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Analytics, CatalogOps, Extended, GraphOps, Grouped, Reference, Relational}
import graft.text.TextOps
import graft.dedup.Dedup
import graft.similarity.Similarity

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  private def lift(m: Map[String, Tables => DataFrame])
      : Map[String, (SparkSession, String) => DataFrame] =
    m.map { case (name, fn) =>
      name -> ((spark: SparkSession, dir: String) => fn(Tables(spark, dir)))
    }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q21(Tables(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    lift(Reference.queries) ++ lift(Relational.queries) ++
      lift(Extended.queries) ++ lift(Grouped.queries) ++
      lift(Analytics.queries) ++ lift(CatalogOps.queries) ++
      lift(GraphOps.queries) ++
      lift(TextOps.queries) ++ lift(Dedup.queries) ++
      lift(Similarity.queries) ++
      lift(graft.pipeline.PipelineQueries.queries) ++
      graft.streaming.StreamQueries.queries ++
      Map(
        "m01_media_features" -> ((s: SparkSession, _: String) =>
          graft.multimodal.BinaryPipeline.m01(s)),
        "m02_frame_sample" -> ((s: SparkSession, _: String) =>
          graft.multimodal.BinaryPipeline.m02(s)),
        "m03_media_fingerprint" -> ((s: SparkSession, dir: String) =>
          graft.multimodal.BinaryPipeline.m03(Tables(s, dir))),
        "m04_phash_neardup" -> ((s: SparkSession, _: String) =>
          graft.multimodal.BinaryPipeline.m04(s)),
        "m05_cross_modal_blast" -> ((s: SparkSession, _: String) =>
          graft.multimodal.BinaryPipeline.m05(s)),
        "m06_media_resize" -> ((s: SparkSession, _: String) =>
          graft.multimodal.BinaryPipeline.m06(s)),
        "m07_audio_transcode" -> ((s: SparkSession, _: String) =>
          graft.multimodal.BinaryPipeline.m07(s)))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → driver rows-only check. */
  def oracleSql: Map[String, String] =
    Reference.oracles ++ Relational.oracles ++ Extended.oracles ++
      Grouped.oracles ++ Analytics.oracles ++ CatalogOps.oracles ++
      GraphOps.oracles ++
      TextOps.oracles ++ Dedup.oracles ++ Similarity.oracles ++
      graft.pipeline.PipelineQueries.oracles ++
      Map(
        // binary-payload fingerprint dedup: DuckDB md5(VARCHAR) hashes
        // the same UTF-8 bytes Spark's md5(binary) sees after the cast
        "m03_media_fingerprint" ->
          """SELECT source, count(*) AS n_payloads,
            | CAST(count(DISTINCT md5(text)) AS BIGINT)
            |   AS n_unique_payloads,
            | CAST(sum(octet_length(encode(text))) AS BIGINT)
            |   AS total_bytes
            |FROM documents GROUP BY source ORDER BY source""".stripMargin,
        // the real-container frame walk (BMP scanlines without padding,
        // 256-sample WAV blocks with a short tail) re-derived as pure
        // integer arithmetic over the synthesis rule — gates the decoder's
        // structural walk from outside the JVM
        "m02_frame_sample" -> graft.multimodal.BinaryPipeline.m02OracleSql,
        // resize round trip: dims/byte sizes as integer arithmetic over
        // range(0, NMedia), content sums from the codec-free VALUES twin
        "m06_media_resize" -> graft.multimodal.BinaryPipeline.m06OracleSql,
        // transcode-to-PCM: bytes in/out as closed forms per container,
        // content sums from the SAME codec-free twin as st16 (PCM
        // re-encode is lossless over the decoded stream)
        "m07_audio_transcode" -> graft.multimodal.BinaryPipeline.m07OracleSql,
        // the streaming queries must reproduce their batch twins exactly,
        // so they share the twins' oracle SQL verbatim
        "st01_stream_window_agg" -> Relational.oracles("q30_time_bucket_agg"),
        "st02_stream_sessionize" -> Relational.oracles("q31_sessionize"),
        // the flatMapGroupsWithState state machine must reproduce the
        // same batch sessionization as st02's native session_window
        "st08_stateful_sessionize" -> Relational.oracles("q31_sessionize"),
        // the cross-micro-batch observed counters must equal the one-pass
        // batch audit exactly (integer cents in the counter)
        "st09_stream_observe" ->
          """SELECT CAST(count(*) AS BIGINT) AS n_events,
            | CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
            |   AS sum_value_cents,
            | CAST(count(CASE WHEN value < 0 THEN 1 END) AS BIGINT)
            |   AS n_negative
            |FROM events""".stripMargin,
        // the streaming curation gates (t02 quality rule ∘ d01 canonical
        // fingerprint dedup) must equal the batch composition exactly;
        // (source, fp) dedup keys make the count order-independent
        "st10_stream_curation" ->
          raw"""WITH q AS (
             |  SELECT source, text FROM (
             |    SELECT source, text,
             |      CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
             |        AS ntk,
             |      length(regexp_replace(text, '[^.,!?;:]', '', 'g'))
             |        AS npunct,
             |      length(text) AS nch
             |    FROM documents)
             |  WHERE ntk BETWEEN 10 AND 1000 AND npunct * 1.0 / nch < 0.2)
             |SELECT source,
             |  CAST(count(DISTINCT
             |    md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))))
             |    AS BIGINT) AS n_unique
             |FROM q GROUP BY source ORDER BY source""".stripMargin,
        // the streaming sampler must keep EXACTLY the batch sampler's
        // documents (p03's composition minus packing): the keep decision
        // is a pure doc_id hash, so order/batching cannot move it
        "st11_stream_mix_sample" ->
          raw"""WITH docs AS (
             |  SELECT doc_id, source,
             |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
             |      AS n_tokens,
             |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
             |      AS BIGINT) AS h32
             |  FROM documents),
             |per_src AS (
             |  SELECT source, CAST(sum(n_tokens) AS BIGINT) AS src_tokens
             |  FROM docs GROUP BY source),
             |tot AS (SELECT CAST(sum(src_tokens) AS BIGINT) AS tot_tokens,
             |               count(*) AS n_sources FROM per_src),
             |weights AS (
             |  SELECT source, least(10000,
             |    (tot_tokens // (2 * n_sources)) * 10000 // src_tokens)
             |    AS weight_bp
             |  FROM per_src, tot)
             |SELECT d.source, count(*) AS n_kept,
             |  CAST(sum(d.n_tokens) AS BIGINT) AS kept_tokens
             |FROM docs d JOIN weights w USING (source)
             |WHERE d.h32 * 10000 < w.weight_bp * 4294967296
             |GROUP BY d.source ORDER BY d.source""".stripMargin,
        // the end-of-stream leaderboard must equal the batch top-10
        "st13_stream_leaderboard" -> Analytics.oracles("q88_global_topk"),
        // the streaming LSH near-dup index must land on the bit-identical
        // pair relation batch d02 computes, so it shares d02's md5-MinHash
        // oracle verbatim (round-7: the md5 rebase made both oracle-able)
        "st14_stream_neardup" -> Dedup.oracles("d02_dedup_minhash"),
        // the streamed CDC apply must land on the SAME merged table as
        // the one-shot batch MERGE (chunked apply commutes because
        // changeset keys are unique), so it shares q82's oracle verbatim
        "st18_stream_upsert" -> Analytics.oracles("q82_merge_upsert"),
        // the bucket-pruned apply must land on the SAME merged table —
        // buckets partition the key space, so per-bucket merge of the
        // bucket's own changes equals the global merge
        "st19_stream_upsert_pruned" -> Analytics.oracles("q82_merge_upsert"),
        // the micro-batched admission stream must reproduce p06's batch
        // admission decision exactly (first-arrival-wins over the
        // doc_id-range replay ≡ min-doc_id survivorship), so it shares
        // p06's composed oracle verbatim
        "st17_stream_admission" ->
          graft.pipeline.PipelineQueries.oracles("p06_incremental_curation"),
        // streaming decode-at-ingest: the cross-batch (modality,
        // container) rollup must equal the codec-free synthesis-rule
        // arithmetic (closed-form WAV/BMP/PPM sizes, RLE-walk TGA
        // lengths, per-id content sums as VALUES) — no table needed,
        // the media corpus is a pure function of range(0, NMedia)
        "st16_stream_media_ingest" ->
          graft.multimodal.BinaryPipeline.st16OracleSql,
        // the stateful first-crossing alert must equal the batch
        // running-sum first crossing (event-time order, integer cents)
        "st12_stream_threshold_alert" ->
          """WITH r AS (
            |  SELECT user_id,
            |    sum(CAST(round(value * 100) AS BIGINT)) OVER (
            |      PARTITION BY user_id ORDER BY ts, event_id
            |      ROWS UNBOUNDED PRECEDING) AS cum,
            |    row_number() OVER (
            |      PARTITION BY user_id ORDER BY ts, event_id) AS rn
            |  FROM events),
            |c AS (SELECT user_id, min(rn) AS n_events_at_cross
            |      FROM r WHERE cum >= 100000 GROUP BY user_id)
            |SELECT c.user_id,
            |  CAST(c.n_events_at_cross AS BIGINT) AS n_events_at_cross,
            |  CAST(r.cum AS BIGINT) AS cents_at_cross
            |FROM c JOIN r ON r.user_id = c.user_id
            |  AND r.rn = c.n_events_at_cross
            |ORDER BY c.user_id""".stripMargin,
        // streaming dedup+count must equal the batch DISTINCT exactly
        "st03_stream_dedup" ->
          """SELECT event_type,
            | CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
            |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
        // stream-static enrich must equal the batch join+rollup (exact
        // integer cents — see StreamQueries.st05)
        "st05_stream_enrich" ->
          """SELECT n_name, count(*) AS n_events,
            | CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
            |   AS sum_value_cents
            |FROM events JOIN nation ON user_id % 25 = n_nationkey
            |GROUP BY n_name ORDER BY n_name""".stripMargin,
        // transformWithState running totals must equal the batch rollup
        "st06_stream_running_totals" ->
          """SELECT user_id, count(*) AS n_events,
            | CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
            |   AS sum_value_cents
            |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
        // the streaming left-outer interval join must equal the batch
        // LEFT JOIN (matched pairs AND null-side abandonment rows)
        "st07_stream_outer_join" ->
          """SELECT c.user_id AS user_id, count(*) AS n_rows,
            | CAST(count(p.ts) AS BIGINT) AS n_matched
            |FROM events c LEFT JOIN events p
            |  ON c.user_id = p.user_id AND p.event_type = 'purchase'
            | AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 10 MINUTE
            |WHERE c.event_type = 'click'
            |GROUP BY c.user_id ORDER BY user_id""".stripMargin,
        // the crash-and-restart run must land on the SAME batch self-join
        // answer as the uninterrupted st04 — loss (skipped batch / wrong
        // state version) and duplication (replayed pairs re-emitted) both
        // break this equality
        "st15_checkpoint_recovery" ->
          """SELECT c.user_id AS user_id, count(*) AS n_pairs
            |FROM events c JOIN events p
            |  ON c.user_id = p.user_id
            | AND c.event_type = 'click' AND p.event_type = 'purchase'
            | AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 10 MINUTE
            |GROUP BY c.user_id ORDER BY user_id""".stripMargin,
        // the streaming interval join must equal the batch self-join
        "st04_stream_join" ->
          """SELECT c.user_id AS user_id, count(*) AS n_pairs
            |FROM events c JOIN events p
            |  ON c.user_id = p.user_id
            | AND c.event_type = 'click' AND p.event_type = 'purchase'
            | AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 10 MINUTE
            |GROUP BY c.user_id ORDER BY user_id""".stripMargin)
}
