package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Structured Streaming surface (SURVEY §2 non-query APIs): the streaming
  * twins of q30 (tumbling window agg) and q31 (gap sessionization).
  *
  * All transforms take an unbounded DataFrame/Dataset (from `readStream` or
  * MemoryStream in tests) and return one — source/sink agnostic, so the
  * same code runs on Kafka at scale. State size is bounded by the
  * watermark (windowed aggs) or by active keys (sessionization): at 1000
  * executors, state is hash-partitioned by group key in the state store.
  */
/** Per-user open-session accumulator for [[EventsStream.sessionizeStateful]].
  * Top-level and public: the state-store encoder's generated code must be
  * able to call the accessors (Janino rejects nested private classes). */
case class SessionState(start: Long, last: Long, n: Long, acc: Double)

/** One buffered event awaiting finality in the reorder-buffered
  * sessionizer (top-level for the encoder-codegen reason above). */
case class SessEv(tsMs: Long, value: Double)

/** Reorder-buffered sessionizer state: the open session (if any), the
  * group's max event time seen (drives the disorder-horizon finality
  * rule), and the events still awaiting finality. */
case class SessBufState(hasOpen: Boolean, start: Long, last: Long,
    n: Long, acc: Double, maxSeenMs: Long, buf: List[SessEv])

/** Per-user running totals for [[EventsStream.runningStats]] (top-level
  * for the same encoder-codegen reason as [[SessionState]]). */
case class RunningStats(n: Long, acc: Double)

/** transformWithState processor (Spark 4 arbitrary-state v2 — the
  * successor of flatMapGroupsWithState, RocksDB-backed with typed state
  * handles and TTL support): maintains per-user running event count and
  * value sum, emitting the updated totals for every input batch. State is
  * one ValueState row per active user — hash-partitioned across
  * executors' state stores, never driver-resident. */
class RunningStatsProcessor
    extends StatefulProcessor[Long, EventsStream.Event, (Long, Long, Double)] {
  @transient private var st: ValueState[RunningStats] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[RunningStats]("running",
      Encoders.product[RunningStats], TTLConfig.NONE)

  override def handleInputRows(key: Long,
      rows: Iterator[EventsStream.Event],
      timerValues: TimerValues): Iterator[(Long, Long, Double)] = {
    var cur = if (st.exists()) st.get() else RunningStats(0L, 0.0)
    rows.foreach(e => cur = RunningStats(cur.n + 1, cur.acc + e.value))
    st.update(cur)
    Iterator.single((key, cur.n, cur.acc))
  }
}

object EventsStream {

  case class Event(
      event_id: Long,
      ts: Timestamp,
      user_id: Long,
      event_type: String,
      value: Double)

  case class SessionSummary(
      user_id: Long,
      session_start: Timestamp,
      session_end: Timestamp,
      n_events: Long,
      sum_value: Double)

  val SessionGap = "30 minutes"
  val SessionGapSec = 1800L
  private val SessionGapMs = 30L * 60 * 1000

  /** Tumbling 1-hour windowed counts with a 2-hour watermark (late data
    * beyond that is dropped; state is evicted past the watermark). */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      // exact integer cents in the state store (value is 2dp): merging
      // partial state across micro-batches is then exact at any scale —
      // a rounded double sum drifts once totals reach ~1e12 (sf10 audit)
      .agg(count(lit(1)).as("cnt"),
        sum(expr("cast(round(value * 100) as bigint)")).as("sum_value_cents"))
      .select(
        col("window.start").as("hour_ts"),
        col("event_type"), col("cnt"), col("sum_value_cents"))

  /** Gap sessionization with the native session_window operator —
    * Spark-first twin of the batch q31. */
  def sessionWindows(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), SessionGap), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(expr("cast(round(value * 100) as bigint)")).as("sum_value_cents"))
      .select(
        col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("sum_value_cents"))

  /** Sliding 1-hour windows every 15 minutes: each event contributes to 4
    * overlapping windows. Same watermark-bounded state as the tumbling
    * path; window assignment is map-side (no extra shuffle vs tumbling). */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(
        col("window.start").as("win_start"),
        col("event_type"), col("cnt"))

  /** Stream-stream interval join: each click pairs with purchases by the
    * same user within the hour after it. Both sides are watermarked and
    * the join carries a time-range condition, so each side's state is
    * evicted once the other's watermark passes the range bound — state is
    * O(events in the horizon), never unbounded. */
  def clickToPurchase(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks
      .select(col("event_id").as("click_id"), col("user_id").as("c_uid"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "2 hours")
    val p = purchases
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_uid"),
        col("ts").as("purchase_ts"), col("value"))
      .withWatermark("purchase_ts", "2 hours")
    c.join(p,
      col("c_uid") === col("p_uid") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("interval 1 hour"))
      .select(col("click_id"), col("purchase_id"), col("c_uid").as("user_id"),
        col("click_ts"), col("purchase_ts"), col("value"))
  }

  /** Left-outer stream-stream interval join: like [[clickToPurchase]] but
    * clicks WITHOUT a purchase in the hour still emit (null purchase
    * side) once the purchase watermark passes their join horizon — the
    * funnel-abandonment query. Same watermark-bounded state as the inner
    * variant; the null-side emission is exactly the state eviction. */
  def clickToPurchaseLeftOuter(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks
      .select(col("event_id").as("click_id"), col("user_id").as("c_uid"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "2 hours")
    val p = purchases
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_uid"),
        col("ts").as("purchase_ts"), col("value"))
      .withWatermark("purchase_ts", "2 hours")
    c.join(p,
      col("c_uid") === col("p_uid") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("interval 1 hour"),
      "leftOuter")
      .select(col("click_id"), col("purchase_id"), col("c_uid").as("user_id"),
        col("click_ts"), col("purchase_ts"), col("value"))
  }

  /** Per-user running totals via transformWithState (Spark 4 state v2;
    * requires the RocksDB state store provider). Update-mode output:
    * each micro-batch emits the new totals for the users it touched. */
  def runningStats(events: Dataset[Event]): Dataset[(Long, Long, Double)] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new RunningStatsProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  /** Stream-static join: enrich the event stream with a dimension table.
    * The static side is planned per micro-batch (broadcast for small
    * dims); no state is kept. */
  def enrichWithDim(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(
      org.apache.spark.sql.functions.broadcast(dim),
      events("user_id") === dim("c_custkey"))
      .select(events("event_id"), events("ts"), events("user_id"),
        events("event_type"), events("value"),
        dim("c_mktsegment").as("segment"))

  /** Streaming exact dedup (the streaming twin of d01): drop re-deliveries
    * of the same event id within the watermark horizon; state is evicted
    * past it, so memory is bounded by the horizon's key cardinality. */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")

  /** foreachBatch sink: stream micro-batches into the partitioned
    * columnar writer, giving the streaming path the same layout as the
    * batch ETL. foreachBatch is AT-LEAST-ONCE (a batch whose files
    * committed before the checkpoint offset was written is re-executed on
    * restart), so each micro-batch overwrites its own batch_id=N
    * subdirectory — replays rewrite exactly their own output instead of
    * appending duplicates, making the sink effectively exactly-once.
    * Readers of `path` see batch_id as a discovered partition column. */
  def sinkPartitioned(events: DataFrame, path: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      batch
        .withColumn("dt", org.apache.spark.sql.functions.to_date(org.apache.spark.sql.functions.col("ts")))
        .write.mode("overwrite")
        // The whole batch_id=N dir is the idempotency unit, so force STATIC
        // overwrite semantics for this write: under the session-wide
        // dynamic mode (GraftSession) a replay would only replace the dt
        // partitions present in the replayed batch, leaving stale dt dirs
        // from a failed attempt whose batch produced a different dt set.
        .option("partitionOverwriteMode", "static")
        .partitionBy("dt")
        .parquet(s"$path/batch_id=$batchId")
    }

  /** Custom-state sessionization via flatMapGroupsWithState: same gap
    * semantics but with arbitrary per-session state (here: value sums),
    * emitting a summary when the gap closes a session. This is the
    * extension point session_window can't express (e.g. model-state per
    * user, conditional emission).
    *
    * Round-6: REORDER-BUFFERED (the st12 pattern) — session boundaries
    * are an event-time-ORDER property (an out-of-order arrival can both
    * belong to an already-extended session and rewind its `last`, which
    * the pre-round-6 fold silently corrupted), so events fold into the
    * open session only once FINAL: at/below the watermark, or — when the
    * caller passes the source's documented reordering horizon
    * (`disorderBoundMs`) — once the group has seen any event a full
    * horizon past them (the within-batch finality signal a days-long
    * historical micro-batch needs; proof in StreamQueries
    * .thresholdCrossings). The rest wait in state; an EventTimeTimeout
    * re-invokes the group when the watermark reaches the oldest held
    * event or the open session's gap deadline, whichever is sooner. The
    * idle-close rule is watermark-sound: once wm ≥ last+gap, every
    * future arrival AND every held event has ts > wm ≥ last+gap — a gap
    * break either way, so the close can never be premature. */
  def sessionizeStateful(events: Dataset[Event],
      disorderBoundMs: Long = Long.MaxValue): Dataset[SessionSummary] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessBufState, SessionSummary](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessBufState]) =>
          val st0 = state.getOption.getOrElse(
            SessBufState(false, 0L, 0L, 0L, 0.0, Long.MinValue, Nil))
          val incoming = batch.map(e => SessEv(e.ts.getTime, e.value)).toList
          val wm = state.getCurrentWatermarkMs()
          val maxSeen = incoming.foldLeft(st0.maxSeenMs)((m, e) =>
            math.max(m, e.tsMs))
          // 1 s slack for ms flooring, as in thresholdCrossings
          val horizonCut =
            if (disorderBoundMs == Long.MaxValue || maxSeen == Long.MinValue)
              Long.MinValue
            else maxSeen - disorderBoundMs - 1000
          val cut = math.max(wm, horizonCut)
          val (ready, hold) = (st0.buf ++ incoming).partition(_.tsMs <= cut)
          var closed = List.empty[SessionSummary]
          var cur: Option[SessionState] =
            if (st0.hasOpen)
              Some(SessionState(st0.start, st0.last, st0.n, st0.acc))
            else None
          ready.sortBy(_.tsMs).foreach { e =>
            cur match {
              // fold is in event-time order over final events, so
              // e.tsMs >= s.last always — `last` is monotone
              case Some(s) if e.tsMs - s.last <= SessionGapMs =>
                cur = Some(s.copy(last = e.tsMs, n = s.n + 1,
                  acc = s.acc + e.value))
              case Some(s) =>
                closed ::= SessionSummary(userId,
                  new Timestamp(s.start), new Timestamp(s.last), s.n, s.acc)
                cur = Some(SessionState(e.tsMs, e.tsMs, 1, e.value))
              case None =>
                cur = Some(SessionState(e.tsMs, e.tsMs, 1, e.value))
            }
          }
          cur match {
            case Some(s) if wm >= s.last + SessionGapMs =>
              closed ::= SessionSummary(userId,
                new Timestamp(s.start), new Timestamp(s.last), s.n, s.acc)
              cur = None
            case _ => ()
          }
          if (cur.isEmpty && hold.isEmpty) state.remove()
          else {
            state.update(SessBufState(cur.isDefined,
              cur.map(_.start).getOrElse(0L), cur.map(_.last).getOrElse(0L),
              cur.map(_.n).getOrElse(0L), cur.map(_.acc).getOrElse(0.0),
              maxSeen, hold))
            val wake = (hold.map(_.tsMs) ++
              cur.map(_.last + SessionGapMs).toList).min
            state.setTimeoutTimestamp(math.max(wake, wm + 1))
          }
          closed.reverseIterator
      }
  }
}
