package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the events-shaped stream
  * (event_id, ts, user_id, event_type, value).
  *
  * The reference is batch-only (SURVEY §2.11), but the engine targets
  * streaming ingestion at scale, so the batch event queries in
  * RelationalQueries have streaming twins here: `readStream` → transform →
  * `writeStream`, with event-time watermarks bounding state. Every
  * transform below accepts either a batch or a streaming DataFrame — the
  * logical plan is identical; only the sink differs.
  */
object EventStreams {

  final case class Event(
      event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class SessionUpdate(
      user_id: Long, n_events: Long, session_start: Timestamp,
      session_end: Timestamp, closed: Boolean)

  /** Tumbling-window counts/sums per event type with a watermark bounding
    * late data and state size (the streaming twin of q_events_window).
    */
  def windowedAgg(
      events: DataFrame,
      windowDuration: String = "1 hour",
      watermarkDelay: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowDuration), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n"), col("total_value"))

  /** Gap-based sessionization with the built-in session_window (the
    * streaming twin of q_events_sessions' 30-minute-gap rule).
    */
  def sessionWindows(
      events: DataFrame,
      gap: String = "30 minutes",
      watermarkDelay: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("total_value"))

  /** Custom per-key state: running event counts per user via
    * mapGroupsWithState with processing-time timeout — the
    * KeyValueGroupedDataset state API the built-ins can't express.
    */
  def runningUserCounts(
      spark: SparkSession,
      events: Dataset[Event],
      timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout)
      : Dataset[(Long, Long)] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[Long, (Long, Long)](timeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[Long]) =>
          val newCount = state.getOption.getOrElse(0L) + batch.size
          state.update(newCount)
          (userId, newCount)
      }
  }

  /** Running-count state row: `expired = true` marks the final count emitted
    * when the watermark passed the user's last event + TTL and the state was
    * dropped.
    */
  final case class UserCount(user_id: Long, n_events: Long, expired: Boolean)

  /** Event-time variant of [[runningUserCounts]]: state for a user idle past
    * `idleTtlMinutes` (in EVENT time) is expired by the watermark, emitting
    * a final `expired = true` row — so state size is bounded by the active-
    * user set, not the all-time user set, and a stalled source cannot evict
    * anyone (the data clock, not the wall clock, drives expiry). The
    * production-correct form of a running profile at 100 TB/day event
    * volume. Requires a watermark on `ts` upstream (set here).
    */
  def runningUserCountsEventTime(
      spark: SparkSession,
      events: Dataset[Event],
      idleTtlMinutes: Long = 60,
      watermarkDelay: String = "30 minutes"): Dataset[UserCount] = {
    import spark.implicits._
    val ttlMs = idleTtlMinutes * 60000L
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, Long), UserCount](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[(Long, Long)]) =>
          if (state.hasTimedOut) {
            val (n, _) = state.get
            state.remove()
            Iterator.single(UserCount(userId, n, expired = true))
          } else {
            var (n, lastTs) = state.getOption.getOrElse((0L, Long.MinValue))
            batch.foreach { e => n += 1; lastTs = math.max(lastTs, e.ts.getTime) }
            state.update((n, lastTs))
            state.setTimeoutTimestamp(lastTs + ttlMs)
            Iterator.single(UserCount(userId, n, expired = false))
          }
      }
  }

  /** Open-session state carried between triggers. */
  final case class SessionState(start: Long, end: Long, n: Long, total: Double)

  /** Gap-based sessionization with EVENT-TIME timeout —
    * `flatMapGroupsWithState(EventTimeTimeout)` emitting a session row the
    * moment the watermark passes sessionEnd + gap, so state expiry is
    * driven by the data clock, not the wall clock (the production-correct
    * form: a stalled source cannot prematurely close sessions, a burst of
    * late-but-in-watermark events still lands in its session).
    *
    * Per user the state is ONE open session (start, end, n, total); events
    * within `gap` of the session end extend it, a larger gap closes it and
    * emits it immediately. Closed sessions are emitted exactly once.
    * Requires a watermark on `ts` upstream. In batch mode Spark hands each
    * key all its events at once with no timeouts, so the operator
    * degenerates to exact batch sessionization with the trailing session
    * emitted too (hasTimedOut is never true, state is discarded at the
    * end — the `finalizeOpen` flag covers the batch case).
    */
  def sessionizeEventTime(
      spark: SparkSession,
      events: Dataset[Event],
      gapMinutes: Long = 30,
      watermarkDelay: String = "30 minutes",
      finalizeOpen: Boolean = false): Dataset[SessionUpdate] = {
    import spark.implicits._
    val gapMs = gapMinutes * 60000L
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionUpdate](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          def emit(s: SessionState, closed: Boolean) = SessionUpdate(
            userId, s.n, new Timestamp(s.start), new Timestamp(s.end), closed)
          if (state.hasTimedOut) {
            // watermark passed end+gap: no in-gap event can still arrive
            val out = emit(state.get, closed = true)
            state.remove()
            Iterator.single(out)
          } else {
            val sorted = batch.toArray.sortBy(e => (e.ts.getTime, e.event_id))
            var open = state.getOption
            val closedOut = Seq.newBuilder[SessionUpdate]
            sorted.foreach { e =>
              val t = e.ts.getTime
              open match {
                case Some(s) if t - s.end <= gapMs =>
                  open = Some(SessionState(s.start, math.max(s.end, t),
                    s.n + 1, s.total + e.value))
                case Some(s) =>
                  closedOut += emit(s, closed = true)
                  open = Some(SessionState(t, t, 1, e.value))
                case None =>
                  open = Some(SessionState(t, t, 1, e.value))
              }
            }
            open match {
              case Some(s) if finalizeOpen => // batch mode: emit the tail too
                closedOut += emit(s, closed = false)
              case Some(s) =>
                state.update(s)
                state.setTimeoutTimestamp(s.end + gapMs)
              case None => ()
            }
            closedOut.result().iterator
          }
      }
  }

  /** Funnel-stage state: first qualifying time per stage (-1 = not yet). */
  final case class FunnelState(tView: Long, tClick: Long, done: Boolean)

  /** A user advancing to funnel stage 1 (view), 2 (click), 3 (purchase). */
  final case class FunnelUpdate(user_id: Long, stage: Int, at: Timestamp)

  /** STREAMING conversion funnel (view → click → purchase with a
    * per-stage time window): emits one row the moment a user advances a
    * stage, instead of recomputing the whole funnel per batch. Per-user
    * state is three timestamps; event-time timeout removes it once the
    * watermark passes tView + 2·window (after which no further
    * advancement is possible), so state is bounded by ACTIVE funnels, not
    * users ever seen.
    *
    * Semantics match the batch q_events_funnel fold exactly when per-user
    * event-time order is preserved across triggers (events within one
    * trigger are sorted; a stage-1 event arriving in a LATER trigger than
    * an already-rejected stage-2 event cannot retroactively unlock it —
    * streaming can't rewind emissions; the exact delta is pinned by
    * EventStreamsSpec's adversarial-trigger test). Batch mode hands each
    * key all its events at once, so the same fold IS the batch funnel;
    * pass `setTimeouts = false` there (no watermark exists to time
    * against).
    *
    * Bounded-state trade-off: the event-time timeout removes state for
    * COMPLETED funnels too — a view arriving after the watermark passes
    * tView + 2·window re-opens the funnel and re-emits stage 1 (and
    * later stages) for the same user, where the batch fold (which keys
    * everything to the user's first view ever) would not. Keeping done
    * markers forever would make state grow with users-ever-seen instead
    * of active funnels — the wrong trade at 100 TB/day; deduplicate
    * per-user stages downstream if exactly-once-per-user emission
    * matters. Pinned by the post-expiry re-open spec.
    */
  def funnelStages(
      spark: SparkSession,
      events: Dataset[Event],
      windowMinutes: Long = 1440,
      watermarkDelay: String = "1 hour",
      setTimeouts: Boolean = true): Dataset[FunnelUpdate] = {
    import spark.implicits._
    val winMs = windowMinutes * 60000L
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelUpdate](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var s = state.getOption.getOrElse(FunnelState(-1L, -1L, false))
            val out = Seq.newBuilder[FunnelUpdate]
            batch.toArray.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
              val t = e.ts.getTime
              e.event_type match {
                case "view" if s.tView < 0 =>
                  s = s.copy(tView = t)
                  out += FunnelUpdate(userId, 1, e.ts)
                case "click" if s.tView >= 0 && s.tClick < 0 &&
                    t >= s.tView && t < s.tView + winMs =>
                  s = s.copy(tClick = t)
                  out += FunnelUpdate(userId, 2, e.ts)
                case "purchase" if s.tClick >= 0 && !s.done &&
                    t >= s.tClick && t < s.tClick + winMs =>
                  s = s.copy(done = true)
                  out += FunnelUpdate(userId, 3, e.ts)
                case _ => ()
              }
            }
            // state survives completion UNTIL the event-time timeout: a
            // duplicate view inside the window cannot re-open the funnel,
            // but one arriving after expiry re-emits stage 1 (the
            // documented bounded-state trade-off — see scaladoc)
            state.update(s)
            if (setTimeouts && s.tView >= 0)
              state.setTimeoutTimestamp(s.tView + 2 * winMs)
            out.result().iterator
          }
      }
  }

  /** Stream-stream interval join: each purchase attributed to every click
    * by the same user in the preceding `horizonMinutes` (event time). The
    * canonical two-stream join shape: BOTH sides watermarked and the join
    * condition time-bounded in BOTH directions, so each side's buffered
    * state is a sliding window (watermark + horizon deep), not the full
    * history — without the range bound Spark must hold one side forever.
    * On a batch DataFrame `withWatermark` is a no-op and the same plan is
    * an ordinary interval join (the oracled q_events_attribution twin).
    */
  def attributionJoin(
      events: DataFrame,
      horizonMinutes: Long = 60,
      watermarkDelay: String = "30 minutes"): DataFrame =
    attributionJoinImpl(events, horizonMinutes, watermarkDelay, "inner")

  /** LEFT-OUTER stream-stream interval join — the funnel-DROPOUT face of
    * [[attributionJoin]]: every click emits, converted ones with their
    * purchases, unconverted ones with NULLs — but only once the watermark
    * has passed click_ts + horizon, i.e. once no future purchase can
    * still match (Spark holds the click in state until then; the
    * time-range bound keeps that state a sliding window, exactly as in
    * the inner face). On a batch frame the same plan is an ordinary
    * left-outer interval join — the oracled q_events_attribution_outer
    * twin; EventStreamsSpec drives the STREAMING face through a
    * watermark advance and pins the null emission.
    */
  def attributionJoinOuter(
      events: DataFrame,
      horizonMinutes: Long = 60,
      watermarkDelay: String = "30 minutes"): DataFrame =
    attributionJoinImpl(events, horizonMinutes, watermarkDelay, "leftOuter")

  private def attributionJoinImpl(
      events: DataFrame,
      horizonMinutes: Long,
      watermarkDelay: String,
      joinType: String): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", watermarkDelay)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("purchase_ts"), col("value"))
      .withWatermark("purchase_ts", watermarkDelay)
    clicks.join(purchases,
        col("user_id") === col("p_user") &&
          col("purchase_ts") >= col("click_ts") &&
          col("purchase_ts") <
            col("click_ts") + expr(s"INTERVAL $horizonMinutes MINUTES"),
        joinType)
      .select(col("click_id"), col("purchase_id"), col("user_id"),
        col("click_ts"), col("purchase_ts"), col("value"))
  }

  /** Streaming exact dedup — the streaming twin of the batch
    * `Dedup.exactGroups` keep-first semantics: a row whose `keyCols` were
    * already seen is dropped, and the dedup state is BOUNDED by the
    * watermark (`dropDuplicatesWithinWatermark`), so at 100 TB/day the
    * state holds only the watermark window's keys, not the all-time key
    * set. Exactly the shape for at-least-once sources (Kafka replays,
    * retried file batches) feeding a training-data lake.
    */
  def dedupStream(
      events: DataFrame,
      keyCols: Seq[String],
      watermarkDelay: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Streaming model scoring: apply a fitted Proximity forest to a stream
    * of feature rows (broadcast model, stateless map — scales with input
    * rate, exactly-once under any sink that supports it). The same
    * `predict` contract as the batch path.
    */
  def scoreStream(
      spark: SparkSession,
      forest: graft.tree.ProximityForestModel,
      stream: DataFrame,
      featureCols: Seq[String],
      predictionCol: String = "prediction"): DataFrame =
    graft.local.LocalTrainer.predict(spark, forest, stream, featureCols, predictionCol)

  /** Stream–static enrich: decorate each event with a slowly-changing
    * reference dimension via a broadcast left-outer join — the standard
    * firehose-decoration shape. Stateless (no watermark, no streaming
    * state): the dimension ships to executors once per trigger and the
    * stream side never shuffles, so a 100 TB/day stream enriches at scan
    * parallelism. Works identically on a batch frame (the oracled
    * q_events_enrich twin).
    *
    * Broadcast discipline (BroadcastGatingSpec doctrine): the hint is
    * GATED on the dimension's estimated plan size — a forced broadcast of
    * a dim that grew past executor memory is an OOM, not a slow join.
    * Over the cap the planner decides instead (still broadcast if its own
    * threshold allows; otherwise a per-micro-batch shuffled join — slower
    * but correct).
    */
  def enrichStream(events: DataFrame, dim: DataFrame, key: String,
      maxBroadcastBytes: Long = 256L * 1024 * 1024): DataFrame = {
    val est = dim.queryExecution.optimizedPlan.stats.sizeInBytes
    val side = if (est <= maxBroadcastBytes) broadcast(dim) else dim
    events.join(side, Seq(key), "left_outer")
  }

  /** File-source entry: stream the events table layout from a directory of
    * parquet (the production shape: object-store prefix, many files).
    */
  def readEventStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema("event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE")
      .parquet(dir)

  /** Parquet sink with checkpointing — the durable end of the pipeline. */
  def writeParquetStream(df: DataFrame, outDir: String, checkpointDir: String) =
    df.writeStream
      .outputMode(OutputMode.Append)
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .format("parquet")
}
