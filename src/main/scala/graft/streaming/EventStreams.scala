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
