package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import EventStreams.Event

class EventStreamsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._
  implicit private lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  private val batch = Seq(
    Event(1, ts(0), 100, "click", 1.0),
    Event(2, ts(5), 100, "click", 2.0),
    Event(3, ts(10), 200, "view", 3.0),
    Event(4, ts(50), 100, "click", 4.0)) // > 30 min gap from event 2

  test("windowedAgg on a MemoryStream emits per-window per-type aggregates") {
    val stream = MemoryStream[Event]
    stream.addData(batch: _*)
    val q = EventStreams.windowedAgg(stream.toDF(), "15 minutes", "5 minutes")
      .writeStream.format("memory").queryName("win_out")
      .outputMode(OutputMode.Complete).start()
    try {
      q.processAllAvailable()
      val rows = spark.table("win_out")
        .select("event_type", "n", "total_value")
        .as[(String, Long, Double)].collect().toSet
      assert(rows.contains(("click", 2L, 3.0))) // 10:00 + 10:05 in [10:00,10:15)
      assert(rows.contains(("view", 1L, 3.0)))
      assert(rows.contains(("click", 1L, 4.0))) // 10:50 window
    } finally q.stop()
  }

  test("sessionWindows groups by 30-minute gaps per user") {
    val stream = MemoryStream[Event]
    stream.addData(batch: _*)
    val q = EventStreams.sessionWindows(stream.toDF(), "30 minutes", "10 minutes")
      .writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Complete).start()
    try {
      q.processAllAvailable()
      val rows = spark.table("sess_out")
        .select("user_id", "n_events").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
      assert(rows(100L) === Seq(1L, 2L)) // two sessions: {e1,e2}, {e4}
      assert(rows(200L) === Seq(1L))
    } finally q.stop()
  }

  test("runningUserCounts accumulates state across triggers") {
    val stream = MemoryStream[Event]
    val counts = EventStreams.runningUserCounts(spark, stream.toDS())
    val q = counts.writeStream.format("memory").queryName("state_out")
      .outputMode(OutputMode.Update).start()
    try {
      stream.addData(batch.take(3): _*)
      q.processAllAvailable()
      stream.addData(batch.drop(3): _*)
      q.processAllAvailable()
      val finalCounts = spark.table("state_out")
        .groupBy("_1").agg(org.apache.spark.sql.functions.max("_2").as("n"))
        .as[(Long, Long)].collect().toMap
      assert(finalCounts(100L) === 3L) // 2 in first trigger + 1 in second
      assert(finalCounts(200L) === 1L)
    } finally q.stop()
  }

  test("scoreStream applies a broadcast forest to streaming rows") {
    import graft.tree.{PLeaf, ProximityForestModel, ProximityTreeModel}
    val leafModel = ProximityForestModel(
      IndexedSeq(ProximityTreeModel(PLeaf(7), 7)), IndexedSeq(1.0), useWeighting = false)
    val stream = MemoryStream[(Double, Double)]
    stream.addData((1.0, 2.0), (3.0, 4.0))
    val scored = EventStreams.scoreStream(spark, leafModel,
      stream.toDF().toDF("_f0", "_f1"), Seq("_f0", "_f1"))
    val q = scored.writeStream.format("memory").queryName("score_out")
      .outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      val preds = spark.table("score_out").select("prediction")
        .as[Int].collect()
      assert(preds.toSeq === Seq(7, 7))
    } finally q.stop()
  }

  test("file-source stream: parquet directory -> windowed agg -> parquet sink") {
    val base = java.nio.file.Files.createTempDirectory("evt_stream").toString
    batch.toDF().write.parquet(s"$base/in")
    val stream = EventStreams.readEventStream(spark, s"$base/in")
    assert(stream.isStreaming)
    val q = EventStreams.writeParquetStream(
      EventStreams.windowedAgg(stream, "15 minutes", "5 minutes")
        .withColumn("window_start", org.apache.spark.sql.functions.col("window_start")),
      s"$base/out", s"$base/chk").start()
    try q.processAllAvailable() finally q.stop()
    // append-mode watermark sinks only emit closed windows; re-reading the
    // sink directory must at least yield the schema and any closed rows
    val out = spark.read.parquet(s"$base/out")
    assert(out.columns.toSet ===
      Set("window_start", "window_end", "event_type", "n", "total_value"))
  }

  test("streaming and batch windowedAgg agree on the same data") {
    val batchOut = EventStreams.windowedAgg(batch.toDF(), "15 minutes", "5 minutes")
      .select("event_type", "n", "total_value")
      .as[(String, Long, Double)].collect().toSet
    val stream = MemoryStream[Event]
    stream.addData(batch: _*)
    val q = EventStreams.windowedAgg(stream.toDF(), "15 minutes", "5 minutes")
      .writeStream.format("memory").queryName("agree_out")
      .outputMode(OutputMode.Complete).start()
    try {
      q.processAllAvailable()
      val streamOut = spark.table("agree_out")
        .select("event_type", "n", "total_value")
        .as[(String, Long, Double)].collect().toSet
      assert(streamOut === batchOut)
    } finally q.stop()
  }
}
