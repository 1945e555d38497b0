package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode}

/** Streaming materialized view — [[graft.ops.IncrementalAgg]] wired into
  * the ingest path the way [[StreamingMerge]] wires MergeOps: a CDC
  * stream of fact-row images ('d' rows leaving with OLD values, anything
  * else entering with NEW values) maintains a queryable aggregate
  * snapshot via `foreachBatch`, so the dashboard table is always one
  * small (group, cnt, sums) frame — never a change log to replay and
  * never a full fact rescan per refresh.
  *
  * Snapshot layout and commit protocol are [[StreamingMerge]]'s
  * (versioned `v=<n>` dirs + atomically-moved `_latest` pointer), so
  * time travel ([[StreamingMerge.snapshotAt]]) and retention
  * ([[StreamingMerge.vacuum]]) apply to aggregate snapshots unchanged.
  *
  * Scale shape per trigger: the batch aggregates to a delta-sized frame;
  * the standing aggregate (itself #groups-sized) splits on the
  * broadcast changed-group key set — the fact is NEVER read.
  */
object StreamingAgg {

  /** Apply one CDC batch to the aggregate snapshot. Exposed for batch
    * use and the stream/batch agreement spec. A first batch bootstraps
    * from an empty aggregate of the same shape.
    */
  def applyBatch(spark: SparkSession, batch: DataFrame,
      groupCols: Seq[String], sumCols: Seq[(String, String)],
      tableDir: String, batchId: Long, opCol: String = "op"): Unit = {
    if (!batch.isEmpty) {
      val base = StreamingMerge.currentSnapshot(spark, tableDir).getOrElse {
        // empty aggregate with the exact output schema applyDelta expects
        batch.filter(lit(false))
          .groupBy(groupCols.map(col): _*)
          .agg(count(lit(1)).as("cnt"),
            sumCols.map { case (src, dst) => sum(col(src)).as(dst) }: _*)
      }
      val next = graft.ops.IncrementalAgg.applyDelta(
        base, batch, groupCols, sumCols, opCol = opCol)
      val version = s"v=$batchId"
      next.write.mode("overwrite").parquet(s"$tableDir/$version")
      val tmp = new java.io.File(tableDir, s"_latest.tmp$batchId").toPath
      java.nio.file.Files.write(tmp,
        version.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      java.nio.file.Files.move(tmp, new java.io.File(tableDir, "_latest").toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
  }

  /** The stream writer: CDC image stream → maintained aggregate
    * snapshot. `changes` must carry `groupCols`, the sum sources, and
    * `opCol`; start + awaitTermination are the caller's.
    */
  def aggStream(changes: DataFrame, groupCols: Seq[String],
      sumCols: Seq[(String, String)], tableDir: String,
      checkpointDir: String, opCol: String = "op"): DataStreamWriter[Row] =
    changes.writeStream
      .outputMode(OutputMode.Update)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch.sparkSession, batch, groupCols, sumCols,
          tableDir, batchId, opCol)
      }
}
