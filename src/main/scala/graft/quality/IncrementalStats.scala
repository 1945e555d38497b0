package graft.quality

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained table statistics — the statistics face of
  * the incremental-maintenance family ([[graft.ops.IncrementalAgg]]
  * maintains aggregates, [[graft.ops.IncrementalExtrema]] extrema,
  * [[graft.ops.JoinMv]] join views; this maintains the per-column
  * profile the optimizer and the DQ gate read). ANALYZE on a 100 TB
  * table per ingest batch is a full rescan; every statistic here is
  * MERGEABLE, so a batch contributes one delta-sized aggregate and an
  * O(registers) merge:
  *
  *   - count / null-count: add
  *   - min / max: combine (append-only tables — deletes need
  *     [[graft.ops.IncrementalExtrema]]'s reserves, which is why that
  *     module exists)
  *   - NDV: Datasketches HLL sketches union EXACTLY — the union of
  *     per-batch sketches is the same sketch state as one pass over
  *     the full table would build modulo sparse/dense promotion
  *     timing, so the estimate stays in the one-shot error envelope
  *     forever (no drift with batch count; spec-pinned)
  *
  * The stats table lives as one parquet dir of (column, cnt, n_null,
  * min_v, max_v, ndv_sketch) rows — column-count-sized, trivially
  * read-whole. Values are profiled as LONG (the integer-cents doctrine:
  * exact min/max comparison cross-engine; callers pre-scale).
  */
object IncrementalStats {

  private def profile(batch: DataFrame, cols: Seq[String]): DataFrame = {
    val spark = batch.sparkSession
    cols.map { c =>
      batch.select(col(c).cast("long").as("v"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("v").isNull.cast("long")).as("n_null"),
          min(col("v")).as("min_v"),
          max(col("v")).as("max_v"),
          hll_sketch_agg(col("v")).as("ndv_sketch"))
        .select(lit(c).as("col_name"), col("cnt"), col("n_null"),
          col("min_v"), col("max_v"), col("ndv_sketch"))
    }.reduce(_ unionByName _)
  }

  /** Profile the base once and persist the stats table. */
  def init(table: DataFrame, cols: Seq[String], statsDir: String): Unit = {
    require(cols.nonEmpty, "at least one column")
    profile(table, cols).coalesce(1)
      .write.mode("overwrite").parquet(statsDir)
  }

  /** Fold an append batch in: one delta-sized aggregate per column, one
    * merge against the stored rows, rewrite of the column-count-sized
    * stats table. The base is never touched.
    */
  def update(spark: SparkSession, statsDir: String, batch: DataFrame): Unit = {
    val stored = spark.read.parquet(statsDir)
    val cols = stored.select("col_name").collect().map(_.getString(0)).toSeq
    val merged = stored.unionByName(profile(batch, cols))
      .groupBy(col("col_name"))
      .agg(sum(col("cnt")).as("cnt"),
        sum(col("n_null")).as("n_null"),
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v"),
        hll_union_agg(col("ndv_sketch")).as("ndv_sketch"))
      .localCheckpoint() // the sink overwrites the dir the plan reads
    merged.coalesce(1).write.mode("overwrite").parquet(statsDir)
  }

  /** The served profile: exact counters + the sketch's NDV estimate. */
  def report(spark: SparkSession, statsDir: String): DataFrame =
    spark.read.parquet(statsDir)
      .select(col("col_name"), col("cnt"), col("n_null"),
        col("min_v"), col("max_v"),
        hll_sketch_estimate(col("ndv_sketch")).as("ndv_est"))
}
