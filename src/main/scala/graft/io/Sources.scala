package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** General source/sink surface: every format the engine reads or writes,
  * with explicit schemas on read (never inference — plans with exact types
  * and pruning from the first job) and layout controls on write.
  *
  * At 100 TB the write layout IS the read plan of every downstream job:
  * `partitionByCols` gives partition pruning on the listed columns;
  * `bucketBy` co-locates join/agg keys so repeated joins on the bucket key
  * skip their shuffle entirely.
  */
object Sources {

  // ---------- reads ----------

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def parquet(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).parquet(path)

  def orc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  def csv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true, sep: String = ","): DataFrame =
    spark.read.option("header", header.toString).option("sep", sep)
      .schema(schema).csv(path)

  /** JSON-lines with explicit schema (schema inference on JSON triggers a
    * full extra pass over the data — never at scale). */
  def jsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  // ---------- writes ----------

  /** Parquet sink with optional hive-style partition layout. */
  def writeParquet(
      df: DataFrame,
      path: String,
      partitionByCols: Seq[String] = Nil,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.write.mode(mode)
    val p = if (partitionByCols.nonEmpty) w.partitionBy(partitionByCols: _*) else w
    p.parquet(path)
  }

  def writeOrc(df: DataFrame, path: String,
      partitionByCols: Seq[String] = Nil,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.write.mode(mode)
    val p = if (partitionByCols.nonEmpty) w.partitionBy(partitionByCols: _*) else w
    p.orc(path)
  }

  def writeCsv(df: DataFrame, path: String, header: Boolean = true,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).option("header", header.toString).csv(path)

  def writeJsonLines(df: DataFrame, path: String,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).json(path)

  /** Bucketed managed table: co-locates `bucketCols` so joins/aggregations
    * on them skip the shuffle (requires saveAsTable — bucketing metadata
    * lives in the catalog).
    */
  def writeBucketedTable(
      df: DataFrame,
      table: String,
      bucketCols: Seq[String],
      numBuckets: Int,
      sortCols: Seq[String] = Nil,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(bucketCols.nonEmpty, "bucketing needs at least one column")
    var w = df.write.mode(mode)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    if (sortCols.nonEmpty) w = w.sortBy(sortCols.head, sortCols.tail: _*)
    w.format("parquet").saveAsTable(table)
  }
}
