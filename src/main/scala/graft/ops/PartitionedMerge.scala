package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partition-scoped MERGE — the copy-on-write production shape for a
  * dir-partitioned fact: [[MergeOps.upsert]] is one pass over the BASE;
  * this narrows "the base" to the partitions the delta actually touches.
  * A nightly 1 GB delta landing in 2 of 2,000 date partitions rewrites 2
  * directories; the other 1,998 are never read, never shuffled, never
  * rewritten. Dynamic partition overwrite (`partitionOverwriteMode =
  * dynamic`) commits exactly the partitions present in the written frame
  * — the static mode would DROP the untouched 1,998.
  *
  * The touched-partition set is collected to the driver by design: it is
  * bounded by the number of PARTITIONS in the delta (dates, not rows) and
  * becomes both the base scan's pushed partition filter and the plan's
  * audit record (returned for scheduler approval, mirroring
  * Compaction/retention's plan-first doctrine).
  *
  * The merged frame is `localCheckpoint`ed before the write because the
  * sink overwrites directories the plan reads (Spark correctly refuses a
  * same-path read-overwrite without it); the materialization is
  * touched-partitions-sized, not table-sized. A table format with a
  * transaction log replaces this with file-level copy-on-write; the scan
  * and merge plans are already the ones it would run.
  */
object PartitionedMerge {

  /** Upsert `updates` into the partitioned table at `tableDir`, rewriting
    * only touched partitions. `updates` must carry the base schema
    * including `partCol` (a row "moving" partitions must arrive as a
    * delete+insert via the caller — an upsert keyed on `key` only masks
    * rows within the SAME partition value). Returns the touched
    * partition values, sorted.
    */
  def upsertPartitions(spark: SparkSession, tableDir: String,
      updates: DataFrame, key: String, partCol: String): Seq[String] = {
    val touched = updates.select(col(partCol).cast("string"))
      .distinct().collect().map(_.getString(0)).sorted.toSeq
    require(touched.nonEmpty, "empty update batch")
    val base = spark.read.parquet(tableDir)
      .filter(col(partCol).cast("string").isin(touched: _*))
    val merged = MergeOps.upsert(base, updates, key).localCheckpoint()
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try merged.write.mode("overwrite").partitionBy(partCol).parquet(tableDir)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    touched
  }

  /** TTL expiry at partition granularity: drop every `partCol=<v>`
    * directory whose value is lexicographically below `cutoff` (ISO
    * dates/months sort correctly as strings — the reason time-partitioned
    * layouts use them). A metadata-only delete: no scan, no rewrite, no
    * shuffle — versus a row-level `DELETE WHERE ts < cutoff` that reads
    * and rewrites the whole table to remove its oldest slice. This is the
    * retention twin of [[graft.streaming.StreamingMerge.vacuum]]: vacuum
    * reclaims superseded VERSIONS, this expires aged-out DATA. Returns
    * the partition values dropped, sorted.
    */
  def expirePartitions(tableDir: String, partCol: String,
      cutoff: String): Seq[String] = {
    val dirs = Option(new java.io.File(tableDir).listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith(s"$partCol="))
    val doomed = dirs
      .map(f => f -> f.getName.stripPrefix(s"$partCol="))
      .filter(_._2 < cutoff)
      .sortBy(_._2)
    doomed.foreach { case (dir, _) =>
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete(); ()
      }
      rm(dir)
    }
    doomed.map(_._2).toSeq
  }
}
