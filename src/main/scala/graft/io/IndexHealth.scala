package graft.io

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Shared plumbing for the persistent-index maintenance loops
  * ([[graft.sim.IvfIndex.maintain]], [[graft.text.TextIndex.maintain]],
  * [[graft.dedup.LshIndex.maintain]]): the file-fragmentation signal and
  * the ledger sequence read. Both are metadata-scale at any corpus size —
  * an FS listing and one bounded aggregate — which is the point: a
  * maintenance DECISION must cost nothing next to the maintenance MOVE,
  * or nobody schedules it.
  */
object IndexHealth {

  /** Number of data files (`part-*`) directly under `path`; 0 when the
    * directory is absent. An append-maintained parquet dir accumulates
    * one generation of part files per batch; the count against the
    * single-generation floor (≈ shuffle partitions) is the
    * read-amplification signal that says the range layout has
    * fragmented and a compact would re-pack it.
    */
  def dataFileCount(spark: SparkSession, path: String): Int = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) 0
    else fs.listStatus(p)
      .count(st => st.isFile && st.getPath.getName.startsWith("part-"))
  }

  /** Next ledger sequence number: max(seq) + 1 over the ledger dir, 0
    * when absent — one bounded aggregate however long the index lives.
    */
  def nextSeq(spark: SparkSession, ledgerPath: String): Long = {
    val p = new org.apache.hadoop.fs.Path(ledgerPath)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) 0L
    else {
      val r = spark.read.parquet(ledgerPath).agg(max(col("seq"))).head()
      if (r.isNullAt(0)) 0L else r.getLong(0) + 1L
    }
  }
}
