package graft.io

import org.apache.spark.sql.SparkSession

/** Commit-atomic epoch seals for streaming-ingest ledgers (round-17
  * ADVICE fix). Directory EXISTENCE is not a commit marker: Spark
  * creates the output directory (with `_temporary/`) at job setup, so a
  * crash mid-write leaves the dir present and a replayed trigger gated
  * on `fs.exists(dir)` is skipped whole — the ledger stays permanently
  * empty/partial for that epoch while the index append already landed.
  * The atomic marker is the `_SUCCESS` file the Hadoop committer writes
  * AFTER every task output is moved into place: present => the epoch's
  * parquet committed fully; absent-with-dir-present => a crashed
  * attempt, which the replay must CLEAR before re-running (the ledger
  * writes use mode("error"), so a leftover partial dir would otherwise
  * kill the replayed trigger instead of healing it).
  */
object EpochCommit {

  private def fs(spark: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  /** True iff the parquet write at `dir` committed fully — the
    * committer's `_SUCCESS` marker is present (dir existence alone is a
    * crashed-attempt false positive).
    */
  def committed(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir, "_SUCCESS")
    fs(spark, p).exists(p)
  }

  /** Remove a crashed (present but uncommitted) epoch dir so the
    * replayed trigger's mode("error") write can land. No-op when the
    * dir is absent or committed. Returns true iff a partial was cleared.
    */
  def clearPartial(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val f = fs(spark, p)
    if (f.exists(p) && !committed(spark, dir)) f.delete(p, true)
    else false
  }
}
