package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared plumbing for the persistent-index maintenance loops
  * ([[graft.sim.IvfIndex.maintain]], [[graft.text.TextIndex.maintain]],
  * [[graft.dedup.LshIndex.maintain]]): the file-fragmentation signal,
  * the ledger sequence read, and the WHOLE tombstone-index maintenance
  * body (TextIndex and LshIndex share identical signals, decision
  * logic, and ledger schema — one definition here, so a threshold or
  * schema tweak cannot silently desynchronize the two). All signal
  * reads are metadata-scale at any corpus size — counts and an FS
  * listing — which is the point: a maintenance DECISION must cost
  * nothing next to the maintenance MOVE, or nobody schedules it.
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
    * The read carries an explicit schema so a crashed FIRST append
    * (dir exists, no committed part file) reads as empty instead of
    * throwing schema-inference failures forever — the self-healing
    * loop must not be wedged by its own ledger.
    */
  def nextSeq(spark: SparkSession, ledgerPath: String): Long = {
    val p = new org.apache.hadoop.fs.Path(ledgerPath)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) 0L
    else {
      val r = spark.read.schema("seq long").parquet(ledgerPath)
        .agg(max(col("seq"))).head()
      if (r.isNullAt(0)) 0L else r.getLong(0) + 1L
    }
  }

  /** round(x, 6) with HALF_UP — the rounding DuckDB's round() applies,
    * NOT math.rint's half-to-even: the maintenance ledgers' dead_ratio
    * is value-oracled, so the engine-side rounding must match the
    * replay's.
    */
  def round6HalfUp(d: Double): Double =
    BigDecimal(d).setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP)
      .toDouble

  /** The shared maintenance body for a tombstone-sidecar index whose
    * spine lives at `dir/docs` (id-keyed), tombstones at
    * `dir/tombstones`, and postings at `dir/postings`: read the
    * signals (dead = tombstoned ids actually IN the spine — a delete
    * of an unknown id costs nothing at read time and must not count;
    * files = postings data-file count), decide against the bars, run
    * `compactFn` when unhealthy, and append ONE auditable row
    *
    *   (seq, dead_ratio, postings_files, dead_ratio_bar, files_bar,
    *    unhealthy, action, survivors, folded, post_files)
    *
    * to `dir/maintenance/`. No hysteresis BY DESIGN: both signals are
    * exact counters, not sampled probes (the IvfIndex contrast) — one
    * observation is the population truth, and acting resets both
    * signals to their floor, so the loop cannot oscillate.
    */
  def maintainTombstoneIndex(spark: SparkSession, dir: String,
      deadRatioBar: Double, filesBar: Int,
      compactFn: () => (Long, Long)): DataFrame = {
    import spark.implicits._
    val spine = spark.read.parquet(s"$dir/docs")
    val nDocs = spine.count()
    val tombPath = new org.apache.hadoop.fs.Path(s"$dir/tombstones")
    val tombFs = tombPath.getFileSystem(spark.sessionState.newHadoopConf())
    val nDead =
      if (!tombFs.exists(tombPath)) 0L
      else spine.join(
        spark.read.parquet(tombPath.toString).distinct(),
        Seq("id"), "left_semi").count()
    val deadRatio = if (nDocs == 0L) 0.0 else nDead.toDouble / nDocs.toDouble
    val files = dataFileCount(spark, s"$dir/postings")
    val unhealthy = deadRatio >= deadRatioBar || files > filesBar
    val acted: Option[(Long, Long)] =
      if (unhealthy) Some(compactFn()) else None
    val postFiles =
      if (unhealthy) dataFileCount(spark, s"$dir/postings") else files
    val seq = nextSeq(spark, s"$dir/maintenance")
    val row = Seq((seq, round6HalfUp(deadRatio), files, deadRatioBar,
        filesBar, unhealthy,
        if (unhealthy) "compact" else "none",
        acted.map(_._1), acted.map(_._2), postFiles))
      .toDF("seq", "dead_ratio", "postings_files", "dead_ratio_bar",
        "files_bar", "unhealthy", "action", "survivors", "folded",
        "post_files")
    row.write.mode("append").parquet(s"$dir/maintenance")
    row
  }

  /** The seq-ordered ledger of [[maintainTombstoneIndex]] decisions. */
  def tombstoneMaintenanceLog(spark: SparkSession, dir: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/maintenance")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val schema = "seq long, dead_ratio double, postings_files int, " +
      "dead_ratio_bar double, files_bar int, unhealthy boolean, " +
      "action string, survivors long, folded long, post_files int"
    if (!fs.exists(p)) spark.read.schema(schema).parquet()
    else spark.read.schema(schema).parquet(p.toString).orderBy("seq")
  }
}
