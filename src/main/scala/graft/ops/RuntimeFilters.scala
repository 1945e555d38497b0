package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Runtime bloom-filter join pruning — the row-level twin of dynamic
  * partition pruning ([[graft.layout.Partitioning]]): DPP skips whole
  * partition DIRECTORIES a filtered dim disqualifies; the runtime bloom
  * filter skips ROWS of a shuffle join's big side before the exchange.
  * Catalyst's `InjectRuntimeFilter` builds a bloom filter over the
  * creation side's join keys (one extra aggregate on the already-filtered
  * small side) and stamps `might_contain(...)` onto the application
  * side's scan — at 100 TB that turns "shuffle every fact row, drop 97%
  * at the join" into "drop 97% at the scan, shuffle 3%". The optimizer
  * only injects when the application side is big (default threshold
  * 10 GB) and the creation side is small and selective, so test-scale
  * fixtures never trigger it by default — this helper pins the thresholds
  * down WHILE THE PLAN OPTIMIZES (application side to 1 byte, i.e. any
  * scan qualifies — the point is to materialize the 100 TB plan shape at
  * fixture SFs), then restores them, keeping the shape reproducible and
  * plan-pinnable at any SF.
  */
object RuntimeFilters {

  /** Build `df`'s optimized plan with runtime-bloom-filter injection
    * enabled at the given thresholds, restoring every touched conf
    * afterwards. The optimized logical plan is forced (and cached by the
    * QueryExecution) before restore, so later physical planning and
    * execution keep the injected filter; only OPTIMIZATION runs under the
    * pinned confs. Broadcast-by-size is disabled during optimization
    * because `InjectRuntimeFilter` declines joins it expects to broadcast
    * (a broadcast join already ships the small side's keys to every task
    * — the bloom filter would be redundant); AQE may still pick a
    * broadcast exchange at runtime under the RESTORED confs, after the
    * filter is in the plan.
    */
  def withBloomFilter(spark: SparkSession, df: => DataFrame,
      applicationSideScanBytes: Long = 1L,
      creationSideBytes: Long = 64L << 20): DataFrame = {
    val pinned = Map(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" ->
        applicationSideScanBytes.toString,
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" ->
        creationSideBytes.toString,
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = pinned.keys.map(k => k -> spark.conf.getOption(k)).toMap
    pinned.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val out = df
      out.queryExecution.optimizedPlan // force + cache under pinned confs
      out
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
