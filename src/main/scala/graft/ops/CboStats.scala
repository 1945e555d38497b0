package graft.ops

import org.apache.spark.sql.SparkSession

/** Cost-based-optimizer enablement — the ANALYZE TABLE half of running a
  * 100 TB catalog where queries are MACHINE-GENERATED: hand-placed
  * `broadcast()` hints (which this repo uses deliberately in hand-shaped
  * plans) don't exist in generated SQL, so the optimizer must DERIVE
  * "this filtered fact is broadcastable" / "join these dims first" from
  * column statistics. Spark's CBO does exactly that once (a) the inputs
  * are CATALOG tables (path-based reads carry only file sizes) and (b)
  * `ANALYZE TABLE … COMPUTE STATISTICS FOR ALL COLUMNS` has recorded
  * row counts, NDVs, min/max and null counts — then
  * `spark.sql.cbo.enabled` turns filter-selectivity estimation on and
  * `spark.sql.cbo.joinReorder.enabled` lets star-schema joins reorder by
  * estimated cardinality.
  *
  * Scale note: ANALYZE is one scan per table (collected per column as
  * count-distinct sketches), amortized over every query the catalog
  * serves; stats live in the metastore, not in files. CboStatsSpec pins
  * the decision FLIP — the same join planning as SortMergeJoin without
  * stats and BroadcastHashJoin with them — so the lever is proven, not
  * configured-and-hoped.
  */
object CboStats {

  /** Register `sfDir/<table>.parquet` as catalog table `name` and compute
    * full column statistics. Idempotent per session (drop + recreate), so
    * catalog queries can call it on every invocation.
    */
  def registerAnalyzed(spark: SparkSession, sfDir: String,
      table: String, name: String): Unit =
    registerAnalyzedCols(spark, sfDir, table, name, Nil)

  /** Like [[registerAnalyzed]] but restricted to `cols` when non-empty —
    * the planner only needs stats on the join/filter columns it will
    * estimate with, and at fact-table widths "FOR ALL COLUMNS" turns a
    * per-invocation stats refresh into a full wide-row scan.
    */
  def registerAnalyzedCols(spark: SparkSession, sfDir: String,
      table: String, name: String, cols: Seq[String]): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.catalog.createTable(name, s"$sfDir/$table.parquet", "parquet")
    val scope =
      if (cols.isEmpty) "FOR ALL COLUMNS" else s"FOR COLUMNS ${cols.mkString(", ")}"
    spark.sql(s"ANALYZE TABLE $name COMPUTE STATISTICS $scope")
    ()
  }

  /** Run `body` with the cost-based optimizer (and join reorder) on,
    * restoring the previous conf values afterwards. The returned
    * DataFrame must be ACTED ON inside `body` if plan shape matters —
    * optimization happens at action time.
    */
  def withCbo[A](spark: SparkSession)(body: => A): A = {
    val prev = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled")
      .map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
