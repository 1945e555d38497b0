package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ROLLUP by RE-AGGREGATION — the multi-level OLAP summary (per-(a,b),
  * per-a, grand total) computed scale-consciously: Spark's built-in
  * `rollup` plans an Expand that replicates EVERY INPUT ROW once per
  * level before the aggregate, so a 3-level rollup of a 100 TB scan
  * shuffles (up to) 3× the data. Sum/count/min/max are re-aggregable, so
  * the super-aggregate levels can instead derive from the FINEST level:
  * one data-scale aggregate to the finest grain, then the built-in
  * rollup OVER THAT FRAME — the Expand still exists, but it replicates a
  * key-cardinality aggregate, not the corpus. (A union of per-level
  * aggregates would read cleaner but recomputes the finest subtree once
  * per branch — Spark does not share common subplans across a union —
  * measured 3× the runtime of this single-chain shape.)
  *
  * `gid` follows Spark's grouping_id bit convention (first key = most
  * significant bit; a set bit means the column is aggregated away), so
  * results are drop-in comparable with the built-in — RollupAggSpec pins
  * the two bit-for-bit and pins that this plan's Expand sits above an
  * aggregate, never above the scan.
  */
object RollupAgg {

  /** Rollup of count + sum(`sumCol`) over the key prefix hierarchy.
    * Output: keys (null where aggregated away), `gid`, `n`,
    * `sum_<sumCol>`.
    */
  def sumCountRollup(df: DataFrame, keys: Seq[String],
      sumCol: String): DataFrame = {
    require(keys.nonEmpty, "rollup needs at least one key")
    val sumName = s"sum_$sumCol"
    val finest = df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(col(sumCol)).as(sumName))
    val gid = keys.map(k => grouping(col(k)))
      .reduceLeft((a, b) => a * 2 + b).cast("long").as("gid")
    finest.rollup(keys.map(col): _*)
      .agg(gid, sum(col("n")).as("n"), sum(col(sumName)).as(sumName))
  }
}
