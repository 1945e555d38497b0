package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ROLLUP by RE-AGGREGATION — the multi-level OLAP summary (per-(a,b),
  * per-a, grand total) computed scale-consciously: Spark's built-in
  * `rollup` plans an Expand that replicates EVERY INPUT ROW once per
  * level before the aggregate, so a 3-level rollup of a 100 TB scan
  * shuffles (up to) 3× the data. Sum/count/min/max are re-aggregable, so
  * the super-aggregate levels can instead be derived from the FINEST
  * level's result — one data-scale aggregate, then level frames whose
  * input is bounded by the finest key cardinality, not the corpus.
  *
  * `gid` follows Spark's grouping_id bit convention (first key = most
  * significant bit; a set bit means the column is aggregated away), so
  * results are drop-in comparable with the built-in — RollupAggSpec pins
  * the two bit-for-bit and pins this plan's NO-Expand property.
  */
object RollupAgg {

  /** Rollup of count + sum(`sumCol`) over the key prefix hierarchy.
    * Output: keys (null where aggregated away), `gid`, `n`,
    * `sum_<sumCol>`. Key columns must be string-typed (the null
    * super-aggregate slots are typed literals).
    */
  def sumCountRollup(df: DataFrame, keys: Seq[String],
      sumCol: String): DataFrame = {
    require(keys.nonEmpty, "rollup needs at least one key")
    val sumName = s"sum_$sumCol"
    val finest = df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(col(sumCol)).as(sumName))
    val levels = (keys.size to 0 by -1).map { i =>
      val kept = keys.take(i)
      val gid = (1 << (keys.size - i)) - 1
      val lvl =
        if (i == keys.size) finest
        else finest.groupBy(kept.map(col): _*)
          .agg(sum(col("n")).as("n"), sum(col(sumName)).as(sumName))
      lvl.select(
        keys.map(k => (if (kept.contains(k)) col(k)
          else lit(null).cast("string")).as(k)) ++
        Seq(lit(gid.toLong).as("gid"), col("n"), col(sumName)): _*)
    }
    levels.reduce(_ unionByName _)
  }
}
