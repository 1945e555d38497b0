package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys — the manual fallback when AQE's skew-join
  * splitting can't apply (e.g. aggregations-after-join keep the partition
  * boundaries, or the skew is on a broadcast-too-big dimension).
  *
  * Left (fact, skewed) rows get a random salt in [0, buckets); right
  * (dimension) rows are replicated once per salt value. The join key
  * becomes (key, salt), splitting each hot key across `buckets` tasks.
  * Replication cost: |right| × buckets — use only when right is the small
  * side and the hot keys are concentrated (the usual shape of skew).
  */
object SkewJoin {

  def saltedEquiJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      buckets: Int,
      seed: Long = 42L): DataFrame = {
    require(buckets > 1, "need at least 2 salt buckets")
    val salted = left.withColumn("_salt",
      (rand(seed) * buckets).cast("int"))
    val replicated = right.withColumn("_salt",
      explode(array((0 until buckets).map(lit): _*)))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Diagnose key skew: top-n heaviest keys with their share of all rows.
    * Run this before choosing between broadcast, AQE skew join, and
    * salting.
    */
  def keySkewProfile(df: DataFrame, key: Column, topN: Int = 10): DataFrame = {
    // one scan: total rows = sum(cnt) over the grouped result (a 1-row agg
    // broadcast back onto the top-n keys), not a second full pass over df
    val grouped = df.groupBy(key.as("key")).agg(count(lit(1)).as("cnt"))
    val total = grouped.agg(sum(col("cnt")).as("_total"))
    grouped
      .orderBy(desc("cnt"))
      .limit(topN)
      .crossJoin(broadcast(total))
      .withColumn("share", round(col("cnt") / col("_total"), 6))
      .drop("_total")
      // the join between limit and collect does NOT preserve sort order —
      // re-sort so "hottest first" is a contract, not a planner accident
      .orderBy(desc("cnt"))
  }
}
