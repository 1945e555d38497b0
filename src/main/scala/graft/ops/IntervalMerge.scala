package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Coalesce overlapping intervals per key — the islands problem behind
  * validity-interval compaction (SCD ranges), coverage reporting, and
  * gap-tolerant sessionization over [start, end) spans rather than
  * instants. A row starts a new island exactly when its start exceeds the
  * running max end of every earlier interval of the same key; islands
  * then reduce to (min start, max end, count).
  *
  * Scale shape: both windows are PARTITIONED BY the key (the catalog
  * window lint's requirement — per-key frames distribute; only the key's
  * own interval count funnels through one task, and interval streams per
  * entity are bounded in practice). The running-max frame ends at
  * 1 PRECEDING so a row never sees its own end — an interval nested
  * inside its predecessor still joins that island (pm ≥ its start).
  *
  * Determinism with ties: ordering is (start, end); rows identical on
  * both cannot open an island against each other (start ≤ pm), and
  * equal-start rows see the same running max from strictly earlier rows,
  * so the island partition — and therefore every output row — is
  * invariant to the undefined order among exact ties.
  */
object IntervalMerge {

  /** Merged islands per key: (keyCol, island 1-based per key,
    * start, end, n_rows). Interval semantics: [start, end] overlap or
    * touch (start ≤ prior end) merges; strictly greater starts split.
    */
  def merge(df: DataFrame, keyCol: String, startCol: String,
      endCol: String): DataFrame = {
    val k: Column = col(keyCol)
    val w = Window.partitionBy(k).orderBy(col(startCol), col(endCol))
    val pm = max(col(endCol))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val newIsland = when(pm.isNull || col(startCol) > pm, 1L).otherwise(0L)
    df.withColumn("__ni", newIsland)
      .withColumn("island",
        sum(col("__ni")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(k, col("island"))
      .agg(min(col(startCol)).as("start"), max(col(endCol)).as("end"),
        count(lit(1)).as("n_rows"))
  }
}
