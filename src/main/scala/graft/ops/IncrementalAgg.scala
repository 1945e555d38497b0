package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of a materialized aggregate — the read-side
  * twin of [[MergeOps]]: once a lake ingests deltas instead of rebuilding
  * (MERGE/CDC, [[graft.streaming.StreamingMerge]]), its derived aggregate
  * tables must ALSO update from the delta, or every dashboard refresh
  * re-scans the 100 TB fact. count/sum (and anything derived from them —
  * avg = sum/cnt, revenue, rates) are self-maintainable: a delete
  * subtracts the old row's contribution, an insert adds the new one, an
  * update is a delete+insert pair. min/max are NOT (a deleted minimum
  * needs the base to find the runner-up) — callers keep those on the
  * periodic full-refresh path; `require`d out here rather than silently
  * wrong.
  *
  * Scale shape: the change batch aggregates to a delta-sized (group,
  * ±cnt, ±sums) table; unchanged groups stream through an anti join
  * against the BROADCAST changed-group key set; only touched groups
  * re-combine. One pass over the aggregate table (itself #groups-sized,
  * not fact-sized), zero passes over the fact — vs a full recompute that
  * scans everything for a 1 GB delta.
  */
object IncrementalAgg {

  /** Apply a CDC batch to a maintained (groupCols, cntCol, sumCols…)
    * aggregate. `changes` carries the fact-row images: op = 'd' rows hold
    * the OLD values leaving the table, anything else holds NEW values
    * entering it (emit an update as its d+i pair). Groups whose count
    * reaches zero drop out, and groups first seen in the batch appear —
    * the result is exactly `aggregate(fact ⊕ changes)`.
    *
    * Sums combine in the aggregate's own column types — keep them decimal
    * upstream for order-independent exactness (the repo-wide doctrine);
    * a double sum would make "incremental" and "recomputed" differ in
    * last-bit float noise.
    */
  def applyDelta(agg: DataFrame, changes: DataFrame, groupCols: Seq[String],
      sumCols: Seq[(String, String)], cntCol: String = "cnt",
      opCol: String = "op"): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column")
    val expected = (groupCols ++ sumCols.map(_._2) :+ cntCol).sorted
    require(agg.columns.sorted.sameElements(expected),
      s"agg schema ${agg.columns.sorted.mkString(",")} != expected ${expected.mkString(",")}")

    val sign = when(col(opCol) === "d", lit(-1L)).otherwise(lit(1L))
    val delta = changes
      .groupBy(groupCols.map(col): _*)
      .agg(
        sum(sign).as(cntCol),
        sumCols.map { case (src, dst) =>
          // each change row contributes ±value in the agg column's type
          sum(when(col(opCol) === "d", -col(src)).otherwise(col(src))
            .cast(agg.schema(dst).dataType)).as(dst)
        }: _*)

    val deltaKeys = delta.select(groupCols.map(col): _*)
    val untouched = agg.join(deltaKeys, groupCols, "left_anti")
    val touched = agg.join(deltaKeys, groupCols, "left_semi")
    val combined = touched.unionByName(delta)
      .groupBy(groupCols.map(col): _*)
      .agg(
        sum(col(cntCol)).as(cntCol),
        sumCols.map { case (_, dst) =>
          sum(col(dst)).cast(agg.schema(dst).dataType).as(dst)
        }: _*)
      .filter(col(cntCol) > 0)
    untouched.unionByName(combined)
  }
}
