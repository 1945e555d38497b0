package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval–point range join WITHOUT a nested-loop plan.
  *
  * The naive phrasing — `points JOIN intervals ON pt BETWEEN s AND e` —
  * has no equi-key, so Spark plans a BroadcastNestedLoopJoin (or a
  * cartesian): every point tested against every interval, O(|P|·|I|)
  * at any scale. This operator restores an equi-key by time-bucketing:
  * an interval explodes to the buckets it overlaps, a point maps to its
  * single bucket, the join runs on the bucket key, and an exact
  * containment filter discards the bucket-collision false candidates.
  *
  * Scale shape: fan-out is `len/bucketWidth + 1` rows per interval (≈2
  * when the width is chosen near the typical interval length), the join
  * is a plain shuffled equi-join AQE can size and skew-split, and each
  * matching (interval, point) pair emerges EXACTLY once — a point lives
  * in one bucket, so no post-join dedup is needed. Cost tracks true
  * candidate volume (pairs sharing a bucket), not |P|·|I|.
  *
  * Columns must be numeric (epoch seconds, epoch days, plain longs…);
  * callers pick `bucketWidth` ≥ the typical interval length. The two
  * inputs must not share column names (select/alias before joining).
  */
object RangeJoin {

  def rangePointJoin(
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      points: DataFrame,
      pointCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val ib = intervals.withColumn("__bucket",
      explode(sequence(
        floor(col(startCol) / bucketWidth),
        floor(col(endCol) / bucketWidth))))
    val pb = points.withColumn("__bucket",
      floor(col(pointCol) / bucketWidth))
    ib.join(pb, Seq("__bucket"))
      .filter(col(pointCol).between(col(startCol), col(endCol)))
      .drop("__bucket")
  }

  /** Interval–interval OVERLAP join, same construction with one extra
    * idea: two overlapping intervals can share MANY buckets, so the pair
    * would surface once per shared bucket. Instead of a post-join dedup
    * (an extra shuffle over the full result), each pair is emitted only
    * in the bucket of `max(startL, startR)` — a bucket both sides
    * provably cover whenever they overlap — so every overlapping pair
    * emerges exactly once, dedup-free.
    *
    * `blockCols`: equality keys shared by both inputs (join runs on
    * blockCols :+ bucket); intervals are inclusive on both ends; all
    * interval columns numeric. Fan-out per row is `len/bucketWidth + 1`.
    */
  def intervalOverlapJoin(
      left: DataFrame,
      lStartCol: String,
      lEndCol: String,
      right: DataFrame,
      rStartCol: String,
      rEndCol: String,
      blockCols: Seq[String],
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    def buckets(df: DataFrame, s: String, e: String) =
      df.withColumn("__bucket",
        explode(sequence(floor(col(s) / bucketWidth), floor(col(e) / bucketWidth))))
    buckets(left, lStartCol, lEndCol)
      .join(buckets(right, rStartCol, rEndCol), blockCols :+ "__bucket")
      .filter(col(lStartCol) <= col(rEndCol) && col(rStartCol) <= col(lEndCol))
      .filter(col("__bucket") ===
        floor(greatest(col(lStartCol), col(rStartCol)) / bucketWidth))
      .drop("__bucket")
  }
}
