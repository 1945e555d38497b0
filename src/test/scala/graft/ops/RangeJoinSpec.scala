package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The bucketized range join must be a plan-shape rewrite only: same
  * relation as the naive non-equi join, but as an equi-join.
  */
class RangeJoinSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private lazy val intervals = Seq(
    (1L, 100L, 199L),   // plain window
    (2L, 150L, 460L),   // spans multiple buckets, overlaps interval 1
    (3L, 700L, 700L),   // degenerate single-point window
    (4L, 900L, 950L)    // empty window (no points inside)
  ).toDF("iv_id", "s", "e")

  private lazy val points = Seq(
    (10L, 100L), (11L, 199L), (12L, 200L),  // boundary probes for iv 1
    (13L, 300L), (14L, 460L), (15L, 461L),  // boundary probes for iv 2
    (16L, 700L),                            // exact hit on iv 3
    (17L, 999L)                             // matches nothing
  ).toDF("pt_id", "p")

  private lazy val bucketized =
    RangeJoin.rangePointJoin(intervals, "s", "e", points, "p",
        bucketWidth = 128L)
      .select("iv_id", "pt_id").as[(Long, Long)].collect().toSet

  test("matches the naive non-equi join exactly (inclusive bounds, no dup pairs)") {
    val naive = intervals.join(points, col("p").between(col("s"), col("e")))
      .select("iv_id", "pt_id").as[(Long, Long)].collect().toSet
    assert(bucketized === naive)
    assert(bucketized === Set(
      (1L, 10L), (1L, 11L),             // 100 and 199 in, 200 out
      (2L, 11L), (2L, 12L), (2L, 13L), (2L, 14L), // 150..460: 199, 200, 300, 460 in; 461 out
      (3L, 16L)))                       // degenerate window hits its point
  }

  test("pairs emerge exactly once even when an interval spans many buckets") {
    val counts = RangeJoin.rangePointJoin(intervals, "s", "e", points, "p",
        bucketWidth = 16L) // interval 2 spans ~20 buckets
      .groupBy("iv_id", "pt_id").count().filter(col("count") > 1).count()
    assert(counts === 0L)
  }

  test("plans as an equi-join, not a nested loop") {
    val plan = RangeJoin.rangePointJoin(intervals, "s", "e", points, "p",
        bucketWidth = 128L)
      .queryExecution.sparkPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
    // while the naive phrasing of the same predicate is one
    val naive = intervals.join(points, col("p").between(col("s"), col("e")))
      .queryExecution.sparkPlan.toString
    assert(naive.contains("BroadcastNestedLoopJoin") ||
      naive.contains("CartesianProduct"), naive)
  }
}
