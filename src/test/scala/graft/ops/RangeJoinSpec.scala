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

  private lazy val ivA = Seq(
    ("k1", 1L, 100L, 300L),
    ("k1", 2L, 250L, 900L),   // long interval spanning many buckets
    ("k2", 3L, 100L, 300L)    // same span, different block key
  ).toDF("k", "ida", "s_a", "e_a")
  private lazy val ivB = Seq(
    ("k1", 10L, 300L, 310L),  // touches interval 1 at exactly one point
    ("k1", 11L, 500L, 600L),  // inside interval 2 only
    ("k1", 12L, 901L, 950L),  // starts right after interval 2 ends
    ("k2", 13L, 290L, 295L)   // overlaps 3 but only under key k2
  ).toDF("k", "idb", "s_b", "e_b")

  test("interval overlap join matches the naive non-equi join, blocked by key") {
    val got = RangeJoin.intervalOverlapJoin(ivA, "s_a", "e_a", ivB, "s_b", "e_b",
        blockCols = Seq("k"), bucketWidth = 64L)
      .select("ida", "idb").as[(Long, Long)].collect().toSet
    val naive = ivA.join(ivB, Seq("k"))
      .filter(col("s_a") <= col("e_b") && col("s_b") <= col("e_a"))
      .select("ida", "idb").as[(Long, Long)].collect().toSet
    assert(got === naive)
    assert(got === Set(
      (1L, 10L),            // single-point touch is an overlap (inclusive)
      (2L, 10L), (2L, 11L), // long interval catches both
      (3L, 13L)))           // k2 pair; (1,13) blocked by the key
  }

  test("overlapping pairs emerge exactly once despite sharing many buckets") {
    // bucketWidth 16: intervals 2 and 11 share ~7 buckets; the max-start
    // bucket rule must still emit the pair a single time
    val dup = RangeJoin.intervalOverlapJoin(ivA, "s_a", "e_a", ivB, "s_b", "e_b",
        blockCols = Seq("k"), bucketWidth = 16L)
      .groupBy("ida", "idb").count().filter(col("count") > 1).count()
    assert(dup === 0L)
  }

  test("randomized equivalence with the naive joins (seeded fuzz)") {
    val rnd = new scala.util.Random(42)
    val ivs = (1 to 120).map { i =>
      val s = rnd.nextInt(2000).toLong
      (i.toLong, s, s + rnd.nextInt(300))
    }.toDF("iv", "s", "e")
    val pts = (1 to 400).map(i => (i.toLong, rnd.nextInt(2300).toLong))
      .toDF("pt", "p")
    for (w <- Seq(7L, 64L, 1024L)) {
      val got = RangeJoin.rangePointJoin(ivs, "s", "e", pts, "p", w)
        .select("iv", "pt").as[(Long, Long)].collect().toSet
      val naive = ivs.join(pts, col("p").between(col("s"), col("e")))
        .select("iv", "pt").as[(Long, Long)].collect().toSet
      assert(got === naive, s"bucketWidth $w")
    }
    val ivs2 = ivs.select(col("iv").as("iv2"), col("s").as("s2"), col("e").as("e2"))
    for (w <- Seq(13L, 256L)) {
      val got = RangeJoin.intervalOverlapJoin(ivs, "s", "e",
          ivs2, "s2", "e2", blockCols = Nil, bucketWidth = w)
        .filter(col("iv") < col("iv2"))
        .select("iv", "iv2").as[(Long, Long)].collect().toSet
      val naive = ivs.crossJoin(ivs2)
        .filter(col("s") <= col("e2") && col("s2") <= col("e") &&
          col("iv") < col("iv2"))
        .select("iv", "iv2").as[(Long, Long)].collect().toSet
      assert(got === naive, s"bucketWidth $w")
    }
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
