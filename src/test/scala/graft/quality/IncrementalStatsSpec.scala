package graft.quality

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The maintained stats table must (1) carry exact counters (cnt,
  * nulls, min, max) bit-equal to a from-scratch profile after any
  * number of append batches, and (2) keep the sketch NDV inside the
  * one-shot error envelope — mergeability means batch count cannot
  * degrade the estimate.
  */
class IncrementalStatsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  test("four ingest days merged == one-shot profile; NDV stays in envelope") {
    val li = graft.ops.Tables.lineitem(spark, d)
      .select(col("l_partkey"), col("l_suppkey"), col("l_orderkey"))
    val cols = Seq("l_partkey", "l_suppkey")
    val statsDir = Files.createTempDirectory("incr_stats").toString + "/s"
    IncrementalStats.init(
      li.filter(col("l_orderkey") % 4 === 0), cols, statsDir)
    (1 to 3).foreach { day =>
      IncrementalStats.update(spark, statsDir,
        li.filter(col("l_orderkey") % 4 === day))
    }
    val got = IncrementalStats.report(spark, statsDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap

    val oneShotDir = Files.createTempDirectory("incr_stats_os").toString + "/s"
    IncrementalStats.init(li, cols, oneShotDir)
    val oneShot = IncrementalStats.report(spark, oneShotDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap

    cols.foreach { c =>
      val (cnt, nNull, mn, mx, est) = got(c)
      val (cnt1, nNull1, mn1, mx1, est1) = oneShot(c)
      // exact counters: bit-equal to one-shot
      assert((cnt, nNull, mn, mx) === ((cnt1, nNull1, mn1, mx1)), c)
      // NDV: both paths within 5% of exact; merge does not drift
      val exact = li.select(countDistinct(col(c))).head().getLong(0).toDouble
      assert(math.abs(est - exact) <= 0.05 * exact, s"$c merged est $est vs $exact")
      assert(math.abs(est1 - exact) <= 0.05 * exact, s"$c direct est $est1 vs $exact")
    }
  }

  test("null accounting: nulls counted, excluded from min/max and sketch") {
    val df = Seq[Option[Long]](Some(5L), None, Some(9L), None, Some(5L))
      .toDF("v")
    val statsDir = Files.createTempDirectory("incr_stats_null").toString + "/s"
    IncrementalStats.init(df, Seq("v"), statsDir)
    val r = IncrementalStats.report(spark, statsDir).head()
    assert(r.getLong(1) === 5L && r.getLong(2) === 2L) // cnt, n_null
    assert(r.getLong(3) === 5L && r.getLong(4) === 9L) // min, max
    assert(r.getLong(5) === 2L) // ndv of {5, 9}
  }
}
