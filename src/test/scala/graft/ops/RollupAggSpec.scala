package graft.ops

import org.apache.spark.sql.catalyst.plans.logical.Expand
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class RollupAggSpec extends AnyFunSuite with SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private def input = Tables.lineitem(spark, d).select(
    col("l_returnflag").as("rf"), col("l_linestatus").as("ls"),
    floor(col("l_extendedprice") * 100d + lit(0.5d)).cast("long").as("cents"))

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (Option(r.getString(0)), Option(r.getString(1)),
      r.getLong(2), r.getLong(3), r.getLong(4))).toSet

  test("re-aggregated rollup equals Spark's built-in rollup bit-for-bit") {
    val ours = canon(RollupAgg.sumCountRollup(input, Seq("rf", "ls"), "cents"))
    val builtin = canon(input.rollup(col("rf"), col("ls"))
      .agg((grouping(col("rf")) * 2 + grouping(col("ls"))).cast("long")
        .as("gid"),
        count(lit(1)).as("n"), sum(col("cents")).as("sum_cents")))
    assert(ours === builtin)
    // all three levels present: finest, per-rf, grand total
    assert(ours.map(_._3) === Set(0L, 1L, 3L))
  }

  test("re-aggregation plans NO Expand; the built-in does (the contrast)") {
    // logical optimized plans: AQE wraps the physical tree and hides its
    // operators from collect, and the Expand decision is logical anyway
    val ours = RollupAgg.sumCountRollup(input, Seq("rf", "ls"), "cents")
      .queryExecution.optimizedPlan
    assert(ours.collectFirst { case e: Expand => e }.isEmpty,
      s"re-agg rollup must not replicate the scan per level:\n$ours")
    val builtin = input.rollup(col("rf"), col("ls"))
      .agg(count(lit(1)).as("n")).queryExecution.optimizedPlan
    assert(builtin.collectFirst { case e: Expand => e }.nonEmpty,
      "expected Spark's rollup to plan Expand — if this changed, " +
        "re-evaluate whether RollupAgg still earns its keep")
  }
}
