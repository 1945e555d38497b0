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

  test("NULL key values: real-null groups equal the built-in's, gid disambiguates") {
    import spark.implicits._
    // nulls IN the key columns — the classic rollup ambiguity: a NULL ls
    // at gid=0 is a real group, a NULL ls at gid=1 is the super-aggregate;
    // both paths must produce the same (keys, gid)-keyed values
    val rnd = new scala.util.Random(20260815L)
    val rows = Seq.fill(500)((
      if (rnd.nextInt(5) == 0) null else s"r${rnd.nextInt(3)}",
      if (rnd.nextInt(4) == 0) null else s"s${rnd.nextInt(2)}",
      rnd.nextInt(1000).toLong))
    val df = rows.toDF("rf", "ls", "cents")
    val ours = canon(RollupAgg.sumCountRollup(df, Seq("rf", "ls"), "cents"))
    val builtin = canon(df.rollup(col("rf"), col("ls"))
      .agg((grouping(col("rf")) * 2 + grouping(col("ls"))).cast("long")
        .as("gid"),
        count(lit(1)).as("n"), sum(col("cents")).as("sum_cents")))
    assert(ours === builtin)
    // the ambiguity is actually exercised: a real (rf, NULL) group at
    // gid=0 coexists with the per-rf super-aggregate at gid=1
    assert(ours.exists(r => r._2.isEmpty && r._3 == 0L))
    assert(ours.exists(r => r._2.isEmpty && r._3 == 1L))
  }

  test("re-agg Expand replicates an aggregate, not the scan (the contrast)") {
    // logical optimized plans: AQE wraps the physical tree and hides its
    // operators from collect, and the Expand placement is logical anyway
    def expandChildHasAggregate(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.optimizedPlan.collectFirst { case e: Expand =>
        e.child.collectFirst {
          case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
        }.nonEmpty
      }
    // ours: Expand exists but sits ABOVE the finest aggregate — it
    // replicates key-cardinality rows, not the 100 TB scan
    assert(expandChildHasAggregate(
      RollupAgg.sumCountRollup(input, Seq("rf", "ls"), "cents"))
      === Some(true))
    // built-in: Expand's subtree has no aggregate — it replicates the scan
    assert(expandChildHasAggregate(input.rollup(col("rf"), col("ls"))
      .agg(count(lit(1)).as("n"))) === Some(false),
      "expected Spark's rollup to Expand the raw scan — if this changed, " +
        "re-evaluate whether RollupAgg still earns its keep")
  }
}
