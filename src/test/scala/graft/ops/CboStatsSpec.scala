package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The CBO lever proven, not configured-and-hoped: with catalog tables
  * and ANALYZE'd column stats, the SAME join flips from SortMergeJoin
  * (file-size estimates: a filter doesn't shrink anything the planner
  * can see) to BroadcastHashJoin (selectivity-estimated filtered side
  * under the threshold) — the decision a machine-generated-SQL catalog
  * needs the optimizer to make without hand hints.
  */
class CboStatsSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def joinPlan(ordersTable: String): String = {
    // selective filter (1 of 5 priorities) joined to the FACT (lineitem,
    // no stats — its file-size estimate keeps it shuffle-only at any
    // sane threshold); inspect the STATIC plan (initial AQE plan string)
    // — the decision under scrutiny is the estimate-driven one, before
    // runtime sizes exist
    val df = spark.table(ordersTable)
      .filter(col("o_orderpriority") === "1-URGENT" && col("o_custkey") <= 15)
      .join(spark.table("cbo_spec_lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
    df.queryExecution.executedPlan.toString
  }

  test("column stats flip the broadcast decision on the same join") {
    // lineitem: catalog table, NO stats (both plans see only its ~200 KB
    // file size). orders: once raw, once ANALYZE'd.
    spark.sql("DROP TABLE IF EXISTS cbo_spec_lineitem")
    spark.catalog.createTable("cbo_spec_lineitem", s"$sf/lineitem.parquet", "parquet")
    spark.sql("DROP TABLE IF EXISTS cbo_spec_orders_raw")
    spark.catalog.createTable("cbo_spec_orders_raw", s"$sf/orders.parquet", "parquet")
    CboStats.registerAnalyzed(spark, sf, "orders", "cbo_spec_orders")

    // SELF-CALIBRATING threshold: read the optimizer's own size estimate
    // of the (filtered, key-pruned) orders side under both tables and put
    // the broadcast threshold at the midpoint — the flip then pins the
    // DIRECTION of the stats effect (selectivity-aware estimate well
    // under the width-scaled file-size guess), not a fixture byte count.
    def sideEstimate(t: String): BigInt = CboStats.withCbo(spark) {
      spark.table(t)
        .filter(col("o_orderpriority") === "1-URGENT" && col("o_custkey") <= 15)
        .select(col("o_orderkey"))
        .queryExecution.optimizedPlan.stats.sizeInBytes
    }
    val eRaw = sideEstimate("cbo_spec_orders_raw")
    val eStats = sideEstimate("cbo_spec_orders")
    info(s"filtered-side estimate: no-stats=$eRaw bytes, ANALYZE'd=$eStats bytes")
    assert(eStats * 2 < eRaw,
      s"column stats should shrink the filtered-side estimate: $eStats vs $eRaw")
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
      ((eRaw + eStats) / 2).toString)
    try CboStats.withCbo(spark) {
      val without = joinPlan("cbo_spec_orders_raw")
      val withStats = joinPlan("cbo_spec_orders")
      assert(without.contains("SortMergeJoin"),
        s"no-stats plan should shuffle (file-size estimate over threshold):\n$without")
      assert(!without.contains("BroadcastHashJoin"), without)
      assert(withStats.contains("BroadcastHashJoin"),
        s"ANALYZE'd plan should broadcast the filtered side:\n$withStats")
      assert(!withStats.contains("SortMergeJoin"), withStats)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
  }

  test("join reorder: stats change the join ORDER on a 3-table star") {
    // The second half of the CBO lever: cbo.joinReorder.enabled was
    // switched on since r14 but only the broadcast FLIP was pinned. Here
    // a 3-table star is written in a deliberately bad order — fact first:
    // (lineitem ⋈ orders) ⋈ tiny-filtered-customer — and the assertion is
    // on the optimized plan's JOIN TREE. CostBasedJoinReorder requires
    // row-count stats on every item, so the no-stats twin (cbo on, raw
    // catalog tables) provably keeps the written order; with all three
    // ANALYZE'd, the DP reorder joins the dims first and the fact LAST.
    for (t <- Seq("lineitem", "orders", "customer")) {
      spark.sql(s"DROP TABLE IF EXISTS cbo_ro_${t}_raw")
      spark.catalog.createTable(s"cbo_ro_${t}_raw", s"$sf/$t.parquet", "parquet")
      CboStats.registerAnalyzed(spark, sf, t, s"cbo_ro_$t")
    }
    def star(suffix: String) = spark.table(s"cbo_ro_lineitem$suffix")
      .join(spark.table(s"cbo_ro_orders$suffix"),
        col("l_orderkey") === col("o_orderkey"))
      .join(spark.table(s"cbo_ro_customer$suffix")
          .filter(col("c_mktsegment") === "BUILDING" && col("c_custkey") <= 15),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
    def leafOrder(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          r.catalogTable.map(_.identifier.table).getOrElse("?")
      }
    CboStats.withCbo(spark) {
      val noStats = leafOrder(star("_raw")).map(_.stripSuffix("_raw"))
      val withStats = leafOrder(star(""))
      info(s"no-stats leaf order: $noStats; ANALYZE'd: $withStats")
      assert(noStats === Seq("cbo_ro_lineitem", "cbo_ro_orders", "cbo_ro_customer"),
        "no-stats plan should keep the written fact-first order")
      assert(withStats !== noStats, "stats should change the join order")
      assert(withStats.last === "cbo_ro_lineitem",
        s"reorder should join the dims first and the fact last: $withStats")
      // the reorder must not perturb values
      val a = star("_raw").collect().map(_.toString).sorted
      val b = star("").collect().map(_.toString).sorted
      assert(a.nonEmpty && (a sameElements b))
    }
  }

  test("q_cbo_join values are plan-independent: same result with CBO on and off") {
    val q = graft.SparkEntry.queries("q_cbo_join")
    val off = q(spark, sf).collect().map(_.toString).sorted
    val on = CboStats.withCbo(spark) { q(spark, sf).collect() }
      .map(_.toString).sorted
    assert(off.nonEmpty && (off sameElements on))
  }

  test("ANALYZE records row counts and column NDVs the planner can see") {
    CboStats.registerAnalyzed(spark, sf, "nation", "cbo_spec_nation")
    val desc = spark.sql(
      "DESCRIBE EXTENDED cbo_spec_nation n_nationkey").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(desc.get("distinct_count").exists(_.toLong === 25L), desc.toString)
    assert(desc.get("min").exists(_.toLong === 0L))
    assert(desc.get("max").exists(_.toLong === 24L))
  }
}
