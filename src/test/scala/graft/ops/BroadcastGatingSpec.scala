package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Broadcast discipline for the TPC-H-style queries: constant-size dims
  * (nation, region) may carry a forced hint, but scale-proportional tables
  * (customer, supplier) must not — a forced broadcast of a 15M-row side is
  * an executor OOM at sf100. At test scale AQE still broadcasts the small
  * sides at runtime, so plans keep their broadcast joins without the hint.
  */
class BroadcastGatingSpec extends AnyFunSuite with SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private def executedPlan(name: String): String = {
    val df = RelationalQueries.queries(name)(spark, d)
    df.collect() // materialize so AQE finalizes join strategies
    df.queryExecution.executedPlan.toString
  }

  for (q <- Seq("q3_top_orders", "q5_nation_revenue",
      "q7_nation_volume", "q10_returned_items")) {
    test(s"$q: AQE still picks broadcast joins at test scale without forced hints") {
      val plan = executedPlan(q)
      assert(plan.contains("BroadcastHashJoin"), plan)
    }

    test(s"$q: no forced broadcast of scale-proportional tables in the logical plan") {
      val analyzed = RelationalQueries.queries(q)(spark, d)
        .queryExecution.analyzed
      // hints survive analysis as ResolvedHint nodes; none may wrap a
      // customer/supplier-bearing subtree
      val bad = analyzed.collect {
        case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
            if h.child.collectLeaves().exists { leaf =>
              val cols = leaf.output.map(_.name)
              cols.contains("c_custkey") || cols.contains("s_suppkey")
            } => h
      }
      assert(bad.isEmpty,
        s"forced broadcast over a scale-proportional table:\n${bad.mkString("\n")}")
    }
  }
}
