package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class TopKAggSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def rows = (1 to 500).map { i =>
    (s"g${i % 5}", i.toLong, (i % 97).toDouble + (i % 7) * 0.01)
  }.toDF("g", "id", "v")

  test("matches the window-rank reference, including the id tiebreak") {
    val got = TopKAgg.topK(rows, Seq("g"), "id", "v", k = 4)
      .orderBy("g", "rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("id").asc)
    val ref = rows.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 4).select("g", "rank", "id", "v")
      .orderBy("g", "rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got === ref)
  }

  test("invariant to partitioning (merge path exercised)") {
    val a = TopKAgg.topK(rows, Seq("g"), "id", "v", 3)
      .orderBy("g", "rank").collect().toSeq
    val b = TopKAgg.topK(rows.repartition(13), Seq("g"), "id", "v", 3)
      .orderBy("g", "rank").collect().toSeq
    assert(a === b)
  }

  test("plan is an aggregate with a partial stage — no WindowExec, no sort " +
    "before the exchange") {
    val plan = TopKAgg.topK(rows, Seq("g"), "id", "v", 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("WindowExec"), plan.take(800))
    assert(plan.contains("ObjectHashAggregate"), plan.take(800))
    // partial + final pair: the map-side combine is what bounds the shuffle
    assert(plan.split("ObjectHashAggregate", -1).length - 1 >= 2, plan.take(800))
  }

  test("k larger than the group returns the whole group ranked") {
    val tiny = Seq(("a", 1L, 5.0), ("a", 2L, 7.0)).toDF("g", "id", "v")
    val got = TopKAgg.topK(tiny, Seq("g"), "id", "v", 10)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq((1L, 2L), (2L, 1L)))
  }
}
