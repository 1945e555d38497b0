package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkSpec

class SaltedAggSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // one scorching key ("hot" = 90% of rows) + a tail
  private def skewed = (1 to 1000).map { i =>
    (if (i <= 900) "hot" else s"k${i % 7}", i.toLong, i.toLong * 3)
  }.toDF("k", "a", "b")

  test("salted result is bit-identical to the direct groupBy") {
    val salted = SaltedAgg.sumCount(skewed, Seq("k"), Seq("a", "b"),
      saltOn = Seq("a"), salts = 8).orderBy("k").collect().toSeq
    val direct = skewed.groupBy("k")
      .agg(count(lit(1)).as("n"), sum("a").as("sum_a"), sum("b").as("sum_b"))
      .orderBy("k").collect().toSeq
    assert(salted === direct)
  }

  test("the hot key really splits: partial stage carries multiple salts") {
    val partial = skewed
      .withColumn("__salt", pmod(xxhash64(col("a")), lit(8L)))
      .groupBy("k", "__salt").agg(count(lit(1)).as("n"))
      .filter(col("k") === "hot")
    // 900 rows hash across essentially all 8 salts — no reduce task sees
    // the whole hot key
    assert(partial.count() === 8L)
  }

  test("two aggregation exchanges, both map-side combined") {
    val out = SaltedAgg.sumCount(skewed, Seq("k"), Seq("a"),
      saltOn = Seq("a"), salts = 8)
    val plan = out.queryExecution.executedPlan.toString
    val exchanges = plan.split("Exchange hashpartitioning", -1).length - 1
    assert(exchanges === 2, plan.take(900))
  }

  test("result invariant to salt count (associative folds)") {
    def run(s: Int) = SaltedAgg.sumCount(skewed, Seq("k"), Seq("a", "b"),
      saltOn = Seq("b"), salts = s).orderBy("k").collect().toSeq
    assert(run(1) === run(16))
  }
}
