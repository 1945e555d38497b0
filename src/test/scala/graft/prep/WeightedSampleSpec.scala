package graft.prep

import org.apache.spark.sql.execution.TakeOrderedAndProjectExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class WeightedSampleSpec extends AnyFunSuite with SparkSpec {

  test("samples k distinct rows, positive weights only, deterministically") {
    import spark.implicits._
    val docs = (1L to 500L).map(i => (i, if (i % 7 == 0) 0L else i % 13 + 1))
      .toDF("id", "w")
    val s1 = WeightedSample.sample(docs, "id", "w", 50).collect()
    val s2 = WeightedSample.sample(docs, "id", "w", 50)
      .collect()
    assert(s1.map(_.getLong(0)).toSet.size === 50)       // without replacement
    assert(s1.forall(_.getLong(1) > 0))                  // zero-weight excluded
    assert(s1.map(_.getLong(0)).toSet === s2.map(_.getLong(0)).toSet) // replay
  }

  test("a dominating weight is effectively always sampled") {
    import spark.implicits._
    // one row with weight 10^9 among 200 weight-1 rows: P(miss at k=1) is
    // ~(its u)^1e-9-ish — the md5 draws here pick it, and that choice is
    // FROZEN (deterministic draws), so this is a stable fixture, not flake
    val docs = ((1L to 200L).map(i => (i, 1L)) :+ ((999L, 1000000000L)))
      .toDF("id", "w")
    val got = WeightedSample.sample(docs, "id", "w", 1)
      .select("id").as[Long].collect()
    assert(got.toSeq === Seq(999L))
  }

  test("plan is TakeOrderedAndProject — no global sort exchange") {
    import spark.implicits._
    val docs = (1L to 100L).map(i => (i, i)).toDF("id", "w")
    val plan = WeightedSample.sample(docs, "id", "w", 10)
      .queryExecution.executedPlan
    assert(plan.collectFirst { case t: TakeOrderedAndProjectExec => t }.nonEmpty,
      s"expected TakeOrderedAndProject, got:\n$plan")
    assert(!plan.toString.contains("rangepartitioning"),
      "a range-partitioned global sort defeats the top-k heap")
  }
}
