package graft.sim

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkSpec

class PcaSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // rows concentrated along (3, 1, 0)/√10 with small deterministic noise:
  // the dominant direction is unambiguous
  private def fixture = (0 until 400).map { i =>
    val t = (i % 21 - 10) / 25.0 // in [-0.4, 0.4]
    val eps = ((i * 37) % 11 - 5) / 1000.0
    (i.toLong, Seq(0.3 * t * 3, 0.3 * t + eps, eps * 2))
  }.toDF("id", "vec")

  test("direction converges to the planted axis (ratio v1/v2 ≈ 3)") {
    val v = Pca.dominantDirection(fixture, "vec", dim = 3, iters = 8)
    assert(math.abs(v(0).toDouble / v(1) - 3.0) < 0.05, v.toSeq.toString)
    // the noise axis carries almost nothing
    assert(math.abs(v(2)) < math.abs(v(0)) / 20, v.toSeq.toString)
  }

  test("iteration is exact integer arithmetic: same result every run, " +
    "any partitioning") {
    val a = Pca.dominantDirection(fixture, "vec", 3, 6).toSeq
    val b = Pca.dominantDirection(fixture.repartition(7), "vec", 3, 6).toSeq
    assert(a === b)
  }

  test("projection top-k: extreme rows along the axis win, score exact") {
    val top = Pca.projectTopK(fixture, "id", "vec", dim = 3, iters = 8, k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // |t| is maximal at i % 21 ∈ {0, 20} — every top row must come from there
    top.foreach { case (id, _) => assert(id % 21 === 0L || id % 21 === 20L) }
    // exact integer determinism across partitioning
    val again = Pca.projectTopK(fixture.repartition(5), "id", "vec", 3, 8, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(top.toSeq === again.toSeq)
  }

  test("top-k plan is TakeOrderedAndProject, not a global sort") {
    val plan = Pca.projectTopK(fixture, "id", "vec", 3, 4, 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(600))
  }
}
