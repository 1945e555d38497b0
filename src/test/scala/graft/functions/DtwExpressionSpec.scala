package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.dist.Distances

class DtwExpressionSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, Seq(0.0, 1.0, 0.0, 0.0), Seq(0.0, 0.0, 1.0, 0.0)),
    (2L, Seq(1.0, 2.0, 3.0, 4.0), Seq(1.0, 2.0, 2.0, 3.0)),
    (3L, Seq(0.0, 0.0), Seq(1.0, 1.0))
  ).toDF("id", "a", "b")

  test("native expression matches the pure-Scala kernel, in SQL and Column API") {
    GraftFunctions.register(spark)
    val out = df.select($"id",
      GraftFunctions.dtwDistance($"a", $"b").as("d"),
      GraftFunctions.euclideanDistance($"a", $"b").as("e"))
      .as[(Long, Double, Double)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    val rows = df.as[(Long, Seq[Double], Seq[Double])].collect()
    rows.foreach { case (id, a, b) =>
      assert(math.abs(out(id)._1 - Distances.dtw(a.toArray, b.toArray)) < 1e-12)
      assert(math.abs(out(id)._2 - Distances.Euclidean(a.toArray, b.toArray)) < 1e-12)
    }
    // SQL surface
    df.createOrReplaceTempView("dtw_in")
    val sqlOut = spark.sql(
      "SELECT id, dtw_distance(a, b) AS d FROM dtw_in ORDER BY id")
      .as[(Long, Double)].collect().toMap
    assert(math.abs(sqlOut(1L) - 0.0) < 1e-12) // shifted spike aligns free
  }

  test("expression stays inside whole-stage codegen") {
    GraftFunctions.register(spark)
    // local Seq data folds to LocalTableScan — use a range-backed plan
    val ranged = spark.range(100).select(
      array(col("id").cast("double"), (col("id") + 1).cast("double")).as("a"),
      array((col("id") * 2).cast("double"), col("id").cast("double")).as("b"))
    val q = ranged.select(GraftFunctions.dtwDistance($"a", $"b").as("d"))
    val plan = q.queryExecution.executedPlan.toString
    // "*(n)" marks operators inside a WholeStageCodegen stage
    assert(plan.contains("*(1) Project [dtw_distance"), plan)
    assert(q.count() === 100)
  }

  test("null inputs yield null (binary expression null semantics)") {
    GraftFunctions.register(spark)
    val withNull = Seq((1L, Option.empty[Seq[Double]], Some(Seq(1.0))))
      .toDF("id", "a", "b")
    val r = withNull.select(GraftFunctions.dtwDistance($"a", $"b")).head()
    assert(r.isNullAt(0))
  }

  test("type mismatch is rejected at analysis") {
    GraftFunctions.register(spark)
    val bad = Seq((1, "x")).toDF("id", "s")
    assertThrows[org.apache.spark.sql.AnalysisException] {
      bad.select(GraftFunctions.dtwDistance(col("s"), col("s"))).collect()
    }
  }
}
