package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class IncrementalAggSpec extends AnyFunSuite with SparkSpec {

  // fact rows: (group, v1, v2)
  private def fact = {
    import spark.implicits._
    Seq(("a", 1L, 10L), ("a", 2L, 20L), ("b", 3L, 30L),
      ("b", 4L, 40L), ("c", 5L, 50L)).toDF("g", "v1", "v2")
  }

  private def aggregate(df: DataFrame): DataFrame =
    df.groupBy(col("g")).agg(count(lit(1)).as("cnt"),
      sum(col("v1")).as("s1"), sum(col("v2")).as("s2"))

  private def asMap(df: DataFrame): Map[String, (Long, Long, Long)] =
    df.select("g", "cnt", "s1", "s2").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

  private def apply(changes: DataFrame): DataFrame =
    IncrementalAgg.applyDelta(aggregate(fact), changes, Seq("g"),
      Seq("v1" -> "s1", "v2" -> "s2"))

  test("incremental == full recompute across delete/insert/update/new-group") {
    import spark.implicits._
    val changes = Seq(
      ("a", 1L, 10L, "d"),            // delete one of a's rows (old image)
      ("b", 3L, 30L, "d"),            // update b's first row = d + i
      ("b", 9L, 90L, "i"),
      ("d", 7L, 70L, "i")             // brand-new group
    ).toDF("g", "v1", "v2", "op")
    val edited = Seq(("a", 2L, 20L), ("b", 9L, 90L), ("b", 4L, 40L),
      ("c", 5L, 50L), ("d", 7L, 70L)).toDF("g", "v1", "v2")
    assert(asMap(apply(changes)) === asMap(aggregate(edited)))
  }

  test("a group whose count reaches zero drops out") {
    import spark.implicits._
    val changes = Seq(("c", 5L, 50L, "d")).toDF("g", "v1", "v2", "op")
    val out = asMap(apply(changes))
    assert(!out.contains("c") && out.keySet === Set("a", "b"))
  }

  test("untouched groups pass through without re-aggregation (anti-join branch)") {
    import spark.implicits._
    val changes = Seq(("a", 100L, 1000L, "i")).toDF("g", "v1", "v2", "op")
    val out = asMap(apply(changes))
    assert(out("b") === ((2L, 7L, 70L)) && out("c") === ((1L, 5L, 50L)))
    assert(out("a") === ((3L, 103L, 1030L)))
  }

  test("schema contract: agg must be exactly groupCols + cnt + sum targets") {
    import spark.implicits._
    val badAgg = aggregate(fact).withColumn("mx", lit(1L)) // a min/max column
    val changes = Seq(("a", 1L, 10L, "i")).toDF("g", "v1", "v2", "op")
    intercept[IllegalArgumentException] {
      IncrementalAgg.applyDelta(badAgg, changes, Seq("g"),
        Seq("v1" -> "s1", "v2" -> "s2"))
    }
  }

  test("seeded fuzz: incremental == full recompute over random CDC batches") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    for (round <- 1 to 5) {
      val facts = Seq.fill(40)((s"g${rnd.nextInt(6)}",
        rnd.nextInt(100).toLong, rnd.nextInt(1000).toLong))
      // deletes sample EXISTING rows (valid old images); inserts are new
      val deletes = rnd.shuffle(facts).take(rnd.nextInt(15))
        .map { case (g, a, b) => (g, a, b, "d") }
      val inserts = Seq.fill(rnd.nextInt(15))((s"g${rnd.nextInt(8)}",
        rnd.nextInt(100).toLong, rnd.nextInt(1000).toLong, "i"))
      val factDf = facts.toDF("g", "v1", "v2")
      val changes = rnd.shuffle(deletes ++ inserts).toDF("g", "v1", "v2", "op")
      val incr = asMap(IncrementalAgg.applyDelta(
        aggregate(factDf), changes, Seq("g"), Seq("v1" -> "s1", "v2" -> "s2")))
      val edited = facts.diff(deletes.map(t => (t._1, t._2, t._3))) ++
        inserts.map(t => (t._1, t._2, t._3))
      val full = asMap(aggregate(edited.toDF("g", "v1", "v2")))
      assert(incr === full, s"round $round diverged")
    }
  }

  test("net-zero batch for an unseen group leaves the aggregate unchanged") {
    import spark.implicits._
    val changes = Seq(("z", 1L, 10L, "i"), ("z", 1L, 10L, "d"))
      .toDF("g", "v1", "v2", "op")
    assert(asMap(apply(changes)) === asMap(aggregate(fact)))
  }
}
