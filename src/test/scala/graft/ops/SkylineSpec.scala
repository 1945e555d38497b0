package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class SkylineSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("hand case: dominated drop, frontier and all-dims ties survive") {
    val pts = Seq(
      (1L, 1.0, 9.0), (2L, 5.0, 5.0), (3L, 9.0, 1.0), // frontier
      (4L, 6.0, 6.0),                                  // dominated by 2
      (5L, 5.0, 5.0),                                  // tie with 2: survives
      (6L, 1.0, 9.0)                                   // tie with 1: survives
    ).toDF("id", "x", "y")
    val got = Skyline.skyline(pts, Seq("x", "y"))
      .select("id").as[Long].collect().toSet
    assert(got === Set(1L, 2L, 3L, 5L, 6L))
  }

  test("set is invariant to partitioning and row order") {
    val pts = (0 until 2000).map { i =>
      (i.toLong, ((i * 131) % 997).toDouble, ((i * 577) % 991).toDouble)
    }.toDF("id", "x", "y")
    val a = Skyline.skyline(pts, Seq("x", "y"))
      .select("id").as[Long].collect().toSet
    val b = Skyline.skyline(pts.repartition(17), Seq("x", "y"))
      .select("id").as[Long].collect().toSet
    val c = Skyline.skyline(pts.orderBy($"x".desc), Seq("x", "y"))
      .select("id").as[Long].collect().toSet
    assert(a === b)
    assert(a === c)
    // cross-check against the quadratic definition on the driver
    val rows = pts.collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val ref = rows.filter { p => !rows.exists(q =>
      q._2 <= p._2 && q._3 <= p._3 && (q._2 < p._2 || q._3 < p._3)) }
      .map(_._1).toSet
    assert(a === ref)
  }

  test("single dim degenerates to all rows tied at the minimum") {
    val pts = Seq((1L, 2.0), (2L, 2.0), (3L, 3.0)).toDF("id", "x")
    val got = Skyline.skyline(pts, Seq("x")).select("id").as[Long].collect().toSet
    assert(got === Set(1L, 2L))
  }
}
