package graft.ops

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class SurvivorshipSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def t(s: Long) = new Timestamp(s * 1000L)

  // entity 1: latest row (ts 30) has null email — the older fact must
  // survive; phone only ever set at ts 10
  private def fixture = Seq(
    (1L, t(10), 101L, Option("a@x"), Option("555")),
    (1L, t(20), 102L, Option("b@x"), None),
    (1L, t(30), 103L, None, None),
    (2L, t(5), 201L, None, None) // never populated -> stays null
  ).toDF("ent", "ts", "id", "email", "phone")

  test("per-column latest non-null wins; never-populated stays null") {
    val got = Survivorship.goldenRecord(fixture, "ent", "ts", "id",
        Seq("email", "phone"))
      .orderBy("ent").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getTimestamp(3), r.getLong(4))).toSeq
    assert(got === Seq(
      (1L, "b@x", "555", t(30), 3L),
      (2L, null, null, t(5), 1L)))
  }

  test("tie on ts breaks on the tie column, descending") {
    val ties = Seq(
      (1L, t(10), 1L, Option("old")),
      (1L, t(10), 2L, Option("new"))
    ).toDF("ent", "ts", "id", "v")
    val got = Survivorship.goldenRecord(ties, "ent", "ts", "id", Seq("v"))
      .select("v").as[String].collect().toSeq
    assert(got === Seq("new"))
  }

  test("invariant to partitioning and row order (merge path)") {
    val big = (0 until 3000).map { i =>
      (i % 40L, t(i % 53), i.toLong,
        if (i % 3 == 0) None else Option(s"v$i"))
    }.toDF("ent", "ts", "id", "v")
    val a = Survivorship.goldenRecord(big, "ent", "ts", "id", Seq("v"))
      .orderBy("ent").collect().toSeq
    val b = Survivorship.goldenRecord(big.repartition(11), "ent", "ts", "id",
        Seq("v")).orderBy("ent").collect().toSeq
    assert(a === b)
  }

  test("plan is one aggregate pass: no WindowExec, single exchange") {
    val plan = Survivorship.goldenRecord(fixture, "ent", "ts", "id",
        Seq("email", "phone")).queryExecution.executedPlan.toString
    assert(!plan.contains("WindowExec"), plan.take(800))
    assert(plan.split("Exchange", -1).length - 1 === 1, plan.take(800))
  }
}
