package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.ops.AsOfJoin

class AsOfJoinSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private lazy val trades = Seq(
    (1L, 10L, "t1"), (1L, 20L, "t2"), (1L, 30L, "t3"),
    (2L, 15L, "t4"), (3L, 5L, "t5")
  ).toDF("key", "time", "trade")

  private lazy val quotes = Seq(
    (1L, 8L, 100.0), (1L, 20L, 101.0), (1L, 25L, 102.0),
    (2L, 16L, 200.0) // after trade t4 -> no match for key 2
  ).toDF("qkey", "qtime", "price")

  private def expected = Map(
    "t1" -> Some(100.0), // quote@8 <= 10
    "t2" -> Some(101.0), // quote@20 == 20 (at-or-before)
    "t3" -> Some(102.0), // quote@25 <= 30
    "t4" -> None,        // only quote for key 2 is at 16 > 15
    "t5" -> None)        // key 3 has no quotes

  test("native as-of exec: correct matches, at-or-before semantics, null misses") {
    val out = AsOfJoinPlan.asOf(trades, quotes, "key", "time", "qkey", "qtime")
      .select($"trade", $"price").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(out === expected)
  }

  test("native exec agrees with the compose-built-ins formulation") {
    val composed = AsOfJoin.asOf(trades,
        quotes.toDF("key", "time", "price"), "key", "time", Seq("price"))
      .select($"trade", $"price").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(composed === expected)
  }

  test("native exec on shuffled many-partition input (exchange + sort inserted)") {
    val rng = new scala.util.Random(3)
    val bigLeft = (1 to 2000).map(i =>
      (rng.nextInt(20).toLong, rng.nextInt(1000).toLong, i.toLong))
      .toDF("key", "time", "id").repartition(7)
    val bigRight = (1 to 500).map(_ =>
      (rng.nextInt(20).toLong, rng.nextInt(1000).toLong, rng.nextDouble()))
      .distinct.toDF("qkey", "qtime", "price")
      .groupBy("qkey", "qtime").agg(max("price").as("price"))
      .repartition(3)
    val native = AsOfJoinPlan.asOf(bigLeft, bigRight, "key", "time", "qkey", "qtime")
      .select($"id", $"price").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    val composed = AsOfJoin.asOf(bigLeft,
        bigRight.toDF("key", "time", "price"), "key", "time", Seq("price"))
      .select($"id", $"price").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(native.size === 2000)
    assert(native === composed)
  }

  test("native exec: null keys/times never match and never crash") {
    val l = Seq((Some(1L), Some(10L), "a"), (None, Some(10L), "b"),
      (Some(1L), None, "c"), (Some(2L), Some(9L), "d"))
      .toDF("key", "time", "trade")
    val r = Seq((Some(1L), Some(8L), 1.0), (None, Some(1L), 9.0),
      (Some(2L), None, 9.0), (Some(2L), Some(4L), 2.0))
      .toDF("qkey", "qtime", "price")
    val out = AsOfJoinPlan.asOf(l, r, "key", "time", "qkey", "qtime")
      .select($"trade", $"price").collect()
      .map(x => x.getString(0) -> (if (x.isNullAt(1)) None else Some(x.getDouble(1))))
      .toMap
    assert(out === Map("a" -> Some(1.0), "b" -> None, "c" -> None, "d" -> Some(2.0)))
  }

  test("composed as-of carries all value columns from the SAME right row") {
    // right row at t=20 has a null aux; per-column carry would backfill aux
    // from the older row at t=8, stitching two right rows together
    val l = Seq((1L, 30L, "t")).toDF("key", "time", "trade")
    val r = Seq((1L, 8L, Some(100.0), Some("old")), (1L, 20L, Some(101.0), None))
      .toDF("key", "time", "price", "aux")
    val row = AsOfJoin.asOf(l, r, "key", "time", Seq("price", "aux")).collect().head
    assert(row.getAs[Double]("price") === 101.0)
    assert(row.isNullAt(row.fieldIndex("aux")))
  }

  test("forward direction: first at-or-after match, null when none follows") {
    val out = AsOfJoinPlan.asOfForward(trades, quotes,
        "key", "time", "qkey", "qtime")
      .select($"trade", $"price").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(out === Map(
      "t1" -> Some(101.0), // first quote >= 10 is quote@20
      "t2" -> Some(101.0), // quote@20 == 20: equality included forward too
      "t3" -> None,        // no quote at/after 30
      "t4" -> Some(200.0), // quote@16 >= 15 — the row backward missed
      "t5" -> None))
  }

  test("nearest direction: min |gap| wins, exact tie breaks backward") {
    // key 1 quotes at 8/20/25: trade@10 -> back gap 2 vs fwd gap 10 (back);
    // trade@30 -> only back exists; key 4: quotes at 10 and 30, trade@20 is
    // an EXACT tie -> backward (quote@10) by convention
    val l = trades.unionByName(Seq((4L, 20L, "t6")).toDF("key", "time", "trade"))
    val q = quotes.unionByName(
      Seq((4L, 10L, 400.0), (4L, 30L, 401.0)).toDF("qkey", "qtime", "price"))
    val out = AsOfJoinPlan.asOfNearest(l, q, "trade",
        "key", "time", "qkey", "qtime", Seq("price"))
      .select($"trade", $"price", $"qtime_matched").collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some((r.getDouble(1), r.getLong(2)))))
      .toMap
    assert(out === Map(
      "t1" -> Some((100.0, 8L)),   // back gap 2 beats fwd gap 10
      "t2" -> Some((101.0, 20L)),  // exact hit
      "t3" -> Some((102.0, 25L)),  // nothing forward
      "t4" -> Some((200.0, 16L)),  // nothing backward — forward wins
      "t5" -> None,                // no quotes at all
      "t6" -> Some((400.0, 10L)))) // exact tie -> backward
  }

  test("physical plan contains the custom exec with exchanges under it") {
    val plan = AsOfJoinPlan.asOf(trades, quotes, "key", "time", "qkey", "qtime")
      .queryExecution.executedPlan.toString
    // node prints without the Exec suffix; exchanges + sorts must be
    // auto-inserted by EnsureRequirements under it
    assert(plan.contains("AsOfJoin"), plan)
    assert(plan.contains("Exchange hashpartitioning"), plan)
    assert(plan.contains("Sort ["), plan)
  }
}
