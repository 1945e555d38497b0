package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkSpec

class MergeOpsSpec extends AnyFunSuite with SparkSpec {

  private def base = {
    import spark.implicits._
    Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30)).toDF("k", "name", "v")
  }

  test("upsert: update wins per key, new key inserts, untouched rows survive") {
    import spark.implicits._
    val updates = Seq((2L, "B", 99), (4L, "d", 40)).toDF("k", "name", "v")
    val out = MergeOps.upsert(base, updates, "k").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    assert(out === Map(1L -> ("a", 10), 2L -> ("B", 99),
      3L -> ("c", 30), 4L -> ("d", 40)))
  }

  test("upsert: a NULL column in the update row overwrites (row presence, not coalesce)") {
    import spark.implicits._
    val updates = Seq((2L, Option.empty[String], 99)).toDF("k", "name", "v")
    val r = MergeOps.upsert(base, updates, "k").filter(col("k") === 2L).head
    assert(r.isNullAt(1) && r.getInt(2) === 99)
  }

  test("upsert rejects schema mismatch") {
    import spark.implicits._
    val bad = Seq((2L, "B")).toDF("k", "name")
    intercept[IllegalArgumentException] { MergeOps.upsert(base, bad, "k") }
  }

  test("applyChanges: deletes remove, upserts replace, one pass") {
    import spark.implicits._
    val changes = Seq(
      (1L, "A", 11, "u"), (3L, "c", 0, "d"), (5L, "e", 50, "u"))
      .toDF("k", "name", "v", "op")
    val out = MergeOps.applyChanges(base, changes, "k").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    assert(out === Map(1L -> ("A", 11), 2L -> ("b", 20), 5L -> ("e", 50)))
  }

  test("scd2Apply closes the current version and appends the new one") {
    import spark.implicits._
    val hist = Seq(
      (1L, 10.0, "2020-01-01", Option.empty[String]),
      (1L, 5.0, "2019-01-01", Some("2020-01-01")), // already-closed version
      (2L, 20.0, "2020-01-01", Option.empty[String]))
      .toDF("k", "v", "effective_from", "effective_to")
      .select(col("k"), col("v"),
        to_date(col("effective_from")).as("effective_from"),
        to_date(col("effective_to")).as("effective_to"))
    val changes = Seq((1L, 11.0, "2023-06-01"))
      .toDF("k", "v", "change_ts")
      .select(col("k"), col("v"), to_date(col("change_ts")).as("change_ts"))
    val out = MergeOps.scd2Apply(hist, changes, "k").collect()
    assert(out.length === 4)
    val k1Current = out.filter(r => r.getLong(0) == 1L && r.isNullAt(3))
    assert(k1Current.length === 1 && k1Current.head.getDouble(1) === 11.0)
    val k1Closed = out.filter(r => r.getLong(0) == 1L && !r.isNullAt(3))
    assert(k1Closed.map(_.getDate(3).toString).sorted.toSeq
      === Seq("2020-01-01", "2023-06-01"))
    // untouched key stays current
    val k2 = out.filter(_.getLong(0) == 2L)
    assert(k2.length === 1 && k2.head.isNullAt(3))
  }

  test("changeFeed emits the minimal i/u/d batch with the right payload sides") {
    import spark.implicits._
    val neu = Seq((1L, "a", 10),          // unchanged -> absent from feed
      (2L, "B", 99),                       // payload changed -> 'u', new payload
      (4L, "d", 40))                       // new key -> 'i'
      .toDF("k", "name", "v")              // key 3 absent -> 'd', old payload
    val feed = MergeOps.changeFeed(base, neu, "k").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getString(3)))).toMap
    assert(feed === Map(
      2L -> (("B", 99, "u")), 3L -> (("c", 30, "d")), 4L -> (("d", 40, "i"))))
  }

  test("round-trip law: applyChanges(old, changeFeed(old, new)) == new") {
    import spark.implicits._
    val neu = Seq((2L, "B", 99), (3L, Option.empty[String].orNull, 30), (5L, "e", 50))
      .toDF("k", "name", "v")
    val rebuilt = MergeOps.applyChanges(
      base, MergeOps.changeFeed(base, neu, "k"), "k")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), Option(r.getString(1)), r.getInt(2))).toSet
    assert(rows(rebuilt) === rows(neu))
    // null payload difference detected null-safely: (3, "c") -> (3, null) is a 'u'
    val ops = MergeOps.changeFeed(base, neu, "k").collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(ops === Map(1L -> "d", 2L -> "u", 3L -> "u", 5L -> "i"))
  }

  test("seeded fuzz: changeFeed round-trips random snapshot pairs") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    for (round <- 1 to 5) {
      def snap() = rnd.shuffle((1L to 30L).toList).take(12 + rnd.nextInt(10))
        .map(k => (k, if (rnd.nextBoolean()) s"n$k-${rnd.nextInt(3)}" else null,
          rnd.nextInt(100)))
      val (a, b) = (snap(), snap())
      val (dfA, dfB) = (a.toDF("k", "name", "v"), b.toDF("k", "name", "v"))
      val rebuilt = MergeOps.applyChanges(
        dfA, MergeOps.changeFeed(dfA, dfB, "k"), "k")
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), Option(r.getString(1)), r.getInt(2))).toSet
      assert(rows(rebuilt) === b.map(t => (t._1, Option(t._2), t._3)).toSet,
        s"round $round diverged")
      // and the feed is MINIMAL: identical keys never appear
      val identical = a.toSet.intersect(b.toSet).map(_._1)
      val feedKeys = MergeOps.changeFeed(dfA, dfB, "k")
        .select("k").as[Long].collect().toSet
      assert(feedKeys.intersect(identical).isEmpty, s"round $round not minimal")
    }
  }

  test("upsert of a small delta never shuffles the base side") {
    import spark.implicits._
    val updates = Seq((2L, "B", 99)).toDF("k", "name", "v")
    val plan = MergeOps.upsert(base, updates, "k")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"expected broadcast anti join:\n$plan")
  }
}
