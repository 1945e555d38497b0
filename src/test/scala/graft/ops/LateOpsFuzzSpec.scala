package graft.ops

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Randomized equivalence for the late-round relational operators: each
  * scale-shaped implementation is checked against its naive reference
  * formulation (window / plain groupBy / brute dominance) on seeded random
  * inputs — duplicates, nulls, ties, hot keys, empty groups. The fixture
  * specs pin behavior at one input; these sweep the input space. Seeded,
  * so failures reproduce.
  */
class LateOpsFuzzSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val rnd = new Random(20260816L)

  test("salted aggregation == plain groupBy at random salt counts") {
    for (_ <- 1 to 3) {
      val rows = Seq.fill(400)((s"k${rnd.nextInt(3)}",
        rnd.nextInt(1000).toLong, rnd.nextInt(50).toLong))
      val df = rows.toDF("k", "a", "b")
      val salts = 1 + rnd.nextInt(32)
      val salted = SaltedAgg.sumCount(df, Seq("k"), Seq("a", "b"),
        saltOn = Seq("a", "b"), salts = salts)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      val plain = df.groupBy(col("k"))
        .agg(count(lit(1)).as("n"), sum(col("a")).as("sum_a"),
          sum(col("b")).as("sum_b"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      assert(salted === plain, s"salts=$salts")
    }
  }

  test("aggregate top-k == window top-k, ties and tiny groups included") {
    for (_ <- 1 to 3) {
      // values drawn from a 5-value space: heavy ties, id tiebreak live
      val rows = Seq.fill(300)((s"g${rnd.nextInt(4)}",
        rnd.nextInt(100000).toLong, rnd.nextInt(5).toDouble))
      val df = rows.toDF("g", "id", "v").distinct()
      val k = 1 + rnd.nextInt(4)
      val agg = TopKAgg.topK(df, Seq("g"), "id", "v", k)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSet
      val win = df.withColumn("rank", row_number().over(
          Window.partitionBy(col("g")).orderBy(col("v").desc, col("id"))))
        .filter(col("rank") <= k)
        .select(col("g"), col("rank").cast("long"), col("id"), col("v"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSet
      assert(agg === win, s"k=$k")
    }
  }

  test("golden record == per-column window replay under random nulls") {
    for (_ <- 1 to 3) {
      val rows = Seq.fill(200)((s"e${rnd.nextInt(6)}",
        rnd.nextInt(40).toLong, rnd.nextInt(100000).toLong,
        if (rnd.nextInt(3) == 0) null else s"a${rnd.nextInt(9)}",
        if (rnd.nextInt(2) == 0) null else s"b${rnd.nextInt(9)}"))
      val df = rows.toDF("e", "ts", "tie", "x", "y").distinct()
      val ours = Survivorship.goldenRecord(df, "e", "ts", "tie",
        Seq("x", "y"))
        .select(col("e"), col("x"), col("y"), col("last_ts"), col("n"))
        .collect().map(r => (r.getString(0), Option(r.getString(1)),
          Option(r.getString(2)), r.getLong(3), r.getLong(4))).toSet
      def latest(c: String): DataFrame = df.filter(col(c).isNotNull)
        .withColumn("__rn", row_number().over(Window.partitionBy(col("e"))
          .orderBy(col("ts").desc, col("tie").desc)))
        .filter(col("__rn") === 1).select(col("e"), col(c))
      val ref = df.groupBy(col("e"))
        .agg(max(col("ts")).as("last_ts"), count(lit(1)).as("n"))
        .join(latest("x"), Seq("e"), "left_outer")
        .join(latest("y"), Seq("e"), "left_outer")
        .select(col("e"), col("x"), col("y"), col("last_ts"), col("n"))
        .collect().map(r => (r.getString(0), Option(r.getString(1)),
          Option(r.getString(2)), r.getLong(3), r.getLong(4))).toSet
      assert(ours === ref)
    }
  }

  test("interval coalescing == brute interval-graph reachability") {
    for (_ <- 1 to 3) {
      val rows = Seq.fill(120)((s"k${rnd.nextInt(3)}", {
        val s = rnd.nextInt(60).toLong; (s, s + rnd.nextInt(8).toLong)
      })).map { case (k, (s, e)) => (k, s, e) }
      val df = rows.toDF("k", "s", "e").distinct()
      val ours = IntervalMerge.merge(df, "k", "s", "e")
        .select(col("k"), col("start"), col("end"), col("n_rows"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      // brute: two intervals connect iff they overlap or touch; islands =
      // transitive closure, computed per key on the driver
      val byKey = rows.distinct.groupBy(_._1)
      val ref = byKey.flatMap { case (k, ivs0) =>
        val ivs = ivs0.map(t => (t._2, t._3)).sorted
        val islands = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Long, Long)]
        for ((s, e) <- ivs) {
          if (islands.nonEmpty && s <= islands.last._2) {
            val (ls, le, n) = islands.remove(islands.length - 1)
            islands += ((ls, math.max(le, e), n + 1))
          } else islands += ((s, e, 1L))
        }
        islands.map { case (s, e, n) => (k, s, e, n) }
      }.toSet
      assert(ours === ref)
    }
  }

  test("distributed skyline == brute dominance filter") {
    for (_ <- 1 to 3) {
      // small value space: heavy ties — equal rows must all survive
      val rows = Seq.fill(150)((rnd.nextInt(100000).toLong,
        rnd.nextInt(6).toDouble, rnd.nextInt(6).toDouble,
        rnd.nextInt(6).toDouble))
      val df = rows.toDF("id", "a", "b", "c").distinct()
      val ours = Skyline.skyline(df, Seq("a", "b", "c"))
        .select("id").as[Long].collect().toSet
      val all = df.collect().map(r => (r.getLong(0),
        Array(r.getDouble(1), r.getDouble(2), r.getDouble(3))))
      def dom(x: Array[Double], y: Array[Double]) =
        x.zip(y).forall { case (p, q) => p <= q } &&
          x.zip(y).exists { case (p, q) => p < q }
      val ref = all.filter { case (_, v) =>
        !all.exists { case (_, u) => dom(u, v) } }.map(_._1).toSet
      assert(ours === ref)
    }
  }
}
