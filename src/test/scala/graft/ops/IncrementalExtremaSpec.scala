package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Differential pinning of the k-reserve extrema maintenance: every
  * round of random CDC traffic must leave extrema(state ∘ refresh) equal
  * to a from-scratch recompute over the surviving multiset — including
  * rounds engineered to exhaust a reserve, overflow the insert cap
  * (bound lowering + trim), drop groups to zero, and birth new groups.
  */
class IncrementalExtremaSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val K = 3

  private def stateOf(rows: Seq[(String, Long)]): DataFrame =
    IncrementalExtrema.init(rows.toDF("grp", "v"), Seq("grp"), "v", K)

  private def deltaDf(rows: Seq[(String, Long, String)]): DataFrame =
    rows.toDF("grp", "v", "op")

  private def extremaMap(state: DataFrame): Map[String, (Long, Long, Long)] =
    IncrementalExtrema.extrema(state, Seq("grp")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

  private def truthMap(rows: Seq[(String, Long)]): Map[String, (Long, Long, Long)] =
    rows.groupBy(_._1).map { case (g, vs) =>
      g -> ((vs.map(_._2).min, vs.map(_._2).max, vs.size.toLong))
    }

  test("init: reserves are the k extremes, bound is the (k+1)-th") {
    val rows = Seq("a" -> 5L, "a" -> 1L, "a" -> 9L, "a" -> 3L, "a" -> 7L,
      "b" -> 4L, "b" -> 2L)
    val s = stateOf(rows).collect().map(r => r.getString(0) -> r).toMap
    val a = s("a")
    assert(a.getSeq[Long](1) === Seq(1L, 3L, 5L)) // lo
    assert(a.getLong(2) === 7L) // lo_bound = 4th smallest
    assert(a.getSeq[Long](3) === Seq(9L, 7L, 5L)) // hi desc
    assert(a.getLong(4) === 3L) // hi_bound = 4th largest
    assert(a.getLong(5) === 5L)
    val b = s("b")
    assert(b.getSeq[Long](1) === Seq(2L, 4L) && b.isNullAt(2)) // complete
  }

  test("extremum deletes are absorbed k-deep without touching the base") {
    val rows = (1L to 10L).map(v => "g" -> v)
    val s0 = stateOf(rows)
    // delete the current minimum twice: runner-ups are already on hand
    val s1 = IncrementalExtrema.applyDelta(s0,
      deltaDf(Seq(("g", 1L, "d"), ("g", 2L, "d"))), Seq("grp"), "v", K)
    assert(IncrementalExtrema.needsRefresh(s1).count() === 0)
    assert(extremaMap(s1) === Map("g" -> ((3L, 10L, 8L))))
    // third bottom delete empties the k=3 reserve -> flagged, refresh heals
    val s2 = IncrementalExtrema.applyDelta(s1,
      deltaDf(Seq(("g", 3L, "d"))), Seq("grp"), "v", K)
    assert(IncrementalExtrema.needsRefresh(s2).count() === 1)
    val base = rows.filterNot(r => r._2 <= 3L)
    val s3 = IncrementalExtrema.refresh(s2, base.toDF("grp", "v"),
      Seq("grp"), "v", K)
    assert(IncrementalExtrema.needsRefresh(s3).count() === 0)
    assert(extremaMap(s3) === Map("g" -> ((4L, 10L, 7L))))
  }

  test("insert-cap overflow lowers the bound and stays consistent") {
    // reserve [10,20,30], bound 40; a batch floods 5 smaller values and
    // deletes two of them + the old 10 — cap paths and trim all fire
    val s0 = stateOf(Seq("g" -> 10L, "g" -> 20L, "g" -> 30L, "g" -> 40L,
      "g" -> 50L))
    val delta = deltaDf(Seq(
      ("g", 1L, "i"), ("g", 2L, "i"), ("g", 3L, "i"), ("g", 4L, "i"),
      ("g", 5L, "i"), ("g", 2L, "d"), ("g", 3L, "d"), ("g", 10L, "d")))
    val s1 = IncrementalExtrema.applyDelta(s0, delta, Seq("grp"), "v", K)
    val truth = Seq("g" -> 1L, "g" -> 4L, "g" -> 5L, "g" -> 20L,
      "g" -> 30L, "g" -> 40L, "g" -> 50L)
    val healed = IncrementalExtrema.refresh(s1, truth.toDF("grp", "v"),
      Seq("grp"), "v", K)
    assert(extremaMap(healed) === truthMap(truth))
  }

  test("randomized differential: rounds of CDC traffic match recompute") {
    val rng = new scala.util.Random(20260814L)
    val groups = Seq("a", "b", "c")
    var truth: Seq[(String, Long)] =
      for (g <- groups; _ <- 1 to 12)
        yield g -> (rng.nextInt(100).toLong)
    var state = stateOf(truth)
    for (round <- 1 to 5) {
      // deletes target CURRENT rows (truthful CDC); occasionally target
      // the whole bottom of a group to force the refresh path
      val shuffled = rng.shuffle(truth)
      val nDel = math.min(truth.size, 2 + rng.nextInt(6) +
        (if (round == 3) 10 else 0))
      val dels = (if (round == 3)
        truth.sortBy(_._2).take(nDel) // bottom-heavy: exhausts reserves
      else shuffled.take(nDel)).map { case (g, v) => (g, v, "d") }
      val ins = (1 to 1 + rng.nextInt(8)).map { _ =>
        val g = if (round == 2 && rng.nextBoolean()) "newgrp"
          else groups(rng.nextInt(groups.size))
        (g, rng.nextInt(100).toLong, "i")
      }
      truth = {
        val remaining = scala.collection.mutable.ArrayBuffer(truth: _*)
        dels.foreach { case (g, v, _) =>
          val at = remaining.indexOf(g -> v)
          assert(at >= 0); remaining.remove(at)
        }
        remaining.toSeq ++ ins.map { case (g, v, _) => g -> v }
      }
      state = IncrementalExtrema.applyDelta(state,
        deltaDf(dels ++ ins), Seq("grp"), "v", K)
      state = IncrementalExtrema.refresh(state, truth.toDF("grp", "v"),
        Seq("grp"), "v", K).localCheckpoint()
      assert(extremaMap(state) === truthMap(truth), s"round $round diverged")
    }
  }
}
