package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class IntervalMergeSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("islands: overlap merges, touch merges, gap splits, nesting joins") {
    val iv = Seq(
      // key a: [0,10] + [5,12] overlap; [12,20] touches; [25,30] splits
      ("a", 0L, 10L), ("a", 5L, 12L), ("a", 12L, 20L), ("a", 25L, 30L),
      // key b: [0,100] swallows [10,20] (nested: pm rule must still merge)
      ("b", 0L, 100L), ("b", 10L, 20L)
    ).toDF("k", "s", "e")
    val got = IntervalMerge.merge(iv, "k", "s", "e")
      .orderBy("k", "island").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got === Seq(
      ("a", 1L, 0L, 20L, 3L), ("a", 2L, 25L, 30L, 1L),
      ("b", 1L, 0L, 100L, 2L)))
  }

  test("invariant to partitioning and input order, ties included") {
    val iv = (0 until 4000).map { i =>
      val k = i % 7L
      val s = ((i * 131) % 500).toLong * 10
      (k, s, s + ((i * 37) % 25).toLong)
    }.toDF("k", "s", "e")
    val a = IntervalMerge.merge(iv, "k", "s", "e")
      .orderBy("k", "island").collect().toSeq
    val b = IntervalMerge.merge(iv.repartition(13).orderBy($"e".desc),
        "k", "s", "e")
      .orderBy("k", "island").collect().toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("windows are key-partitioned: no unpartitioned WindowExec") {
    val iv = Seq(("a", 0L, 1L)).toDF("k", "s", "e")
    val plan = IntervalMerge.merge(iv, "k", "s", "e")
      .queryExecution.executedPlan.toString
    // every window spec must lead with the key attribute as its partition
    val specs = "windowspecdefinition\\(".r.findAllIn(plan).size
    val keyed = "windowspecdefinition\\(k#".r.findAllIn(plan).size
    assert(specs > 0 && specs === keyed, plan.take(900))
  }
}
