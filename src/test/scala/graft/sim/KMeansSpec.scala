package graft.sim

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkSpec

class KMeansSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // Two tight groups far apart in the quantized domain; ids 0..5.
  private def groupedVecs = Seq(
    (0L, Seq(0.0f, 0.0f)), (1L, Seq(0.01f, 0.0f)), (2L, Seq(0.0f, 0.01f)),
    (3L, Seq(1.0f, 1.0f)), (4L, Seq(1.01f, 1.0f)), (5L, Seq(1.0f, 1.01f))
  ).toDF("vec_id", "embedding")

  test("converges to the two planted group means (k=2)") {
    val out = KMeans.trainReadout(groupedVecs, "vec_id", "embedding",
      k = 2, dim = 2, iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    // every point lands with its group; centroids are the exact integer
    // means of the quantized coords (offset domain: 100000 = 0.0)
    val byCid = out.groupBy(_._1)
    assert(byCid.size === 2)
    val sizes = out.map(t => (t._1, t._2)).distinct.map(_._2).sorted
    assert(sizes === Seq(3L, 3L))
    // group A mean: coords (0+100+0)/3=33, (0+0+100)/3=33 over offset
    val cvals = out.map(t => (t._1, t._3) -> t._4).toMap
    val cents = byCid.keys.toSeq.sorted.map(c => (cvals(c -> 1L), cvals(c -> 2L)))
    assert(cents.contains((100033L, 100033L)))
    assert(cents.contains((110033L, 110033L)))
  }

  test("result is invariant to input partitioning (exact integer merges)") {
    val a = KMeans.trainReadout(groupedVecs, "vec_id", "embedding",
      k = 2, dim = 2, iters = 3).orderBy("cid", "pos").collect().toSeq
    val b = KMeans.trainReadout(groupedVecs.repartition(7), "vec_id",
      "embedding", k = 2, dim = 2, iters = 3)
      .orderBy("cid", "pos").collect().toSeq
    assert(a === b)
  }

  test("an emptied cluster retains its previous centroid, n=0, inertia=0") {
    // two IDENTICAL points both become seeds (k=3 over 3 rows): after the
    // first assignment the tie breaks to the lower cid, so the duplicate
    // seed's cluster is empty and must keep its centroid via getOrElse
    val df = Seq(
      (0L, Seq(0.0f, 0.0f)), (1L, Seq(0.0f, 0.0f)), (2L, Seq(1.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val out = KMeans.trainReadout(df, "vec_id", "embedding",
      k = 3, dim = 2, iters = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val empty = out.filter(_._2 == 0L)
    assert(empty.map(_._1).distinct.length === 1)
    assert(empty.forall(_._3 == 0L)) // inertia 0
    // the empty cluster's centroid is the duplicated point's quantized
    // coords (its seed), untouched by the update loop
    assert(empty.map(t => t._4 -> t._5).toMap === Map(1L -> 100000L, 2L -> 100000L))
    // the surviving duplicate cluster holds both identical points
    assert(out.filter(_._2 == 2L).nonEmpty)
  }

  test("assignment is a projection — no join, no shuffle before the agg") {
    val q = groupedVecs.select(col("vec_id"),
      KMeans.quantize(col("embedding")).as("q"))
    val plan = KMeans.withAssignment(q,
      Array(Array(100000L, 100000L), Array(110000L, 110000L)))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan.take(800))
    assert(!plan.contains("Exchange"), plan.take(800))
  }

  test("centroid update is one O(dim)-buffer typed aggregate per iteration") {
    // the readout's stats pass shares the shape: one hash aggregate keyed
    // on cid — not an explode+groupBy(dim) that shuffles rows x dim
    val out = KMeans.trainReadout(groupedVecs, "vec_id", "embedding",
      k = 2, dim = 2, iters = 1)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Generate"), plan.take(800)) // no explode
    assert(!plan.contains("CartesianProduct"), plan.take(800))
  }
}
