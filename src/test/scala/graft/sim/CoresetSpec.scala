package graft.sim

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** k-center greedy semantics: the Gonzalez radius invariant, coverage
  * optimality the greedy guarantees on a planted geometry, determinism,
  * and the prep hygiene every vector operator shares.
  */
class CoresetSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private lazy val emb = graft.ops.Tables.embeddings(spark, dir)

  private def selected(k: Int) =
    Coreset.kCenterGreedy(emb, "vec_id", "embedding", k)
      .orderBy("sel_rank")
      .as[(Long, Long, Double)].collect()

  test("radius sequence is non-increasing and ids are distinct (Gonzalez invariant)") {
    val sel = selected(6)
    assert(sel.length === 6)
    assert(sel.map(_._2).distinct.length === 6)
    assert(sel.head._3 === 0.0, "anchor has no prior center")
    // each pick is the FARTHEST remaining point, so the selection
    // distance can only shrink as centers accumulate
    val ds = sel.drop(1).map(_._3)
    assert(ds.zip(ds.tail).forall { case (a, b) => a >= b },
      s"radius sequence must be non-increasing: ${ds.toSeq}")
    assert(sel.head._2 === emb.agg(min(col("vec_id"))).head().getLong(0),
      "the anchor is the min id")
  }

  test("determinism: two runs select identically") {
    assert(selected(5).toSeq === selected(5).toSeq)
  }

  test("planted geometry: one center per well-separated direction group") {
    // three orthogonal direction bundles; greedy k=3 must take one
    // member of EACH bundle (cosine distance between bundles ~1, within
    // a bundle ~0) — the 2-approximation is exact here
    def vec(axis: Int, jitter: Double) =
      Array.tabulate(6)(i => if (i == axis) 1.0 else jitter * (i + 1))
    val docs = Seq(
      (1L, vec(0, 0.01)), (2L, vec(0, 0.02)), (3L, vec(0, 0.015)),
      (10L, vec(2, 0.01)), (11L, vec(2, 0.02)),
      (20L, vec(4, 0.01)), (21L, vec(4, 0.02))
    ).toDF("vec_id", "embedding")
    val sel = Coreset.kCenterGreedy(docs, "vec_id", "embedding", 3)
      .select(col("id")).as[Long].collect().toSet
    val groups = Seq(Set(1L, 2L, 3L), Set(10L, 11L), Set(20L, 21L))
    groups.foreach { g =>
      assert(sel.intersect(g).size === 1,
        s"expected exactly one center from $g, got $sel")
    }
  }

  test("k beyond survivors returns every survivor; poisoned rows drop") {
    val docs = Seq(
      (1L, Array(1.0, 0.0)), (2L, Array(0.0, 1.0)),
      (3L, Array(Double.NaN, 1.0)), // no direction — dropped
      (4L, Array(0.0, 0.0))         // zero norm — dropped
    ).toDF("vec_id", "embedding")
    val sel = Coreset.kCenterGreedy(docs, "vec_id", "embedding", 10)
      .select(col("id")).as[Long].collect().toSet
    assert(sel === Set(1L, 2L))
  }

  private def cosDist(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    1.0 - d / math.sqrt(na * nb)
  }

  private def radius(pts: Seq[(Long, Array[Double])], centers: Set[Long]): Double = {
    val cs = pts.filter(p => centers(p._1)).map(_._2)
    pts.map { case (_, v) => cs.map(cosDist(v, _)).min }.max
  }

  test("per-cell composition: coverage radius within 2x of flat greedy " +
      "at equal total k on planted geometry; anchors per cell; " +
      "deterministic (r18)") {
    // three orthogonal direction bundles, six members each, and a
    // quantizer whose centroids ARE the bundle axes — the cells align
    // with the geometry, as a trained quantizer's would
    def vec(axis: Int, j: Int) =
      Array.tabulate(9)(i => (if (i == axis * 4) 1.0 else 0.0) +
        0.02 * math.sin(i * 2.3 + j * 1.7))
    val pts = for (a <- 0 until 3; j <- 0 until 6)
      yield (a * 100L + j, vec(a, j))
    val docs = pts.toDF("vec_id", "embedding")
    val cents = Seq(
      (0L, Array.tabulate(9)(i => if (i == 0) 1.0 else 0.0).toSeq),
      (1L, Array.tabulate(9)(i => if (i == 4) 1.0 else 0.0).toSeq),
      (2L, Array.tabulate(9)(i => if (i == 8) 1.0 else 0.0).toSeq)
    ).toDF("cid", "cv")
    val perCell = Coreset.kCenterPerCell(docs, "vec_id", "embedding",
      kPerCell = 2, cents, "cid", "cv")
      .orderBy("cell", "sel_rank")
      .as[(Long, Long, Long, Double)].collect()
    // every cell got its budget; rank-1 rows are the per-cell min ids
    assert(perCell.length === 6)
    assert(perCell.filter(_._2 === 1L).map(_._3).toSet === Set(0L, 100L, 200L),
      "rank-1 centers must be the per-cell min-id anchors")
    perCell.groupBy(_._1).foreach { case (cell, rows) =>
      assert(rows.map(_._2).sorted.toSeq === Seq(1L, 2L), s"cell $cell budget")
      // within-cell Gonzalez: rank-1 anchor distance 0, later ranks carry
      // the selection distance
      assert(rows.find(_._2 == 1L).get._4 === 0.0)
    }
    // coverage parity vs the flat greedy at the same total k
    val flat = Coreset.kCenterGreedy(docs, "vec_id", "embedding", 6)
      .select(col("id")).as[Long].collect().toSet
    val rPer = radius(pts, perCell.map(_._3).toSet)
    val rFlat = radius(pts, flat)
    assert(rPer <= 2.0 * rFlat + 1e-9,
      s"per-cell radius $rPer must stay within 2x of flat $rFlat")
    // determinism
    val again = Coreset.kCenterPerCell(docs, "vec_id", "embedding",
      kPerCell = 2, cents, "cid", "cv")
      .orderBy("cell", "sel_rank")
      .as[(Long, Long, Long, Double)].collect()
    assert(again.toSeq === perCell.toSeq)
  }

  test("per-cell composition: a cell smaller than the budget exhausts " +
      "gracefully; poisoned rows drop at prep") {
    val docs = Seq(
      (1L, Array(1.0, 0.01, 0.0)), (2L, Array(1.0, 0.03, 0.0)),
      (3L, Array(1.0, -0.02, 0.0)),
      (10L, Array(0.0, 0.01, 1.0)), // the only member of its cell
      (20L, Array(Double.NaN, 0.0, 1.0)) // dropped
    ).toDF("vec_id", "embedding")
    val cents = Seq((0L, Seq(1.0, 0.0, 0.0)), (1L, Seq(0.0, 0.0, 1.0)))
      .toDF("cid", "cv")
    val sel = Coreset.kCenterPerCell(docs, "vec_id", "embedding",
      kPerCell = 3, cents, "cid", "cv")
      .orderBy("cell", "sel_rank")
      .as[(Long, Long, Long, Double)].collect()
    val byCell = sel.groupBy(_._1)
    assert(byCell(0L).map(_._3).toSet === Set(1L, 2L, 3L),
      "the full cell spends its whole budget")
    assert(byCell(1L).map(_._3).toSeq === Seq(10L),
      "a 1-member cell yields exactly its anchor — no padding, no NaN row")
  }

  test("empty corpus yields an empty frame with the output schema") {
    val out = Coreset.kCenterGreedy(
      emb.filter(col("vec_id") < 0), "vec_id", "embedding", 3)
    assert(out.columns.toSeq === Seq("sel_rank", "id", "sel_dist"))
    assert(out.count() === 0)
    intercept[IllegalArgumentException] {
      Coreset.kCenterGreedy(emb, "vec_id", "embedding", 0)
    }
  }
}
