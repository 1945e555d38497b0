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
