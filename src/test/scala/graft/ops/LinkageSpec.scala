package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Blocking contracts the oracled q_record_linkage can't pin: candidate
  * generation is bounded by blocks (never all-pairs), matches outside
  * the block key's reach are invisible BY DESIGN, and the checksum-style
  * determinism under repartitioning.
  */
class LinkageSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def a = Seq(
    (1L, "alpha-one"), (2L, "beta-two"), (3L, "gama-three"))
    .toDF("id", "txt")
  private def b = Seq(
    (11L, "alpha-onX"),   // tail substitution: same 4-prefix block, dist 1
    (12L, "Xeta-two"),    // HEAD edit: leaves the block, invisible
    (13L, "gama-thre"))   // deletion at tail: same block, dist 1
    .toDF("id", "txt")

  test("finds tail-edited matches, misses head-edited ones (blocking contract)") {
    val got = Linkage.fuzzyJoin(a, b, "id", "id", "txt", "txt")
      .select("a_id", "b_id", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((1L, 11L, 1L), (3L, 13L, 1L)))
  }

  test("candidates are block-bounded, not all-pairs") {
    // distinct 4-char prefixes → candidate count is sum over blocks of
    // |A_blk|*|B_blk| = 3, not |A|*|B| = 9
    val an = a.select(substring(col("txt"), 1, 4).as("blk"))
    val bn = b.select(substring(col("txt"), 1, 4).as("blk"))
    val cand = an.join(bn, "blk").count()
    assert(cand === 2L) // alpha/gama blocks match; beta's twin left its block
  }

  test("result is invariant under repartitioning of either side") {
    val base = Linkage.fuzzyJoin(a, b, "id", "id", "txt", "txt")
      .collect().map(_.toSeq).toSet
    val shuffled = Linkage.fuzzyJoin(a.repartition(7), b.repartition(3),
      "id", "id", "txt", "txt").collect().map(_.toSeq).toSet
    assert(base === shuffled)
  }
}
