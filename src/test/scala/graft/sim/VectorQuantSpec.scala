package graft.sim

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class VectorQuantSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("int8 codes and reconstruction error on hand-checkable vectors") {
    // dim 0 spans [0, 255] (scale 1); dim 1 is constant (scale 0)
    val df = Seq(
      (1L, Seq(0f, 7f)),
      (2L, Seq(255f, 7f)),
      (3L, Seq(127.5f, 7f))
    ).toDF("vec_id", "embedding")
    val got = VectorQuant.quantizeInt8(df, "vec_id", "embedding", dim = 2)
      .as[(Long, String, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) === (("0,0", 0.0)))
    assert(got(2L) === (("255,0", 0.0)))
    // 127.5 quantizes to code 128 (floor(127.5 + 0.5)); error = 0.5
    assert(got(3L) === (("128,0", 0.5)))
  }

  test("wide-dim hardening: dim=1024 runs as one array-typed aggregate") {
    val dim = 1024
    val rnd = new scala.util.Random(11)
    val rows = (1 to 50).map(i =>
      (i.toLong, Seq.fill(dim)(rnd.nextFloat() * 4f - 2f)))
    val df = rows.toDF("vec_id", "embedding")
    val out = VectorQuant.quantizeInt8(df, "vec_id", "embedding", dim = dim)
    // the stats pass must stay a SINGLE aggregate expression at any width —
    // the per-dimension named-agg formulation produced 2*dim = 2048 agg
    // expressions here (planner pathology / silent codegen fallback)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan.take(500))
    assert(plan.length < 50000, s"plan width grew with dim: ${plan.length} chars")
    // codes match a driver-side replay of the same formula
    val vecs = rows.map { case (id, v) => id -> v.map(_.toDouble).toArray }.toMap
    val mins = (0 until dim).map(d => vecs.values.map(_(d)).min).toArray
    val maxs = (0 until dim).map(d => vecs.values.map(_(d)).max).toArray
    val got = out.as[(Long, String, Double)].collect()
      .map(r => r._1 -> r._2).toMap
    assert(got.size === rows.size)
    rows.take(5).foreach { case (id, _) =>
      val v = vecs(id)
      val expect = (0 until dim).map { d =>
        if (maxs(d) == mins(d)) 0
        else math.floor((v(d) - mins(d)) / ((maxs(d) - mins(d)) / 255.0) + 0.5).toInt
      }.mkString(",")
      assert(got(id) === expect, s"row $id codes diverge")
    }
  }

  test("quantized ANN reproduces the float top-k within the recall bound") {
    val rnd = new scala.util.Random(3)
    val df = (0 until 60).map(i =>
      (i.toLong, Seq.fill(16)(rnd.nextFloat() * 2f - 1f))).toDF("vec_id", "embedding")
    val q = df.filter($"vec_id" < 3)
    val fl = Knn.bruteForceTopK(q, df, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val qt = Knn.quantizedTopK(q, df, "vec_id", "embedding", k = 5, dim = 16)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (fl & qt).size.toDouble / fl.size
    // per-dim reconstruction error <= scale/2 = 1/255 here; only near-exact
    // rank ties can flip, so recall stays above the catalog's 0.85 bound
    assert(recall >= 0.85, s"quantized recall $recall")
  }

  test("mean pooling averages per group elementwise; poison rows excluded") {
    val df = Seq(
      (0L, Seq(1f, 2f)), (0L, Seq(3f, 6f)),          // group 0 -> (2, 4)
      (1L, Seq(10f, 0f)),                            // group 1 -> (10, 0)
      (1L, Seq(Float.NaN, 1f)),                      // poison: dropped
      (2L, Seq(1f))                                  // wrong dim: dropped
    ).toDF("group_id", "embedding")
    val got = VectorQuant.meanPool(df, "group_id", "embedding", dim = 2)
      .as[(Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // group 2's only vector was dropped by prepare — the group-spine
    // contract still emits it as (n_vecs=0, "") so callers can tell
    // "zero clean chunks" from "absent from input" (ADVICE r9)
    assert(got === Map(
      0L -> ((2L, "2000000,4000000")),
      1L -> ((1L, "10000000,0")),
      2L -> ((0L, ""))))
  }

  test("a fully-poisoned group and an absent group are distinguishable") {
    val df = Seq(
      (5L, Seq(Float.NaN, 1f)), (5L, Seq(Float.PositiveInfinity, 0f)),
      (6L, Seq(1f, 1f))
    ).toDF("group_id", "embedding")
    val got = VectorQuant.meanPool(df, "group_id", "embedding", dim = 2)
      .as[(Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(5L) === ((0L, "")), "all-poison group surfaces with n_vecs=0")
    assert(got(6L) === ((1L, "1000000,1000000")))
    assert(!got.contains(7L), "absent group stays absent")
  }

  test("error is bounded by scale/2 on every dimension") {
    val rnd = new scala.util.Random(7)
    val df = (1 to 300).map(i =>
      (i.toLong, Seq.fill(4)(rnd.nextFloat() * 20f - 10f))).toDF("vec_id", "embedding")
    val maxErr = VectorQuant.quantizeInt8(df, "vec_id", "embedding", dim = 4)
      .agg(org.apache.spark.sql.functions.max("max_abs_err"))
      .as[Double].head()
    // every dim spans ≤ 20 -> scale ≤ 20/255 -> error ≤ 10/255 ≈ 0.0392
    assert(maxErr <= 20.0 / 255.0 / 2.0 + 1e-9, s"max err $maxErr")
  }
}
