package graft.sim

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class GramSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("hand-computed triangle on a 2x2 fixture") {
    // q-vectors: (10000, -20000), (30000, 5000) after x*1e4 quantization
    val df = Seq(
      (1L, Seq(1.0f, -2.0f)), (2L, Seq(3.0f, 0.5f))
    ).toDF("vec_id", "embedding")
    val got = Gram.gramReadout(df, "embedding", dim = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    val e = Map(1L -> 10000L, 2L -> -20000L)
    assert(got((1L, 1L)) === ((10000L * 10000L + 30000L * 30000L, 2L)))
    assert(got((1L, 2L)) === ((10000L * -20000L + 30000L * 5000L, 2L)))
    assert(got((2L, 2L)) === ((-20000L * -20000L + 5000L * 5000L, 2L)))
  }

  test("partition invariance (exact integer sums)") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 60).map(i => (i.toLong, Seq.fill(8)(rnd.nextFloat() - 0.5f)))
    val df = rows.toDF("vec_id", "embedding")
    val a = Gram.gramReadout(df, "embedding", dim = 8)
      .orderBy("i", "j").collect().toSeq
    val b = Gram.gramReadout(df.repartition(9), "embedding", dim = 8)
      .orderBy("i", "j").collect().toSeq
    assert(a === b)
    assert(a.size === 8 * 9 / 2)
  }

  test("one typed aggregate; the triangle unpack never explodes data rows") {
    val df = (1 to 20).map(i => (i.toLong, Seq.fill(4)(i.toFloat / 40)))
      .toDF("vec_id", "embedding")
    val out = Gram.gramReadout(df, "embedding", dim = 4)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"),
      plan.take(500))
    // exactly one Generate — the posexplode of the 1-row triangle buffer,
    // not of the data
    assert(plan.split("Generate", -1).length - 1 <= 1, plan.take(800))
    assert(!plan.contains("CartesianProduct"), plan.take(500))
  }
}
