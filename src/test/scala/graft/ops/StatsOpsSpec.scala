package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Semantic invariants of the statistics/sampling operators that the
  * value oracles can't express: order/partitioning independence of the
  * checksum, the Poisson bootstrap's unit mean, aHash brightness
  * invariance, and the A/B split's balance.
  */
class StatsOpsSpec extends AnyFunSuite with SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("table checksum is invariant under repartitioning") {
    def checksumOf(parts: Int): Double = {
      val li = Tables.lineitem(spark, d).repartition(parts)
      val rowh = conv(substring(md5(concat_ws("|",
        col("l_orderkey"), col("l_linenumber"), col("l_returnflag"))), 1, 8),
        16, 10).cast("long")
      li.agg(sum(rowh).cast("decimal(38,0)").cast("double")).head().getDouble(0)
    }
    assert(checksumOf(1) === checksumOf(17))
  }

  test("poisson bootstrap multiplicities average ~1 per replicate") {
    val res = RelationalQueries.queries("q_bootstrap_mean")(spark, d)
      .collect()
    assert(res.length === 32)
    val total = Tables.lineitem(spark, d).count()
    res.foreach { r =>
      val n = r.getLong(1)
      assert(math.abs(n.toDouble / total - 1.0) < 0.05,
        s"replicate ${r.getLong(0)} resampled $n of $total rows")
    }
    // replicate means differ (the resamples are real, not copies)
    assert(res.map(_.getDouble(2)).distinct.length > 16)
  }

  test("aHash is invariant under uniform brightness shifts") {
    import graft.multimodal.ImageCodecs
    def shifted(delta: Int) = ImageCodecs.stripePng(16, 16,
      Seq((60 + delta, 60 + delta, 60 + delta),
        (120 + delta, 120 + delta, 120 + delta),
        (30 + delta, 30 + delta, 30 + delta),
        (180 + delta, 180 + delta, 180 + delta)))
    val h0 = ImageCodecs.aHash64(shifted(0))
    assert(h0 !== 0L)
    // adding a constant to every pixel shifts cells and mean equally:
    // the above/below-mean bits cannot move (no clipping at ±40)
    assert(ImageCodecs.aHash64(shifted(40)) === h0)
    assert(ImageCodecs.aHash64(shifted(-20)) === h0)
  }

  test("md5-parity A/B assignment is balanced and deterministic") {
    val li = RelationalQueries.queries("q_ab_test")(spark, d).head()
    val n0 = li.getLong(0); val n1 = li.getLong(1)
    val total = (n0 + n1).toDouble
    assert(math.abs(n0 / total - 0.5) < 0.02, s"arms unbalanced: $n0 vs $n1")
    // deterministic: a rerun reproduces the identical readout
    val again = RelationalQueries.queries("q_ab_test")(spark, d).head()
    assert(li === again)
  }
}
