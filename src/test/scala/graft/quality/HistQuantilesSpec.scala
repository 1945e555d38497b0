package graft.quality

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkSpec

class HistQuantilesSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // 1..100 cents across two batches; fence frozen over the whole range
  private def valuesDf = (1 to 100).map(v => (v.toLong, (v % 2).toLong))
    .toDF("v", "b")
  private def fence = valuesDf.agg(min(col("v")).as("lo"), max(col("v")).as("hi"))

  test("hand-checked p50 on 1..100, 10 bins") {
    val hist = HistQuantiles.mergedHistogram(valuesDf, "v", "b", fence, bins = 10)
    val got = HistQuantiles.quantiles(hist, fence, bins = 10,
      ps = Seq((50, 1, 2))).collect()(0)
    // bin(v) = ((v-1)*10) div 99: bin 4 covers v in 41..50, cum 50 hits
    // the target ceil(100/2) = 50 exactly
    assert(got.getAs[Long]("p_pct") === 50L)
    assert(got.getAs[Long]("qbin") === 4L)
    assert(got.getAs[Long]("cum_le") === 50L)
    assert(got.getAs[Long]("n") === 100L)
    // est = lo + (qbin+1) * (99/10) = 1 + 5*9.9
    assert(got.getAs[Double]("est") === 50.5)
  }

  test("per-batch fold equals the one-shot histogram exactly") {
    val merged = HistQuantiles.mergedHistogram(valuesDf, "v", "b", fence, bins = 10)
      .orderBy("bin").collect().toSeq
    val oneShot = HistQuantiles
      .mergedHistogram(valuesDf.withColumn("b", lit(0L)), "v", "b", fence, bins = 10)
      .orderBy("bin").collect().toSeq
    assert(merged === oneShot)
  }

  test("out-of-fence values clamp to edge bins on both div semantics") {
    // fence frozen at [10, 20]; later-batch values 1 (below) and 99 (above)
    val df = Seq((10L, 0L), (20L, 0L), (1L, 1L), (99L, 1L)).toDF("v", "b")
    val f = df.filter(col("b") === 0L)
      .agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
    val hist = HistQuantiles.mergedHistogram(df, "v", "b", f, bins = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // v=1: quotient is negative — truncation and floor differ, the clamp
    // absorbs both to bin 0; v=99 clamps to the top bin
    assert(hist(0L) === 2L) // v=10 and the clamped v=1
    assert(hist(3L) === 2L) // v=20 (exact hi) and the clamped v=99
  }

  test("quantile targets are integer-rational — no double p*n boundary flips") {
    // n=10 with p=90%: target must be exactly 9 (not 9.000000000000002's
    // ceil of 10)
    val df = (1 to 10).map(v => (v.toLong, 0L)).toDF("v", "b")
    val f = df.agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
    val hist = HistQuantiles.mergedHistogram(df, "v", "b", f, bins = 10)
    val got = HistQuantiles.quantiles(hist, f, bins = 10, ps = Seq((90, 9, 10)))
      .collect()(0)
    // bin(v) = ((v-1)*10) div 9 → v=9 lands in bin 8 (cum 9 = target)
    assert(got.getAs[Long]("qbin") === 8L)
    assert(got.getAs[Long]("cum_le") === 9L)
  }
}
