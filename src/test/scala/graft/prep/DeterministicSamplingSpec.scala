package graft.prep

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class DeterministicSamplingSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private lazy val ids = spark.range(0, 2000).toDF("id")

  test("draws are uniform-ish in [0,1) and a pure function of the id") {
    val draws = ids.select(col("id"),
        DeterministicSampling.uniformDraw(col("id")).as("u"))
      .as[(Long, Double)].collect().toMap
    assert(draws.values.forall(u => u >= 0.0 && u < 1.0))
    val mean = draws.values.sum / draws.size
    assert(math.abs(mean - 0.5) < 0.02, s"mean $mean")
    // replay: the same ids produce byte-identical draws (no RNG state)
    val again = ids.repartition(7).select(col("id"),
        DeterministicSampling.uniformDraw(col("id")).as("u"))
      .as[(Long, Double)].collect().toMap
    assert(again === draws, "draws must not depend on partitioning")
  }

  test("weight boundaries: >=1 keeps all, 0 keeps none, 0.3 keeps ~30%") {
    def kept(w: Double) = ids.filter(
      DeterministicSampling.weightedKeep(col("id"), lit(w))).count()
    assert(kept(1.5) === 2000L)
    assert(kept(0.0) === 0L)
    val frac = kept(0.3) / 2000.0
    assert(math.abs(frac - 0.3) < 0.04, s"kept fraction $frac")
  }
}
