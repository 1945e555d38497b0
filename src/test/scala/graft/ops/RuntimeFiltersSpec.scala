package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkSpec

class RuntimeFiltersSpec extends AnyFunSuite with SparkSpec {

  private val touched = Seq(
    "spark.sql.optimizer.runtime.bloomFilter.enabled",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
    "spark.sql.autoBroadcastJoinThreshold")

  test("withBloomFilter restores every pinned conf after success") {
    import spark.implicits._
    val before = touched.map(k => k -> spark.conf.getOption(k))
    val a = Seq((1L, "x"), (2L, "y")).toDF("k", "s")
    val b = Seq((1L, 10), (3L, 30)).toDF("k", "v")
    val out = RuntimeFilters.withBloomFilter(spark,
      a.join(b.filter(col("v") > 5), Seq("k")))
    assert(out.count() === 1)
    assert(touched.map(k => k -> spark.conf.getOption(k)) === before)
  }

  test("withBloomFilter restores confs when the body throws (finally path)") {
    val before = touched.map(k => k -> spark.conf.getOption(k))
    intercept[RuntimeException] {
      RuntimeFilters.withBloomFilter(spark, throw new RuntimeException("boom"))
    }
    assert(touched.map(k => k -> spark.conf.getOption(k)) === before)
  }
}
