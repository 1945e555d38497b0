package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class SkewJoinSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // 90% of fact rows hit key 1 — the canonical skew shape
  private lazy val fact = ((1 to 900).map(i => (1L, s"v$i")) ++
    (1 to 100).map(i => (1L + i % 10, s"w$i"))).toDF("k", "payload")
  private lazy val dim = (1L to 11L).map(k => (k, s"dim_$k")).toDF("k", "name")

  test("salted join returns exactly the plain-join result") {
    val plain = fact.join(dim, "k").select("k", "payload", "name")
      .as[(Long, String, String)].collect().sorted
    val salted = SkewJoin.saltedEquiJoin(fact, dim, "k", buckets = 4)
      .select("k", "payload", "name")
      .as[(Long, String, String)].collect().sorted
    assert(salted === plain)
    assert(salted.length === 1000)
  }

  test("salting actually spreads the hot key over multiple partitions") {
    val salted = fact.withColumn("_salt", (rand(42) * 4).cast("int"))
    val spreadCount = salted.filter($"k" === 1L)
      .select("_salt").distinct().count()
    assert(spreadCount === 4) // hot key present in every salt bucket
  }

  test("keySkewProfile surfaces the hot key with its share") {
    val prof = SkewJoin.keySkewProfile(fact, $"k", topN = 3)
      .as[(Long, Long, Double)].collect()
    assert(prof.head._1 === 1L)
    assert(prof.head._3 > 0.8) // ~90% share
  }
}
