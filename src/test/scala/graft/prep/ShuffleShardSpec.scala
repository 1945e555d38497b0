package graft.prep

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkSpec

class ShuffleShardSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def ids = (0L until 250L).toDF("doc_id")

  test("exact sharding: every shard full except the last, positions dense") {
    val out = ShuffleShard.shard(ids, "doc_id", "s1", shardSize = 100L)
    val byShard = out.groupBy("shard").agg(count(lit(1)).as("n"),
      min("pos").as("lo"), max("pos").as("hi"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(byShard === Map(0L -> ((100L, 0L, 99L)), 1L -> ((100L, 0L, 99L)),
      2L -> ((50L, 0L, 49L))))
  }

  test("reproducible across partitioning; a new seed is a new permutation") {
    val a = ShuffleShard.shard(ids, "doc_id", "s1", 64L)
      .orderBy("shard", "pos").collect().map(_.getLong(0)).toSeq
    val b = ShuffleShard.shard(ids.repartition(7), "doc_id", "s1", 64L)
      .orderBy("shard", "pos").collect().map(_.getLong(0)).toSeq
    val c = ShuffleShard.shard(ids, "doc_id", "s2", 64L)
      .orderBy("shard", "pos").collect().map(_.getLong(0)).toSeq
    assert(a === b)
    assert(a !== c) // different epoch
    assert(a.sorted === c.sorted) // same corpus, permuted
  }

  test("the order is actually shuffled, not id order") {
    val a = ShuffleShard.shard(ids, "doc_id", "s1", 250L)
      .orderBy("pos").collect().map(_.getLong(0)).toSeq
    assert(a !== (0L until 250L).toSeq)
  }
}
