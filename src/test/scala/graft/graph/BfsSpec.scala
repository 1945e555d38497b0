package graft.graph

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkSpec

class BfsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // 0→1→2→3→4→5 chain plus a shortcut 0→3 and an isolated pair 10→11
  private def chain = Seq(
    (0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (0L, 3L), (10L, 11L)
  ).toDF("s", "t")

  test("exact hop distances, shortcut taken, unreached nodes absent") {
    val got = Bfs.distancesFp(chain, "s", "t", n => n === 0L, iterations = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // shortcut 0→3 beats 0→1→2→3; 5 is 3 hops via the shortcut
    assert(got === Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 1L, 4L -> 2L, 5L -> 3L))
    // 10/11 unreached: no row, not dist 0
  }

  test("radius bound: iterations cap the frontier") {
    val got = Bfs.distancesFp(chain, "s", "t", n => n === 1L, iterations = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
  }

  test("multi-source: labels take the nearest seed") {
    val got = Bfs.distancesFp(chain, "s", "t", n => n === 0L || n === 10L,
      iterations = 4).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(11L) === 1L)
    assert(got(5L) === 3L)
  }

  test("partition invariance and eager/declarative agreement") {
    val a = Bfs.distancesFp(chain, "s", "t", n => n === 0L, iterations = 4)
      .orderBy("node").collect().toSeq
    val b = Bfs.distancesFp(chain.repartition(5), "s", "t", n => n === 0L,
      iterations = 4).orderBy("node").collect().toSeq
    val c = Bfs.distancesFp(chain, "s", "t", n => n === 0L, iterations = 4,
      eager = false).orderBy("node").collect().toSeq
    assert(a === b)
    assert(a === c)
  }
}
