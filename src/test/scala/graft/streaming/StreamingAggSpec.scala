package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** CDC image row for the streaming aggregate: 'd' removes its values
  * from the group, anything else adds them. (Top-level for encoders.)
  */
case class AgChange(op: String, g: String, v: Long)

/** Stream/batch agreement for the streaming materialized view: after
  * every trigger the maintained (g, cnt, sum_v) snapshot must equal the
  * full aggregate of the fact the applied images imply.
  */
class StreamingAggSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._
  implicit private lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def snapshot(dir: String): Map[String, (Long, Long)] =
    StreamingMerge.currentSnapshot(spark, dir)
      .map(_.collect().map(r => r.getAs[String]("g") ->
        ((r.getAs[Long]("cnt"), r.getAs[Long]("sum_v")))).toMap)
      .getOrElse(Map.empty)

  /** The unarguable fold: apply images to a multiset, aggregate it. */
  private def expected(changes: Seq[AgChange]): Map[String, (Long, Long)] =
    changes.foldLeft(Map.empty[String, List[Long]]) { (m, c) =>
      if (c.op == "d")
        m.updated(c.g, m.getOrElse(c.g, Nil).diff(List(c.v)))
      else m.updated(c.g, c.v :: m.getOrElse(c.g, Nil))
    }.collect { case (g, vs) if vs.nonEmpty => g -> ((vs.size.toLong, vs.sum)) }

  test("snapshot equals the full aggregate after every trigger; groups appear and drain") {
    val base = java.nio.file.Files.createTempDirectory("graft-sagg").toFile.getAbsolutePath
    val tableDir = s"$base/table"
    val stream = MemoryStream[AgChange]
    val q = StreamingAgg.aggStream(
      stream.toDF(), Seq("g"), Seq("v" -> "sum_v"),
      tableDir, s"$base/ckpt").start()
    try {
      val t1 = Seq(AgChange("i", "a", 10), AgChange("i", "a", 20),
        AgChange("i", "b", 5))
      stream.addData(t1: _*)
      q.processAllAvailable()
      assert(snapshot(tableDir) === expected(t1))

      // trigger 2: delete one of a's rows (old image), update b = d+i,
      // open a brand-new group
      val t2 = Seq(AgChange("d", "a", 10), AgChange("d", "b", 5),
        AgChange("i", "b", 50), AgChange("i", "c", 7))
      stream.addData(t2: _*)
      q.processAllAvailable()
      assert(snapshot(tableDir) === expected(t1 ++ t2))

      // trigger 3: drain group c entirely — it must vanish, not linger at 0
      val t3 = Seq(AgChange("d", "c", 7))
      stream.addData(t3: _*)
      q.processAllAvailable()
      val fin = snapshot(tableDir)
      assert(fin === expected(t1 ++ t2 ++ t3))
      assert(!fin.contains("c"))
      assert(fin === Map("a" -> ((1L, 20L)), "b" -> ((1L, 50L))))
    } finally q.stop()
  }

  test("aggregate snapshots share the version/pointer protocol: time travel works") {
    val base = java.nio.file.Files.createTempDirectory("graft-sagg-tt").toFile.getAbsolutePath
    val tableDir = s"$base/table"
    val b0 = Seq(AgChange("i", "a", 1)).toDF()
    val b1 = Seq(AgChange("i", "a", 2)).toDF()
    StreamingAgg.applyBatch(spark, b0, Seq("g"), Seq("v" -> "sum_v"), tableDir, 0)
    StreamingAgg.applyBatch(spark, b1, Seq("g"), Seq("v" -> "sum_v"), tableDir, 1)
    assert(StreamingMerge.listVersions(tableDir) === Seq(0L, 1L))
    val v0 = StreamingMerge.snapshotAt(spark, tableDir, 0).collect()
    assert(v0.length === 1 && v0.head.getAs[Long]("sum_v") === 1L)
    assert(snapshot(tableDir)("a") === ((2L, 3L)))
  }
}
