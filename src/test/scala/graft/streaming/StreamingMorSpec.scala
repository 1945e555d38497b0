package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Merge-on-read stream contracts: a delete-only trigger writes ONLY a
  * pending DV sidecar (the committed snapshot's files stay
  * byte-identical), readers composing snapshot ⊖ pending DVs agree with
  * the batch fold after EVERY trigger, time travel composes with the
  * pending mask, and an upsert-bearing trigger folds everything into the
  * next full version (clearing the sidecars, honoring
  * delete-then-reinsert ordering).
  */
class StreamingMorSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._
  implicit private lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def stateRows(dir: String): Set[(Long, String, Double)] =
    StreamingMerge.currentStateMor(spark, dir, "id")
      .map(_.select("id", "name", "amount").as[(Long, String, Double)].collect().toSet)
      .getOrElse(Set.empty)

  private def expectedState(changes: Seq[SmChange]): Set[(Long, String, Double)] =
    changes.sortBy(_.seq)
      .foldLeft(Map.empty[Long, (String, Double)]) { (m, c) =>
        if (c.op == "d") m - c.id else m + (c.id -> (c.name, c.amount))
      }
      .map { case (id, (n, a)) => (id, n, a) }.toSet

  private def fileSet(dir: String): Set[String] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
      else Seq(f)
    walk(new java.io.File(dir))
      .filter(_.getName.endsWith(".parquet"))
      .map(f => s"${f.getPath}@${f.lastModified}@${f.length}").toSet
  }

  test("delete-only triggers land as sidecars; composed reads track the fold; upserts fold the mask") {
    val base = java.nio.file.Files.createTempDirectory("graft-smor").toFile.getAbsolutePath
    val tableDir = s"$base/table"
    val stream = MemoryStream[SmChange]
    val q = StreamingMerge.mergeStreamMor(
      stream.toDF(), key = "id", seqCol = "seq",
      tableDir = tableDir, checkpointDir = s"$base/ckpt").start()
    try {
      // trigger 0: upserts → full version commit (batch id 0)
      val t0 = Seq(
        SmChange("u", 1, "alpha", 10.0, 1), SmChange("u", 2, "beta", 20.0, 2),
        SmChange("u", 3, "gamma", 30.0, 3))
      stream.addData(t0: _*)
      q.processAllAvailable()
      assert(StreamingMerge.listVersions(tableDir) === Seq(0L))
      assert(stateRows(tableDir) === expectedState(t0))
      val v0Files = fileSet(s"$tableDir/v=0")

      // trigger 1: DELETE-ONLY → pending sidecar, snapshot untouched
      val t1 = Seq(SmChange("d", 2, "", 0.0, 4))
      stream.addData(t1: _*)
      q.processAllAvailable()
      assert(StreamingMerge.listVersions(tableDir) === Seq(0L),
        "a delete-only trigger must not commit a version")
      assert(fileSet(s"$tableDir/v=0") === v0Files,
        "snapshot data files must stay byte-identical under a MoR delete")
      assert(StreamingMerge.pendingDeleteBatches(tableDir) === Seq(1L))
      // ...but the COMPOSED read already reflects the delete
      assert(stateRows(tableDir) === expectedState(t0 ++ t1))

      // trigger 2: another delete-only batch → two pending sidecars
      val t2 = Seq(SmChange("d", 3, "", 0.0, 5))
      stream.addData(t2: _*)
      q.processAllAvailable()
      assert(StreamingMerge.pendingDeleteBatches(tableDir) === Seq(1L, 2L))
      assert(stateRows(tableDir) === expectedState(t0 ++ t1 ++ t2))

      // time travel composes with the pending mask: v0 alone still holds
      // all three keys; v0 ⊖ deletes-through-batch-1 drops only key 2
      val v0 = StreamingMerge.snapshotAt(spark, tableDir, 0L)
        .select("id").as[Long].collect().toSet
      assert(v0 === Set(1L, 2L, 3L))
      val asOf1 = StreamingMerge
        .snapshotWithDeletes(spark, tableDir, 0L, "id", asOfBatch = 1L)
        .select("id").as[Long].collect().toSet
      assert(asOf1 === Set(1L, 3L))

      // trigger 3: upserts (incl. RE-INSERT of the pending-deleted key 3)
      // → full commit folds the mask; pending sidecars cleared; the
      // re-insert wins over the older pending delete
      val t3 = Seq(SmChange("u", 3, "gamma2", 33.0, 6),
        SmChange("u", 9, "iota", 90.0, 7))
      stream.addData(t3: _*)
      q.processAllAvailable()
      assert(StreamingMerge.pendingDeleteBatches(tableDir).isEmpty,
        "folded sidecars must be cleared")
      assert(StreamingMerge.listVersions(tableDir) === Seq(0L, 3L))
      val all = t0 ++ t1 ++ t2 ++ t3
      assert(stateRows(tableDir) === expectedState(all))
      // the folded snapshot itself (no mask left) equals the fold too
      assert(StreamingMerge.currentSnapshot(spark, tableDir).get
        .select("id", "name", "amount").as[(Long, String, Double)]
        .collect().toSet === expectedState(all))
      assert(stateRows(tableDir).contains((3L, "gamma2", 33.0)))
    } finally q.stop()
  }
}
