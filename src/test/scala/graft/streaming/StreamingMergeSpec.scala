package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** CDC row: op ('u' upsert / 'd' delete), key, payload, sequence.
  * (Top-level: Spark encoders can't reach a class nested in the suite.)
  */
case class SmChange(op: String, id: Long, name: String, amount: Double, seq: Long)

/** Stream/batch agreement for the streaming MERGE path (the funnelStages
  * doctrine): after every trigger the maintained snapshot must equal the
  * batch fold of ALL changes so far through the same MergeOps primitive.
  */
class StreamingMergeSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._
  implicit private lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private type Change = SmChange
  private def Change(op: String, id: Long, name: String, amount: Double, seq: Long) =
    SmChange(op, id, name, amount, seq)

  private def snapshotRows(dir: String): Set[(Long, String, Double)] =
    StreamingMerge.currentSnapshot(spark, dir)
      .map(_.select("id", "name", "amount").as[(Long, String, Double)].collect().toSet)
      .getOrElse(Set.empty)

  /** The batch-side fold: replay every change in seq order through plain
    * scala (the unarguable oracle for a keyed upsert/delete log).
    */
  private def expectedState(changes: Seq[Change]): Set[(Long, String, Double)] =
    changes.sortBy(_.seq)
      .foldLeft(Map.empty[Long, (String, Double)]) { (m, c) =>
        if (c.op == "d") m - c.id else m + (c.id -> (c.name, c.amount))
      }
      .map { case (id, (n, a)) => (id, n, a) }.toSet

  test("snapshot equals the batch fold after every trigger; deletes and re-inserts apply") {
    val base = java.nio.file.Files.createTempDirectory("graft-smerge").toFile.getAbsolutePath
    val tableDir = s"$base/table"
    val ckpt = s"$base/ckpt"
    val stream = MemoryStream[SmChange]
    val q = StreamingMerge.mergeStream(
      stream.toDF(), key = "id", seqCol = "seq",
      tableDir = tableDir, checkpointDir = ckpt).start()
    try {
      val t1 = Seq(
        Change("u", 1, "alpha", 10.0, 1), Change("u", 2, "beta", 20.0, 2),
        // same key twice in one trigger: latest (seq 4) must win
        Change("u", 3, "gamma-old", 1.0, 3), Change("u", 3, "gamma", 30.0, 4))
      stream.addData(t1: _*)
      q.processAllAvailable()
      assert(snapshotRows(tableDir) === expectedState(t1))
      assert(snapshotRows(tableDir).contains((3L, "gamma", 30.0)))

      // trigger 2: update an existing key, delete another, insert a new one
      val t2 = Seq(
        Change("u", 1, "alpha2", 11.0, 5), Change("d", 2, "", 0.0, 6),
        Change("u", 9, "iota", 90.0, 7))
      stream.addData(t2: _*)
      q.processAllAvailable()
      assert(snapshotRows(tableDir) === expectedState(t1 ++ t2))
      assert(!snapshotRows(tableDir).exists(_._1 == 2L), "deleted key survived")

      // trigger 3: delete-then-reinsert the same key within one trigger
      // (seq order: the reinsert is latest and must win), plus a
      // delete of a never-seen key (no-op)
      val t3 = Seq(
        Change("d", 1, "", 0.0, 8), Change("u", 1, "alpha3", 12.0, 9),
        Change("d", 777, "", 0.0, 10))
      stream.addData(t3: _*)
      q.processAllAvailable()
      val all = t1 ++ t2 ++ t3
      assert(snapshotRows(tableDir) === expectedState(all))
      assert(snapshotRows(tableDir).contains((1L, "alpha3", 12.0)))
    } finally q.stop()
  }

  test("applyBatch in batch mode matches the same fold; empty batch is a no-op") {
    val base = java.nio.file.Files.createTempDirectory("graft-smerge-b").toFile.getAbsolutePath
    val tableDir = s"$base/table"
    val b1 = Seq(Change("u", 1, "a", 1.0, 1), Change("u", 2, "b", 2.0, 2))
    StreamingMerge.applyBatch(spark, b1.toDF(), "id", "seq", tableDir, batchId = 0)
    assert(snapshotRows(tableDir) === expectedState(b1))
    val v1 = StreamingMerge.currentSnapshot(spark, tableDir).get
    StreamingMerge.applyBatch(spark,
      spark.emptyDataset[SmChange].toDF(), "id", "seq", tableDir, batchId = 1)
    // pointer unmoved on empty batch
    assert(snapshotRows(tableDir) === expectedState(b1))
    val b2 = Seq(Change("d", 1, "", 0.0, 3))
    StreamingMerge.applyBatch(spark, b2.toDF(), "id", "seq", tableDir, batchId = 2)
    assert(snapshotRows(tableDir) === expectedState(b1 ++ b2))
    v1.count() // the superseded version is still readable (reader safety)
  }

  test("time travel: snapshotAt reads each committed version; vacuum keeps the pointer's version") {
    val base = java.nio.file.Files.createTempDirectory("graft-smerge-tt").toFile.getAbsolutePath
    val tableDir = s"$base/table"
    val b0 = Seq(Change("u", 1, "a", 1.0, 1), Change("u", 2, "b", 2.0, 2))
    val b1 = Seq(Change("u", 1, "a2", 1.5, 3))
    val b2 = Seq(Change("d", 2, "", 0.0, 4), Change("u", 3, "c", 3.0, 5))
    Seq(b0, b1, b2).zipWithIndex.foreach { case (b, i) =>
      StreamingMerge.applyBatch(spark, b.toDF(), "id", "seq", tableDir, batchId = i)
    }
    assert(StreamingMerge.listVersions(tableDir) === Seq(0L, 1L, 2L))

    def rowsAt(v: Long): Set[(Long, String, Double)] =
      StreamingMerge.snapshotAt(spark, tableDir, v)
        .select("id", "name", "amount").as[(Long, String, Double)].collect().toSet
    assert(rowsAt(0) === expectedState(b0))
    assert(rowsAt(1) === expectedState(b0 ++ b1))
    assert(rowsAt(2) === expectedState(b0 ++ b1 ++ b2))
    assert(rowsAt(2) === snapshotRows(tableDir), "latest == highest version")

    // vacuum to the newest version only: v0/v1 go, the pointer target stays
    assert(StreamingMerge.vacuum(tableDir, keepLast = 1) === Seq(0L, 1L))
    assert(StreamingMerge.listVersions(tableDir) === Seq(2L))
    assert(snapshotRows(tableDir) === expectedState(b0 ++ b1 ++ b2))
    intercept[IllegalArgumentException] { StreamingMerge.snapshotAt(spark, tableDir, 0L) }
    // idempotent: nothing left to reclaim
    assert(StreamingMerge.vacuum(tableDir, keepLast = 1).isEmpty)
  }

  test("vacuum never deletes the version _latest points at, even if newer dirs exist") {
    val base = java.nio.file.Files.createTempDirectory("graft-smerge-vp").toFile.getAbsolutePath
    val tableDir = s"$base/table"
    val b0 = Seq(Change("u", 1, "a", 1.0, 1))
    StreamingMerge.applyBatch(spark, b0.toDF(), "id", "seq", tableDir, batchId = 0)
    // simulate a committed-but-unpointed newer version (crash between
    // parquet commit and pointer move): dir + _SUCCESS exist, pointer at v=0
    val stray = new java.io.File(tableDir, "v=5"); stray.mkdirs()
    b0.toDF().write.mode("overwrite").parquet(stray.getAbsolutePath)
    val ptr = new String(java.nio.file.Files.readAllBytes(
      new java.io.File(tableDir, "_latest").toPath)).trim
    assert(ptr === "v=0")
    // keepLast=1 would keep only v=5 (newest) — but v=0 is pinned by the pointer
    val deleted = StreamingMerge.vacuum(tableDir, keepLast = 1)
    assert(!deleted.contains(0L))
    assert(StreamingMerge.listVersions(tableDir).contains(0L))
    assert(snapshotRows(tableDir) === expectedState(b0), "reader state intact")
  }
}
