package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import DedupStreams.{Admission, AdmissionTtl, FpDoc, FpDocTs}

class DedupStreamsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._
  implicit private lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val d = "/root/testdata/sf0.001"

  test("batch mode equals exactGroups over the fixture corpus") {
    val docs = graft.ops.Tables.documents(spark, d)
    val fpDocs = docs.select(
      graft.text.TextFunctions.fingerprint(col("text")).as("fp"),
      col("doc_id")).as[FpDoc]
    val stateful = DedupStreams.admitFirst(spark, fpDocs)
      .collect().map(a => (a.fp, a.keep_id, a.dup_cnt)).toSet
    val declarative = graft.dedup.Dedup.exactGroups(docs, "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(stateful === declarative)
  }

  test("cross-trigger state: a later copy is rejected, accounting cumulative") {
    val stream = MemoryStream[FpDoc]
    val q = DedupStreams.admitFirst(spark, stream.toDS())
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Update).start()
    try {
      stream.addData(FpDoc("aaa", 10), FpDoc("aaa", 12), FpDoc("bbb", 11))
      q.processAllAvailable()
      val t1 = spark.table("dedup_out").as[Admission].collect().toSet
      assert(t1 === Set(Admission("aaa", 10, 2), Admission("bbb", 11, 1)))

      // trigger 2: another copy of aaa with a SMALLER id — the original
      // admission stands (first arrival wins, not global min), count grows
      stream.addData(FpDoc("aaa", 3), FpDoc("ccc", 20))
      q.processAllAvailable()
      val t2 = spark.table("dedup_out").as[Admission].collect()
      val aaaRows = t2.filter(_.fp == "aaa").sortBy(_.dup_cnt)
      assert(aaaRows.map(a => (a.keep_id, a.dup_cnt)).toSeq ===
        Seq((10L, 2L), (10L, 3L)))
      assert(t2.count(_.fp == "ccc") === 1)
    } finally q.stop()
  }

  test("event-time TTL: idle state expires on the data clock and readmits") {
    def ts(h: Int): Timestamp = Timestamp.valueOf(f"2026-01-01 $h%02d:00:00")
    val stream = MemoryStream[FpDocTs]
    val q = DedupStreams.admitFirstEventTime(spark, stream.toDS(),
      idleTtlMinutes = 60, watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("dedup_ttl_out")
      .outputMode(OutputMode.Update).start()
    try {
      stream.addData(FpDocTs("aaa", 10, ts(1)), FpDocTs("bbb", 11, ts(1)))
      q.processAllAvailable()
      // advance the watermark far past aaa/bbb's TTL; cc arrives fresh
      stream.addData(FpDocTs("ccc", 12, ts(5)))
      q.processAllAvailable()
      // expired rows emitted with final accounting
      val expired = spark.table("dedup_ttl_out").as[AdmissionTtl]
        .collect().filter(_.expired).map(a => (a.fp, a.keep_id, a.dup_cnt)).toSet
      assert(expired === Set(("aaa", 10L, 1L), ("bbb", 11L, 1L)))

      // the SAME content arriving after expiry is admitted as new
      stream.addData(FpDocTs("aaa", 99, ts(6)))
      q.processAllAvailable()
      val readmitted = spark.table("dedup_ttl_out").as[AdmissionTtl]
        .collect().filter(a => a.fp == "aaa" && !a.expired)
      assert(readmitted.map(a => (a.keep_id, a.dup_cnt)).toSet
        .contains((99L, 1L)), readmitted.mkString(","))
    } finally q.stop()
  }
}
