package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** `events.parquet`'s `ts` physical type has changed across fixture
  * generations (nanos-as-long → micros-NTZ); the round-11 fixture refresh
  * silently killed all nine events-family queries because the loader
  * assumed one generation. This spec pins the loader contract: whatever
  * the writer produced, `Tables.events` surfaces `ts` as session-zoned
  * TimestampType with the same instant values.
  */
class EventsTsSpec extends AnyFunSuite with SparkSpec {

  test("current fixture: ts loads as TimestampType with rows > 0") {
    val df = Tables.events(spark, "/root/testdata/sf0.001")
    assert(df.schema("ts").dataType === TimestampType,
      df.schema("ts").dataType.toString)
    assert(df.count() > 0)
  }

  test("nanos-as-long generation: long ts is truncated to micros") {
    val dir = java.nio.file.Files.createTempDirectory("graft-events-long")
      .toFile.getAbsolutePath
    // 2021-01-01T00:00:00.123456789Z as nanos since epoch
    val nanos = 1609459200L * 1000000000L + 123456789L
    spark.range(1).select(
      lit(1L).as("event_id"), lit(nanos).as("ts"), lit(7L).as("user_id"),
      lit("click").as("event_type"), lit(1.5).as("value"), lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType === TimestampType)
    val micros = df.select(unix_micros(col("ts"))).head.getLong(0)
    assert(micros === nanos / 1000L, micros.toString)
  }

  test("micros-NTZ generation: instant values survive the NTZ cast") {
    // The fixture itself is NTZ (isAdjustedToUTC=false); with the session
    // timezone pinned to UTC the cast must preserve wall == instant.
    val raw = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    assume(raw.schema("ts").dataType === TimestampNTZType)
    val viaLoader = Tables.events(spark, "/root/testdata/sf0.001")
      .select(min(unix_micros(col("ts")))).head.getLong(0)
    val direct = raw
      .select(min(unix_micros(col("ts").cast(TimestampType)))).head.getLong(0)
    assert(viaLoader === direct)
  }
}
