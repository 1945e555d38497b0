package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class PartitionedMergeSpec extends AnyFunSuite with SparkSpec {

  private def mkTable(dir: String): Unit = {
    import spark.implicits._
    val rows = (1L to 90L).map(i => (i, s"m${i % 3}", s"v$i"))
    rows.toDF("k", "part", "payload")
      .repartition(col("part"))
      .write.mode("overwrite").partitionBy("part").parquet(dir)
  }

  private def fileSet(dir: String): Set[String] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
      else Seq(f)
    walk(new java.io.File(dir))
      .filter(_.getName.endsWith(".parquet"))
      .map(f => s"${f.getPath}@${f.lastModified}").toSet
  }

  private def asMap(df: DataFrame): Map[Long, (String, String)] =
    df.collect().map(r => r.getAs[Long]("k") ->
      ((r.getAs[String]("part"), r.getAs[String]("payload")))).toMap

  test("only touched partitions rewrite; result equals a full-table upsert") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-pmerge")
      .toFile.getAbsolutePath + "/t"
    mkTable(dir)
    val before = asMap(spark.read.parquet(dir))
    val untouchedFiles = fileSet(s"$dir/part=m2")

    // delta touches m0 (update k=3, insert k=900) and m1 (update k=4)
    val delta = Seq((3L, "m0", "V3"), (900L, "m0", "V900"), (4L, "m1", "V4"))
      .toDF("k", "part", "payload")
    val touched = PartitionedMerge.upsertPartitions(spark, dir, delta, "k", "part")
    assert(touched === Seq("m0", "m1"))

    val after = asMap(spark.read.parquet(dir))
    val expected = before ++ Map(
      3L -> (("m0", "V3")), 900L -> (("m0", "V900")), 4L -> (("m1", "V4")))
    assert(after === expected)
    // the untouched partition's files are byte-for-byte the ones written
    // at table creation — never rewritten, never touched
    assert(fileSet(s"$dir/part=m2") === untouchedFiles)
  }

  test("expirePartitions drops only aged-out directories, no data pass") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-pexp")
      .toFile.getAbsolutePath + "/t"
    val rows = Seq((1L, "2024-01", "a"), (2L, "2024-02", "b"),
      (3L, "2024-03", "c"), (4L, "2024-03", "d"))
    rows.toDF("k", "month", "payload")
      .repartition(col("month"))
      .write.mode("overwrite").partitionBy("month").parquet(dir)
    val survivorFiles = fileSet(s"$dir/month=2024-03")

    val dropped = PartitionedMerge.expirePartitions(dir, "month", "2024-03")
    assert(dropped === Seq("2024-01", "2024-02"))
    assert(!new java.io.File(s"$dir/month=2024-01").exists())
    // survivors byte-identical — expiry never touches live partitions
    assert(fileSet(s"$dir/month=2024-03") === survivorFiles)
    val left = spark.read.parquet(dir).select("k").as[Long].collect().toSet
    assert(left === Set(3L, 4L))
    // idempotent
    assert(PartitionedMerge.expirePartitions(dir, "month", "2024-03").isEmpty)
  }

  test("base scan prunes to the touched partitions (pushed partition filter)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-pmerge2")
      .toFile.getAbsolutePath + "/t"
    mkTable(dir)
    // the plan PartitionedMerge builds internally: base filtered by the
    // touched set must read 1/3 of the files
    val base = spark.read.parquet(dir).filter(col("part") === "m1")
    val scanned = base.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString
    base.count()
    assert(scanned.contains("PartitionFilters") && scanned.contains("m1"), scanned)
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    PartitionedMerge.upsertPartitions(spark, dir,
      Seq((5L, "m1", "X")).toDF("k", "part", "payload"), "k", "part")
    // conf restored
    assert(spark.conf.getOption("spark.sql.sources.partitionOverwriteMode") === prev)
    assert(asMap(spark.read.parquet(dir))(5L) === (("m1", "X")))
  }
}
