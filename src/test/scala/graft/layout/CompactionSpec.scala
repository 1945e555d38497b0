package graft.layout

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Compaction end-to-end against REAL parquet: many small Z-clustered
  * files → footer-stats gather on executors → sequential plan → rewrite →
  * one file per bin, data intact, Z-order preserved (bins are disjoint
  * curve segments). Plus the exact FFD invariants for the non-clustered
  * path.
  */
class CompactionSpec extends AnyFunSuite with SparkSpec {

  private def smallFilesDir(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toFile.getAbsolutePath
    val li = graft.ops.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    // 32 small files, each one contiguous Z-curve segment
    ZOrder.clusterByZ(li, "l_partkey", "l_suppkey", numPartitions = 32)
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("footer gather + sequential plan: contiguous bins near target, order preserved") {
    val dir = smallFilesDir()
    val boxes = Compaction.parquetFileBoxes(spark, dir, "l_partkey", "l_suppkey")
    assert(boxes.count() === 32)
    val planned = Compaction.planSequential(
      boxes.withColumn("zmin", ZOrder.zkey(col("x_min"), col("y_min"))),
      "size_bytes", Seq(col("zmin"), col("path")), targetBytes = 64 * 1024)
      .orderBy("zmin", "path")
      .select("path", "size_bytes", "zmin", "bin")
      .collect()
    val bins = planned.map(_.getLong(3))
    // bins are contiguous runs of the z-ordering, dense from 0
    assert(bins.head === 0L)
    bins.sliding(2).foreach { case Array(a, b) => assert(a <= b, s"$a then $b") case _ => }
    // every bin's total stays under target + its largest (last-file overrun
    // is the only allowed excess)
    planned.groupBy(_.getLong(3)).foreach { case (_, files) =>
      val total = files.map(_.getLong(1)).sum
      assert(total < 64 * 1024 + files.map(_.getLong(1)).max,
        s"bin overpacked: $total")
    }
    // multiple files actually merge (the point of compaction)
    assert(bins.distinct.length < 32 && bins.distinct.length > 1, bins.mkString(","))
  }

  test("rewriteBins merges each bin to one file; data and Z-segmentation intact") {
    val dir = smallFilesDir()
    val boxes = Compaction.parquetFileBoxes(spark, dir, "l_partkey", "l_suppkey")
    val plan = Compaction.planSequential(
      boxes.withColumn("zmin", ZOrder.zkey(col("x_min"), col("y_min"))),
      "size_bytes", Seq(col("zmin"), col("path")), targetBytes = 64 * 1024)
      .select("path", "bin").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val outDir = java.nio.file.Files.createTempDirectory("graft-compact-out").toFile.getAbsolutePath
    val nBins = Compaction.rewriteBins(spark, plan, outDir, parallelism = 4)
    // one data file per bin
    val outFiles = new java.io.File(outDir).listFiles().filter(_.getName.startsWith("bin="))
      .flatMap(_.listFiles()).filter(_.getName.endsWith(".parquet"))
    assert(outFiles.length === nBins)
    // all rows survive, values intact (checksum on a key expression)
    val before = spark.read.parquet(dir)
    val after = spark.read.parquet(outDir)
    assert(after.count() === before.count())
    def sig(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(sum(col("l_orderkey") * 7 + col("l_partkey") * 3 + col("l_suppkey")))
        .head.getLong(0)
    assert(sig(after) === sig(before))
    // Z-order preserved: compacted bins are DISJOINT curve segments (bin
    // i's max zkey <= bin i+1's min zkey), so footer boxes stay tight
    val ranges = after
      .withColumn("_zk", ZOrder.zkey(col("l_partkey"), col("l_suppkey")))
      .groupBy(col("bin")).agg(min("_zk").as("lo"), max("_zk").as("hi"))
      .orderBy("bin").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi <= lo2, s"overlap: $hi > $lo2")
      case _ =>
    }
  }

  test("firstFitDecreasing: exact invariants on the non-clustered path") {
    val files = (1 to 200).map(i => (f"f$i%03d", ((i * 2654435761L) % 96 + 5) * 1024L))
    val target = 256 * 1024L
    val assign = Compaction.firstFitDecreasing(files, target)
    assert(assign.size === files.size)
    val loads = assign.toSeq.groupBy(_._2).map { case (bin, fs) =>
      bin -> fs.map(f => files.find(_._1 == f._1).get._2).sum
    }
    // no bin over target (no file exceeds target here)
    loads.values.foreach(l => assert(l <= target, s"overfull bin: $l"))
    // bins dense 0..n-1
    assert(loads.keys.toSeq.sorted === (0 until loads.size))
    // packing is tight: within the FFD guarantee of optimal
    val optimal = math.ceil(files.map(_._2).sum.toDouble / target).toInt
    assert(loads.size <= (11 * optimal) / 9 + 1, s"${loads.size} bins vs OPT>=$optimal")
    // deterministic
    assert(assign === Compaction.firstFitDecreasing(files, target))
    // an oversized file sits alone
    val withBig = files :+ ("zzz_big", target * 3)
    val a2 = Compaction.firstFitDecreasing(withBig, target)
    val bigBin = a2("zzz_big")
    assert(a2.count(_._2 == bigBin) === 1, "oversized file must sit alone")
  }
}
