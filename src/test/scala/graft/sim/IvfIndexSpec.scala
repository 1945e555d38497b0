package graft.sim

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The persistent index must (1) lay out hive cell directories,
  * (2) reproduce the inline ivfTopK results exactly for the same
  * training parameters, and (3) prune unprobed cell partitions at scan
  * time — the property that makes it a lookup instead of a scan.
  */
class IvfIndexSpec extends AnyFunSuite with SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private lazy val emb = graft.ops.Tables.embeddings(spark, d)
  private lazy val dir = {
    val t = Files.createTempDirectory("ivf_index").toString + "/idx"
    IvfIndex.build(emb, "vec_id", "embedding", t, nlist = 8,
      sampleSize = 500, seed = 7L)
    t
  }

  private def queries = emb.filter(col("vec_id") < 5)

  test("build writes hive cell layout + centroids parquet") {
    val cells = new java.io.File(s"$dir/vectors").listFiles()
      .filter(_.getName.startsWith("cell="))
    assert(cells.length > 1, "expected multiple cell partitions")
    assert(IvfIndex.loadCentroids(spark, dir).size === 8)
  }

  test("search from the stored index equals inline ivfTopK") {
    val fromIndex = IvfIndex.search(spark, dir, queries,
      "vec_id", "embedding", k = 3, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val inline = Knn.ivfTopK(queries, emb, "vec_id", "embedding", k = 3,
      nlist = 8, nprobe = 2, sampleSize = 500, seed = 7L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(fromIndex === inline)
  }

  test("probe scan prunes unprobed cell partitions") {
    // a single-cell filter stands in for one probe: the scan must carry
    // it as a PartitionFilter, not a post-scan predicate
    val one = spark.read.parquet(s"$dir/vectors").filter(col("cell") === 0)
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("cell"), s"no partition pruning in:\n$plan")
    // and the executed search touches only nprobe cells' rows per query:
    // every returned neighbor must live in one of the query's probed cells
    val indexed = spark.read.parquet(s"$dir/vectors")
      .select(col("vec_id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val res = IvfIndex.search(spark, dir, queries,
      "vec_id", "embedding", k = 3, nprobe = 1).collect()
    // nprobe=1: all neighbors of a query share ONE cell
    val byQuery = res.groupBy(_.getLong(0))
    byQuery.foreach { case (_, rows) =>
      assert(rows.map(r => indexed(r.getLong(1))).toSet.size === 1)
    }
  }
}
