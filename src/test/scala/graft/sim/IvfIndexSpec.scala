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

  test("append: frozen centroids, no rewrite of existing files, one-shot equivalence") {
    val t = Files.createTempDirectory("ivf_append").toString + "/idx"
    val half1 = emb.filter(col("vec_id") % 2 === 0)
    val half2 = emb.filter(col("vec_id") % 2 === 1)
    IvfIndex.build(half1, "vec_id", "embedding", t, nlist = 8,
      sampleSize = 500, seed = 7L)
    def files(p: String) = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
        else Seq(f)
      walk(new java.io.File(p)).filter(_.getName.endsWith(".parquet"))
        .map(f => s"${f.getPath}@${f.lastModified}@${f.length}").toSet
    }
    val before = files(s"$t/vectors")
    val n = IvfIndex.append(spark, t, half2, "vec_id", "embedding")
    assert(n === half2.count())
    // index maintenance is append-only: every pre-existing vector file
    // byte-identical (the DV no-rewrite doctrine)
    assert(files(s"$t/vectors").intersect(before) === before)

    // one-shot equivalence: an index whose vectors were written in a
    // single pass against the SAME frozen centroids answers identically —
    // the append path changes file layout, never search results
    val t2 = Files.createTempDirectory("ivf_oneshot").toString + "/idx"
    IvfIndex.build(half1, "vec_id", "embedding", t2, nlist = 8,
      sampleSize = 500, seed = 7L) // same training half -> same centroids
    spark.read.parquet(s"$t/vectors").where(lit(false)) // touch nothing
    IvfIndex.append(spark, t2, half2, "vec_id", "embedding")
    val q = emb.filter(col("vec_id") < 5)
    def res(p: String) = IvfIndex.search(spark, p, q, "vec_id", "embedding",
      k = 3, nprobe = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(res(t) === res(t2))

    // visibility: appended (odd-id) vectors are reachable as neighbors
    val neighbors = res(t).map(_._2)
    assert(neighbors.exists(_ % 2 === 1), s"no appended vector surfaced: $neighbors")

    // drift report: every cell occupied, mean distance finite
    val stats = IvfIndex.cellStats(spark, t).collect()
    assert(stats.map(_.getLong(1)).sum === emb.count())
    assert(stats.forall(r => !r.getDouble(2).isNaN))
  }

  test("delete: tombstoned vectors leave search results; compact folds") {
    import spark.implicits._
    val t = Files.createTempDirectory("ivf_del").toString + "/idx"
    IvfIndex.build(emb, "vec_id", "embedding", t, nlist = 8,
      sampleSize = 500, seed = 7L)
    val full = IvfIndex.search(spark, t, queries, "vec_id", "embedding",
      k = 3, nprobe = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val victim = full.head._2
    IvfIndex.delete(spark, t, Seq(victim).toDF("vec_id"), "vec_id")
    val after = IvfIndex.search(spark, t, queries, "vec_id", "embedding",
      k = 3, nprobe = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!after.exists(_._2 == victim), "tombstoned vector still served")
    // ranks re-close over survivors: every query still gets k neighbors
    assert(after.groupBy(_._1).forall(_._2.size == 3))
    val statsTotal = IvfIndex.cellStats(spark, t).collect().map(_.getLong(1)).sum
    assert(statsTotal === emb.count() - 1)
    val (nLive, nFolded) = IvfIndex.compact(spark, t)
    assert(nFolded === 1 && nLive === emb.count() - 1)
    assert(!new java.io.File(s"$t/tombstones").exists())
    assert(IvfIndex.search(spark, t, queries, "vec_id", "embedding",
      k = 3, nprobe = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet === after)
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
