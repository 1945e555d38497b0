package graft.quality

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Planted-violation doctrine: every check must COUNT the poison it claims
  * to catch, on frames where the expected number is known by construction.
  */
class DataQualitySpec extends AnyFunSuite with SparkSpec {

  private lazy val dirty = {
    import spark.implicits._
    // 6 rows: duplicate key (1,1)×2, a null key, an out-of-range value,
    // a null name, a bad category
    Seq(
      (Some(1L), Some(1), 5.0, Some("a"), "en"),
      (Some(1L), Some(1), 6.0, Some("b"), "en"),
      (Some(2L), Some(1), -1.0, Some("c"), "xx"),
      (Some(3L), Some(2), 7.0, None, "de"),
      (None, Some(1), 8.0, Some("e"), "en"),
      (Some(4L), Some(1), 9.0, Some("f"), "de"))
      .toDF("k1", "k2", "v", "name", "cat")
  }

  test("checkUnique counts surplus rows per duplicate key tuple") {
    val r = DataQuality.checkUnique("u", dirty.filter(col("k1").isNotNull),
      Seq("k1", "k2")).head
    // 5 non-null-key rows, 4 distinct tuples → 1 violation
    assert(r.getAs[Long]("n_checked") === 5L)
    assert(r.getAs[Long]("violations") === 1L)
  }

  test("checkForeignKey counts orphans including null child keys") {
    import spark.implicits._
    val parent = Seq(1L, 2L).toDF("pk")
    val r = DataQuality.checkForeignKey("fk", dirty, "k1", parent, "pk").head
    // orphans: k1=3, k1=4, k1=null → 3 of 6
    assert(r.getAs[Long]("n_checked") === 6L)
    assert(r.getAs[Long]("violations") === 3L)
  }

  test("range / nonNull / accepted checks count exactly the planted poison") {
    val range = DataQuality.checkRange("r", dirty, "v", 0.0, 10.0).head
    assert(range.getAs[Long]("violations") === 1L) // v = -1.0
    val nn = DataQuality.checkNonNull("n", dirty, "name").head
    assert(nn.getAs[Long]("violations") === 1L)
    val acc = DataQuality.checkAccepted("a", dirty, "cat", Seq("en", "de")).head
    assert(acc.getAs[Long]("violations") === 1L) // cat = xx
  }

  test("report unions checks with a pass flag") {
    val rep = DataQuality.report(Seq(
      DataQuality.checkNonNull("nn_name", dirty, "name"),
      DataQuality.checkNonNull("nn_cat", dirty, "cat"))).collect()
    assert(rep.length === 2)
    val byName = rep.map(r => r.getAs[String]("check_name") ->
      r.getAs[Boolean]("pass")).toMap
    assert(byName("nn_name") === false)
    assert(byName("nn_cat") === true)
  }

  test("numeric profile: one row per column, stats exact on a known frame") {
    import spark.implicits._
    val df = Seq(
      (Some(1.0), 10.0), (Some(2.0), 20.0), (None, 30.0), (Some(2.0), 40.0))
      .toDF("a", "b")
    val prof = DataQuality.profileNumeric(df, Seq("a", "b")).collect()
      .map(r => r.getAs[String]("col_name") -> r).toMap
    val a = prof("a")
    assert(a.getAs[Long]("n") === 4L)
    assert(a.getAs[Long]("n_null") === 1L)
    assert(a.getAs[Long]("ndv") === 2L)
    assert(a.getAs[Double]("min_num") === 1.0)
    assert(a.getAs[Double]("max_num") === 2.0)
    assert(math.abs(a.getAs[Double]("avg_num") - 5.0 / 3) < 1e-6)
    assert(a.getAs[Double]("null_frac") === 0.25)
    val b = prof("b")
    assert(b.getAs[Long]("ndv") === 4L)
    assert(b.getAs[Double]("avg_num") === 25.0)
  }

  test("string profile: lengths and ndv exact on a known frame") {
    import spark.implicits._
    val df = Seq(Some("ab"), Some("abcd"), None, Some("ab"))
      .toDF("s")
    val r = DataQuality.profileStrings(df, Seq("s")).head
    assert(r.getAs[Long]("n") === 4L)
    assert(r.getAs[Long]("n_null") === 1L)
    assert(r.getAs[Long]("ndv") === 2L)
    assert(r.getAs[Long]("min_len") === 2L)
    assert(r.getAs[Long]("max_len") === 4L)
    assert(math.abs(r.getAs[Double]("avg_len") - 8.0 / 3) < 1e-6)
  }

  test("checkFunctionalDependency counts determinants with mixed dependents") {
    import spark.implicits._
    val df = Seq((1L, "a"), (1L, "a"), (2L, "a"), (2L, "b"), (3L, "c"))
      .toDF("det", "dep")
    val r = DataQuality.checkFunctionalDependency("fd", df, Seq("det"), "dep").head
    assert(r.getAs[Long]("n_checked") === 3L) // distinct determinants
    assert(r.getAs[Long]("violations") === 1L) // only det=2 is mixed
  }

  test("checkOutliers counts exactly the planted 3-sigma spikes") {
    import spark.implicits._
    // 100 values at 0 with one extreme spike: sigma ≈ spike/10, so only
    // the spike itself exceeds 3σ
    val df = (Seq.fill(100)(0.0) ++ Seq(1000.0) ++ Seq.fill(2)(Double.NaN).map(_ => 0.0))
      .toDF("v")
    val r = DataQuality.checkOutliers("o", df, "v").head
    assert(r.getAs[Long]("n_checked") === 103L)
    assert(r.getAs[Long]("violations") === 1L)
  }

  test("histogram: clamping, null drop, edge values land in edge buckets") {
    import spark.implicits._
    val df = Seq(Some(-5.0), Some(0.0), Some(4.9), Some(5.0), Some(9.9),
      Some(10.0), Some(25.0), None).toDF("v")
    val h = DataQuality.histogram(df, "v", buckets = 2, lo = 0.0, hi = 10.0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // bucket 0 = [0,5): -5(clamp), 0, 4.9 → 3; bucket 1 = [5,10]: 5, 9.9,
    // 10(edge), 25(clamp) → 4; null dropped
    assert(h === Map(0L -> 3L, 1L -> 4L))
  }

  test("numeric profile degrades on an all-null column: ndv 0, null stats, no throw") {
    import spark.implicits._
    val df = Seq.fill(3)(Option.empty[Double]).toDF("a")
    val r = DataQuality.profileNumeric(df, Seq("a")).head
    assert(r.getAs[Long]("n") === 3L)
    assert(r.getAs[Long]("n_null") === 3L)
    assert(r.getAs[Double]("null_frac") === 1.0)
    assert(r.getAs[Long]("ndv") === 0L)
    assert(r.isNullAt(r.fieldIndex("min_num")))
    assert(r.isNullAt(r.fieldIndex("max_num")))
    assert(r.isNullAt(r.fieldIndex("avg_num"))) // 0-count division → null, not NaN
  }

  test("checkOutliers degrades on constant and empty columns") {
    import spark.implicits._
    val const = Seq(5.0, 5.0, 5.0).toDF("v")
    val rc = DataQuality.checkOutliers("c", const, "v").head
    assert(rc.getAs[Long]("violations") === 0L) // sigma 0: |v-mean|=0 > 0 false
    val empty = Seq.empty[Double].toDF("v")
    val re = DataQuality.checkOutliers("e", empty, "v").head
    assert(re.getAs[Long]("n_checked") === 0L)
    assert(re.getAs[Long]("violations") === 0L)
  }

  test("reconcile classifies every status, exact on sums") {
    import spark.implicits._
    val a = Seq(("g1", 1.0), ("g1", 2.0), ("g2", 5.0), ("g3", 7.0),
      ("g4", 9.0)).toDF("k", "v")
    val b = Seq(("g1", 1.0), ("g1", 2.0),              // ok
      ("g2", 5.0), ("g2", 0.0),                        // count_mismatch
      ("g3", 7.5),                                     // value_mismatch
      ("g5", 4.0)                                      // missing_left; g4 missing_right
    ).toDF("k", "v")
    val out = DataQuality.reconcile(a, b, Seq("k"), "v").collect()
      .map(r => r.getString(0) -> r.getString(5)).toMap
    assert(out === Map("g1" -> "ok", "g2" -> "count_mismatch",
      "g3" -> "value_mismatch", "g4" -> "missing_right", "g5" -> "missing_left"))
  }

  test("profilers are one aggregate pass (no per-column scan fan-out)") {
    val plan = DataQuality.profileNumeric(
      graft.ops.Tables.lineitem(spark, "/root/testdata/sf0.001"),
      Seq("l_quantity", "l_extendedprice")).queryExecution.executedPlan.toString
    // exact multi-distinct plans via Expand; the point is ONE scan
    val scans = "FileScan parquet".r.findAllIn(plan).length +
      "BatchScan".r.findAllIn(plan).length
    assert(scans === 1, s"expected a single scan, got $scans:\n$plan")
  }
}
