package graft

import org.scalatest.funsuite.AnyFunSuite

/** Catalog-wide RUNTIME smoke: every driver-contract query must execute
  * end-to-end on the sf0.001 fixture. CatalogPlanLintSpec only builds the
  * plans (analysis-time); the round-11 fixture refresh showed that an
  * analysis- or runtime-time failure in a family of queries can otherwise
  * slip through the suite and surface only as silently-omitted rows in the
  * driver's correctness artifact. One test, all failures reported together.
  */
class CatalogSmokeSpec extends AnyFunSuite with SparkSpec {

  test("every catalog query executes on sf0.001") {
    val d = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$d/lineitem.parquet").exists())
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, d).count(); None }
        catch { case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
        }
    }
    assert(failures.isEmpty, failures.mkString("\n", "\n", ""))
  }
}
