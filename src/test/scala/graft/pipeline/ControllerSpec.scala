package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** E2E sweep on the in-repo ECG5000 train file (500 rows, 5 classes) —
  * the parity harness shape of reference controller_loop.py, shrunk for CI.
  * Accuracy assertions are bands, not exact values (SURVEY §7 hard part (c)).
  */
class ControllerSpec extends AnyFunSuite with SparkSpec {

  test("sweep over ECG5000_TRAIN: both strategies beat majority-class baseline") {
    assume(graft.TestData.ecg5000Available, "reference ECG5000 checkout absent")
    val out = java.nio.file.Files.createTempDirectory("sweep").toString
    val cfg = SweepConfig(
      dataPath = graft.TestData.ecg5000Path,
      tsv = true,
      minIterations = 2,
      localMaxPartitions = 3,
      globalMaxPartitions = 2,
      nSplitters = 3,
      maxDepth = 6,
      poolNames = Seq("euclidean"),
      reportsDir = Some(out),
      modelsDir = Some(out),
      plotsDir = Some(out))
    val results = Controller.run(spark, cfg)
    assert(results.map(_.modelKind).distinct.sorted === Seq("global", "local"))
    // ECG5000 is ~58% majority class; a working distance tree should clear it
    results.foreach { r =>
      assert(r.report.performance.accuracy > 0.6,
        s"${r.modelKind}@${r.iteration}: ${r.report.performance.accuracy}")
      assert(r.report.performance.balancedAccuracy > 0.25)
    }
    // sinks exist and parse
    val local = new java.io.File(s"$out/report_local_ALL.json")
    val global = new java.io.File(s"$out/report_global_ALL.json")
    assert(local.exists() && global.exists())
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(local)
    assert(node.get("2").get("performance").get("accuracy").asDouble() > 0.6)
    assert(new java.io.File(s"$out/local_forest_2.json").exists())
    assert(new java.io.File(s"$out/global_tree_2.json").exists())
    // E9: both figures rendered per iteration, and they parse as XML
    Seq("local_2", "global_2").foreach { it =>
      Seq("confusion_matrix.svg", "class_metrics.svg").foreach { f =>
        val svg = new java.io.File(s"$out/$it/$f")
        assert(svg.exists() && svg.length() > 200, s"missing plot $it/$f")
        javax.xml.parsers.DocumentBuilderFactory.newInstance()
          .newDocumentBuilder().parse(svg)
      }
    }
  }
}
