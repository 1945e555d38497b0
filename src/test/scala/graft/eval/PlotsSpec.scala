package graft.eval

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** E9 is machine-checked, not eyeballed: the SVGs parse as XML and
  * their data attributes pin cell shading, annotations, bar heights,
  * and legend structure to the evaluation numbers. The end-to-end test
  * feeds a real [[Evaluation.classWise]] result through, the way the
  * reference controller calls its two plot functions after evaluation.
  */
class PlotsSpec extends AnyFunSuite with SparkSpec {

  private def parse(svg: String): org.w3c.dom.Document = {
    val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    f.newDocumentBuilder().parse(
      new java.io.ByteArrayInputStream(
        svg.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
  }

  private def elems(d: org.w3c.dom.Document, tag: String) = {
    val n = d.getElementsByTagName(tag)
    (0 until n.getLength).map(n.item(_).asInstanceOf[org.w3c.dom.Element])
  }

  test("confusion matrix: one annotated cell per pair, max cell darkest, " +
      "white annotation on dark cells, axis labels present") {
    val cm = Array(
      Array(50.0, 2.0, 0.0),
      Array(3.0, 40.0, 1.0),
      Array(0.0, 4.0, 30.0))
    val svg = Plots.confusionMatrixSvg(cm, Seq("a", "b", "c"))
    val doc = parse(svg)
    val cells = elems(doc, "rect").filter(_.getAttribute("class") == "cm-cell")
    assert(cells.size === 9)
    // every count annotated with the right value at the right pair
    for (i <- 0 until 3; j <- 0 until 3) {
      val c = cells.find(e =>
        e.getAttribute("data-actual") == Seq("a", "b", "c")(i) &&
          e.getAttribute("data-predicted") == Seq("a", "b", "c")(j)).get
      assert(c.getAttribute("data-count") === cm(i)(j).round.toString)
    }
    // the max cell (50) carries the ramp's dark end; a zero cell the light
    def fill(i: Int, j: Int) = cells.find(e =>
      e.getAttribute("data-actual") == Seq("a", "b", "c")(i) &&
        e.getAttribute("data-predicted") == Seq("a", "b", "c")(j)).get
      .getAttribute("fill")
    assert(fill(0, 0) === "rgb(8,48,107)")
    assert(fill(0, 2) === "rgb(247,251,255)")
    val texts = elems(doc, "text").map(_.getTextContent)
    assert(texts.contains("Predicted") && texts.contains("Actual"))
    assert(texts.contains("Confusion Matrix"))
    // legibility flip: the darkest cell's annotation is white
    val whiteTexts = elems(doc, "text")
      .filter(_.getAttribute("fill") == "white").map(_.getTextContent)
    assert(whiteTexts.contains("50"))
  }

  test("class metrics: 3 bars per class with height proportional to " +
      "score, y clipped at 1.1, legend with three series") {
    val ms = Seq(
      Evaluation.ClassMetrics(0.0, 1.0, 0.5, 2.0 / 3.0),
      Evaluation.ClassMetrics(1.0, 0.25, 0.75, 0.375))
    val svg = Plots.classMetricsSvg(ms)
    val doc = parse(svg)
    val bars = elems(doc, "rect").filter(_.getAttribute("class") == "bar")
    assert(bars.size === 6)
    def heightOf(cls: String, metric: String): Double =
      bars.find(b => b.getAttribute("data-class") == cls &&
        b.getAttribute("data-metric") == metric).get
        .getAttribute("height").toDouble
    // precision 1.0 is exactly twice recall 0.5 for class 0
    assert(math.abs(heightOf("Class 0", "precision") -
      2 * heightOf("Class 0", "recall")) < 1e-6)
    // and 4x class 1's precision 0.25
    assert(math.abs(heightOf("Class 0", "precision") -
      4 * heightOf("Class 1", "precision")) < 1e-6)
    val texts = elems(doc, "text").map(_.getTextContent)
    Seq("Precision", "Recall", "F1", "Class", "Score", "Class 0", "Class 1")
      .foreach(t => assert(texts.contains(t), s"missing label $t"))
  }

  test("end to end: classWise output renders and saves both figures") {
    import spark.implicits._
    val pred = Seq(
      (0.0, 0.0), (0.0, 0.0), (0.0, 1.0),
      (1.0, 1.0), (1.0, 1.0), (1.0, 0.0),
      (2.0, 2.0), (2.0, 2.0), (2.0, 2.0)).toDF("label", "prediction")
    val (labels, cm, per) = Evaluation.classWise(pred, "label", "prediction")
    val dir = Files.createTempDirectory("plots").toString
    val written = Plots.writeAll(labels, cm, per, dir)
    assert(written.size === 2)
    written.foreach { p =>
      val f = new java.io.File(p)
      assert(f.exists() && f.length() > 200, s"missing/empty $p")
      // written bytes parse back as XML
      parse(new String(java.nio.file.Files.readAllBytes(f.toPath),
        java.nio.charset.StandardCharsets.UTF_8))
    }
    // diagonal dominance of this fixture shows in the darkest cells
    val doc = parse(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(written.head)),
      java.nio.charset.StandardCharsets.UTF_8))
    val cells = elems(doc, "rect").filter(_.getAttribute("class") == "cm-cell")
    val darkest = cells.maxBy(_.getAttribute("data-count").toLong)
    assert(darkest.getAttribute("data-actual") ===
      darkest.getAttribute("data-predicted"))
  }
}
