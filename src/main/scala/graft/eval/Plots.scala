package graft.eval

/** E9 — the reference's two evaluation figures
  * (code/src/visualization.py:6 `plot_confusion_matrix`, :41
  * `plot_class_metrics`) re-expressed as dependency-free SVG writers.
  * Previously a declared skip ("JSON feeds external plotting"); closing
  * it costs nothing at scale — both figures render DRIVER-SIZED
  * evaluation artifacts (a confusion matrix is nClasses², per-class
  * metrics are one row per label — never data-scale), so this is pure
  * string building over [[Evaluation.classWise]]'s outputs. SVG instead
  * of PNG: no imaging dependency (this container has none), text stays
  * selectable, and the structure is machine-checkable (PlotsSpec parses
  * the XML back and pins cell shading / bar heights to the data).
  *
  * Faithful to the reference's choices: the matrix uses the 'Blues'
  * ramp with per-cell count annotations ('.0f') and Predicted/Actual
  * axis labels (visualization.py:12-24); the bars are the three
  * precision/recall/f1 series per class, y clipped at 1.1, with a
  * legend (visualization.py:52-68).
  */
object Plots {

  /** matplotlib 'Blues' endpoints, linearly interpolated. */
  private def blues(t: Double): String = {
    val tt = math.max(0.0, math.min(1.0, t))
    def ch(a: Int, b: Int) = math.round(a + (b - a) * tt).toInt
    s"rgb(${ch(247, 8)},${ch(251, 48)},${ch(255, 107)})"
  }

  private def esc(s: String): String = s.flatMap {
    case '<' => "&lt;"
    case '>' => "&gt;"
    case '&' => "&amp;"
    case '"' => "&quot;"
    case c => c.toString
  }

  private def fmt(d: Double): String =
    BigDecimal(d).setScale(2, BigDecimal.RoundingMode.HALF_UP).toString

  /** Confusion-matrix heatmap (`plot_confusion_matrix`): one shaded,
    * annotated cell per (actual, predicted) pair; row = actual label,
    * column = predicted (the mllib confusionMatrix orientation
    * [[Evaluation.classWise]] returns).
    */
  def confusionMatrixSvg(cm: Array[Array[Double]],
      classLabels: Seq[String], title: String = "Confusion Matrix"): String = {
    require(cm.nonEmpty && cm.forall(_.length == cm.length),
      "square matrix required")
    require(classLabels.size == cm.length,
      s"${classLabels.size} labels for ${cm.length} classes")
    val n = cm.length
    val cell = 56
    val left = 90; val top = 50; val bottom = 70
    val w = left + n * cell + 20
    val h = top + n * cell + bottom
    val mx = math.max(cm.map(_.max).max, 1e-12)
    val sb = new StringBuilder
    sb ++= s"""<svg xmlns="http://www.w3.org/2000/svg" width="$w" height="$h" font-family="sans-serif">"""
    sb ++= s"""<text x="${left + n * cell / 2}" y="24" text-anchor="middle" font-size="16">${esc(title)}</text>"""
    for (i <- 0 until n; j <- 0 until n) {
      val v = cm(i)(j)
      val t = v / mx
      val x = left + j * cell; val y = top + i * cell
      sb ++= s"""<rect class="cm-cell" data-actual="${esc(classLabels(i))}" data-predicted="${esc(classLabels(j))}" data-count="${v.round}" x="$x" y="$y" width="$cell" height="$cell" fill="${blues(t)}" stroke="white"/>"""
      // seaborn flips annotation color on dark cells so counts stay legible
      val fg = if (t > 0.55) "white" else "black"
      sb ++= s"""<text x="${x + cell / 2}" y="${y + cell / 2 + 5}" text-anchor="middle" font-size="13" fill="$fg">${v.round}</text>"""
    }
    for (j <- 0 until n)
      sb ++= s"""<text x="${left + j * cell + cell / 2}" y="${top + n * cell + 18}" text-anchor="middle" font-size="12">${esc(classLabels(j))}</text>"""
    for (i <- 0 until n)
      sb ++= s"""<text x="${left - 8}" y="${top + i * cell + cell / 2 + 4}" text-anchor="end" font-size="12">${esc(classLabels(i))}</text>"""
    sb ++= s"""<text x="${left + n * cell / 2}" y="${h - 28}" text-anchor="middle" font-size="13">Predicted</text>"""
    sb ++= s"""<text x="18" y="${top + n * cell / 2}" text-anchor="middle" font-size="13" transform="rotate(-90 18 ${top + n * cell / 2})">Actual</text>"""
    sb ++= "</svg>"
    sb.toString
  }

  /** Per-class grouped bars (`plot_class_metrics`): the three
    * precision/recall/f1 series per class, y axis clipped at 1.1, with
    * a legend. `classNames` overrides the default "Class <label>"
    * tick text (visualization.py:45-46).
    */
  def classMetricsSvg(metrics: Seq[Evaluation.ClassMetrics],
      classNames: Seq[String] = Nil): String = {
    require(metrics.nonEmpty, "no classes to plot")
    val names =
      if (classNames.size == metrics.size) classNames
      else metrics.map(m =>
        "Class " + (if (m.label == m.label.floor) m.label.toLong.toString
                    else m.label.toString))
    val series = Seq(
      ("Precision", "#4878d0", (m: Evaluation.ClassMetrics) => m.precision),
      ("Recall", "#ee854a", (m: Evaluation.ClassMetrics) => m.recall),
      ("F1", "#6acc64", (m: Evaluation.ClassMetrics) => m.f1))
    val bar = 22; val gap = 26
    val group = series.size * bar + gap
    val left = 60; val top = 40; val plotH = 260; val bottom = 60
    val yMax = 1.1
    val w = left + metrics.size * group + 130
    val h = top + plotH + bottom
    def yOf(v: Double) =
      top + plotH - (math.max(0.0, math.min(yMax, v)) / yMax * plotH)
    val sb = new StringBuilder
    sb ++= s"""<svg xmlns="http://www.w3.org/2000/svg" width="$w" height="$h" font-family="sans-serif">"""
    // gridlines + y ticks at 0, 0.25, ..., 1.0
    for (g <- 0 to 4) {
      val v = g * 0.25
      sb ++= s"""<line x1="$left" y1="${yOf(v)}" x2="${left + metrics.size * group}" y2="${yOf(v)}" stroke="#dddddd"/>"""
      sb ++= s"""<text x="${left - 6}" y="${yOf(v) + 4}" text-anchor="end" font-size="11">${fmt(v)}</text>"""
    }
    metrics.zipWithIndex.foreach { case (m, ci) =>
      series.zipWithIndex.foreach { case ((sname, color, f), si) =>
        val v = f(m)
        val x = left + ci * group + si * bar
        sb ++= s"""<rect class="bar" data-class="${esc(names(ci))}" data-metric="${esc(sname.toLowerCase)}" data-value="${fmt(v)}" x="$x" y="${yOf(v)}" width="${bar - 2}" height="${top + plotH - yOf(v)}" fill="$color"/>"""
      }
      sb ++= s"""<text x="${left + ci * group + series.size * bar / 2}" y="${top + plotH + 18}" text-anchor="middle" font-size="12">${esc(names(ci))}</text>"""
    }
    sb ++= s"""<text x="${left + metrics.size * group / 2}" y="${h - 14}" text-anchor="middle" font-size="13">Class</text>"""
    sb ++= s"""<text x="16" y="${top + plotH / 2}" text-anchor="middle" font-size="13" transform="rotate(-90 16 ${top + plotH / 2})">Score</text>"""
    series.zipWithIndex.foreach { case ((sname, color, _), si) =>
      val lx = left + metrics.size * group + 16; val ly = top + si * 22
      sb ++= s"""<rect x="$lx" y="$ly" width="14" height="14" fill="$color"/>"""
      sb ++= s"""<text x="${lx + 20}" y="${ly + 12}" font-size="12">${esc(sname)}</text>"""
    }
    sb ++= "</svg>"
    sb.toString
  }

  /** Save with the reference's semantics (makedirs + write). */
  def save(path: String, svg: String): Unit = {
    val p = java.nio.file.Paths.get(path)
    Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.write(p,
      svg.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ()
  }

  /** The controller's post-evaluation move (controller_loop.py:22 +
    * save_path usage): both figures from one [[Evaluation.classWise]]
    * result into `dir`. Returns the written paths.
    */
  def writeAll(labels: Seq[Double], cm: Array[Array[Double]],
      perClass: Seq[Evaluation.ClassMetrics], dir: String): Seq[String] = {
    val names = labels.map(l =>
      if (l == l.floor) l.toLong.toString else l.toString)
    val cmPath = s"$dir/confusion_matrix.svg"
    val metricsPath = s"$dir/class_metrics.svg"
    save(cmPath, confusionMatrixSvg(cm, names))
    save(metricsPath, classMetricsSvg(perClass, names.map("Class " + _)))
    Seq(cmPath, metricsPath)
  }
}
