package graft.ops

import org.apache.spark.sql.DataFrame

/** P12 — compact debug pretty-printer (reference: code/src/utilities.py:6-33):
  * first `n` rows with only the first/last `k` columns, driver-side
  * formatting over a bounded `take` (never a full collect).
  */
object Display {

  def compactString(df: DataFrame, n: Int = 5, k: Int = 3): String = {
    val cols = df.columns
    val (shown, elided) =
      if (cols.length <= 2 * k) (cols.toSeq, false)
      else (cols.take(k).toSeq ++ cols.takeRight(k), true)
    val header =
      if (elided) (cols.take(k) ++ Array("...") ++ cols.takeRight(k)).mkString(" | ")
      else shown.mkString(" | ")
    val idxs = shown.map(c => cols.indexOf(c))
    val rows = df.take(n).map { r =>
      val vals = idxs.map(i => String.valueOf(r.get(i)))
      if (elided) (vals.take(k) ++ Seq("...") ++ vals.takeRight(k)).mkString(" | ")
      else vals.mkString(" | ")
    }
    (header +: rows).mkString("\n")
  }

  def compactShow(df: DataFrame, n: Int = 5, k: Int = 3): Unit =
    println(compactString(df, n, k))
}
