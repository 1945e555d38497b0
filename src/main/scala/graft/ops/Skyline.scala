package graft.ops

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions.col

/** Skyline (Pareto frontier): rows no other row dominates, where
  * domination = ≤ on every `dims` column and < on at least one — the
  * multi-criteria shortlist query ("cheapest AND smallest" with no scalar
  * weighting). All dims minimize; negate a column upstream to maximize.
  *
  * Scale shape: dominance is global, but skyline distributes because the
  * operator is idempotent and union-compatible — skyline(A ∪ B) =
  * skyline(skyline(A) ∪ skyline(B)). So: one local O(n·s) pass per
  * partition (s = running frontier size), then one final pass over the
  * unioned survivors in a single task. The data-scale work is all in the
  * first pass; the funnel sees only per-partition frontiers, which for
  * correlated dims are tiny (anti-correlated dims grow the frontier —
  * that is a property of the ANSWER, not the algorithm; no operator
  * returns a small skyline when the true one is large). The output is a
  * set, invariant to partitioning and row order.
  */
object Skyline {

  /** Frontier rows of `df`, all `dims` minimized, full rows preserved.
    * Ties equal on every dim dominate nothing and all survive.
    */
  def skyline(df: DataFrame, dims: Seq[String]): DataFrame = {
    require(dims.nonEmpty, "at least one dimension")
    val schema = df.schema
    // a standalone function value so the task closure carries ONLY the
    // dim indices — a local def here would capture the enclosing frame
    // (df, encoder) and fail serialization
    val pass = passFn(dims.map(schema.fieldIndex).toArray)
    val enc = Encoders.row(schema)
    // a NULL dimension has no place on a ≤/< frontier (and would NPE the
    // kernel); dominance over incomparable rows is undefined, so they are
    // excluded rather than silently coerced
    // repartition(1), NOT coalesce(1): coalesce is a narrow dependency,
    // so it would collapse scan + local pass + final pass into ONE task
    // and the "distributed local pass" claim above would be false. The
    // exchange here ships only the per-partition frontiers — tiny — while
    // the data-scale first pass keeps the scan's parallelism.
    df.filter(dims.map(col(_).isNotNull).reduce(_ && _))
      .mapPartitions(pass)(enc)
      .repartition(1)
      .mapPartitions(pass)(enc)
  }

  private def passFn(idx: Array[Int]): Iterator[Row] => Iterator[Row] =
    it => localSkyline(it, idx)

  /** a dominates b: ≤ everywhere, < somewhere. */
  private def dominates(a: Array[Double], b: Array[Double]): Boolean = {
    var strict = false; var i = 0
    while (i < a.length) {
      if (a(i) > b(i)) return false
      if (a(i) < b(i)) strict = true
      i += 1
    }
    strict
  }

  private def localSkyline(it: Iterator[Row], idx: Array[Int]): Iterator[Row] = {
    val sky = ArrayBuffer.empty[(Array[Double], Row)]
    it.foreach { r =>
      val v = idx.map(i => r.getAs[Number](i).doubleValue())
      if (!sky.exists { case (s, _) => dominates(s, v) }) {
        // the newcomer survives; evict anything it dominates
        var i = 0
        while (i < sky.length) {
          if (dominates(v, sky(i)._1)) sky.remove(i) else i += 1
        }
        sky += ((v, r))
      }
    }
    sky.iterator.map(_._2)
  }
}
