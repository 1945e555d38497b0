package graft.eval

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Weighted Gini as a typed single-pass Aggregator (SURVEY §4's "optional
  * nicety"): input (branch, class) pairs; one partial map per partition,
  * merged on the driver side of the final shuffle; finish computes
  * Σ (n_b/N)·(1 − Σ p²) in one job — versus the two-aggregation + join
  * chain of [[Metrics.weightedGiniDF]]. Same value, fewer shuffles; the
  * buffer is bounded by |branches| × |classes|, not rows.
  */
class WeightedGiniAggregator
    extends Aggregator[(String, String), mutable.Map[(String, String), Long], Double] {

  override def zero: mutable.Map[(String, String), Long] = mutable.Map.empty

  override def reduce(
      b: mutable.Map[(String, String), Long],
      a: (String, String)): mutable.Map[(String, String), Long] = {
    b(a) = b.getOrElse(a, 0L) + 1L
    b
  }

  override def merge(
      b1: mutable.Map[(String, String), Long],
      b2: mutable.Map[(String, String), Long]): mutable.Map[(String, String), Long] = {
    b2.foreach { case (k, v) => b1(k) = b1.getOrElse(k, 0L) + v }
    b1
  }

  override def finish(counts: mutable.Map[(String, String), Long]): Double = {
    if (counts.isEmpty) return 0.0
    val total = counts.values.sum.toDouble
    counts.groupBy(_._1._1).map { case (_, byClass) =>
      val branchTotal = byClass.values.sum.toDouble
      val gini = 1.0 - byClass.values.map { c =>
        val p = c / branchTotal; p * p
      }.sum
      (branchTotal / total) * gini
    }.sum
  }

  override def bufferEncoder: Encoder[mutable.Map[(String, String), Long]] =
    Encoders.kryo[mutable.Map[(String, String), Long]]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
