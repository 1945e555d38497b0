package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Per-group top-k as a bounded AGGREGATE, not a window: row_number()
  * OVER (PARTITION BY g ORDER BY v) sorts and shuffles every row of every
  * group; this keeps a k-element buffer per (group, partition), so the
  * map side combines each partition's contribution down to k rows before
  * the exchange and the shuffle carries k·|groups| rows instead of the
  * corpus. At 100 TB with k=3 that is the difference between a full-data
  * sort-exchange and a metadata-scale one — and it is skew-immune: a
  * celebrity group costs k per upstream partition, never a single
  * reduce-side sort of the whole group. (The catalog's window-lint
  * doctrine exists precisely because WindowExec funnels; this is the
  * aggregate-shaped alternative for the top-k-only case. The window form
  * stays right when you need ALL ranks.)
  *
  * Ordering is (value DESC, id ASC) — the id tiebreak makes the result a
  * deterministic set, bit-replayable by the oracle's row_number SQL.
  */
object TopKAgg {

  private final class TopK(k: Int)
      extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
    private def trim(s: Seq[(Double, Long)]): Seq[(Double, Long)] =
      s.sortBy(t => (-t._1, t._2)).take(k)
    def zero: Seq[(Double, Long)] = Nil
    def reduce(b: Seq[(Double, Long)], v: (Double, Long)): Seq[(Double, Long)] =
      if (b.length == k && (b.last._1 > v._1 ||
        (b.last._1 == v._1 && b.last._2 < v._2))) b // fast reject below the bar
      else trim(b :+ v)
    def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
      trim(a ++ b)
    def finish(b: Seq[(Double, Long)]): Seq[(Double, Long)] = b
    def bufferEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder()
    def outputEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder()
  }

  /** Top-k (valueCol DESC, idCol ASC) rows per group:
    * (groupCols, rank 1-based, id, value). NULL value/id rows are
    * EXCLUDED up front — the primitive tuple encoder would otherwise
    * coerce them to 0.0/0L and silently rank them as real zeros (a
    * window formulation would have sorted them last instead).
    */
  def topK(df: DataFrame, groupCols: Seq[String], idCol: String,
      valueCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val agg = udaf(new TopK(k), ExpressionEncoder[(Double, Long)]())
    df.filter(col(valueCol).isNotNull && col(idCol).isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(agg(col(valueCol).cast("double"),
        col(idCol).cast("long")).as("__top"))
      .select(groupCols.map(col) :+ posexplode(col("__top")).as(Seq("__p", "__t")): _*)
      .select(groupCols.map(col) :+
        (col("__p").cast("long") + 1L).as("rank") :+
        col("__t._2").as(idCol) :+ col("__t._1").as(valueCol): _*)
  }
}
