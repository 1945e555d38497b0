package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable fixed-bin histogram quantiles — the quantile face of the
  * incremental-statistics family ([[IncrementalStats]] maintains
  * count/null/minmax/NDV; this maintains percentiles): per ingest batch
  * ONE delta-sized bounded-key aggregate produces a B-row histogram, and
  * per-batch histograms fold by integer addition — the base is never
  * rescanned, and unlike a sampled t-digest the fold is EXACT, so the
  * merged estimate is identical to the one-shot histogram's (the
  * property the q_quantile_hist oracle proves by hashing the
  * incremental path against a whole-table SQL replay).
  *
  * Protocol (the [[graft.quality.DataQuality]] PSI binning doctrine):
  * the reference fence [lo, hi] is FROZEN by the init batch — later
  * batches clamp into the edge bins, so bin identity never shifts under
  * appends. The bin index is pure long arithmetic; the clamp to
  * [0, B-1] is belt-and-braces on the division: Spark `div` and
  * DuckDB `//` BOTH truncate toward zero (-7 // 2 = -3 in both — see
  * Pca.scala for the engine-division survey), so below-fence values
  * agree engine-to-engine even before the clamp pins them to bin 0.
  * Quantile targets are rational
  * (ceil(num·n/den) in integers, never p·n in doubles — double(0.9)·n
  * crossing an integer boundary would flip the selected bin); the only
  * doubles are the final bin-edge interpolation, fixed IEEE arithmetic
  * on both engines.
  *
  * Scale shape: histogram build shuffles B partial rows per partition
  * (map-side combined groupBy on a bounded key); the cumulative window
  * runs over the B-row frame (metadata scale, lint-allowlisted); the
  * fence and total-count scalars ride 1-row broadcasts.
  */
object HistQuantiles {

  /** Clamped equi-width bin of long column `vName` under the frozen
    * (lo, hi) fence columns — pure integer arithmetic.
    */
  def binCol(vName: String, bins: Int): Column =
    least(greatest(
      expr(s"(($vName - lo) * ${bins}L) div (hi - lo)"), lit(0L)),
      lit(bins - 1L))

  /** Per-batch histograms folded to the merged B-row histogram:
    * `df(valueCol: long, batchCol)` → (bin, cnt). The per-batch partial
    * aggregate is visible in the plan (groupBy batch+bin, then the fold)
    * — the shape an ingest pipeline runs across days.
    */
  def mergedHistogram(df: DataFrame, valueCol: String, batchCol: String,
      fence: DataFrame, bins: Int): DataFrame =
    df.crossJoin(broadcast(fence))
      .withColumn("__bin", binCol(valueCol, bins))
      .groupBy(col(batchCol), col("__bin"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col("__bin").as("bin"))
      .agg(sum(col("__c")).as("cnt"))

  /** Quantile readout from a (bin, cnt) histogram: for each rational
    * target num/den, the smallest bin whose cumulative count reaches
    * ceil(num·n/den), its cumulative count, and the bin's upper-edge
    * value estimate. Returns (p_pct, qbin, cum_le, n, est).
    */
  def quantiles(hist: DataFrame, fence: DataFrame, bins: Int,
      ps: Seq[(Int, Int, Int)]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = hist.sparkSession
    import spark.implicits._
    val cum = hist.withColumn("cum",
      sum(col("cnt")).over(Window.orderBy(col("bin"))))
    val n = hist.agg(sum(col("cnt")).as("n"))
    val targets = ps.toDF("p_pct", "num", "den")
    cum.crossJoin(broadcast(n)).crossJoin(broadcast(targets))
      .filter(col("cum") >= expr("(num * n + den - 1) div den"))
      .groupBy(col("p_pct").cast("long").as("p_pct"))
      .agg(min(struct(col("bin"), col("cum"), col("n"))).as("q"))
      .select(col("p_pct"), col("q.bin").as("qbin"),
        col("q.cum").as("cum_le"), col("q.n").as("n"))
      .crossJoin(broadcast(fence))
      .withColumn("est", round(col("lo").cast("double") +
        (col("qbin") + 1L).cast("double") *
          ((col("hi") - col("lo")).cast("double") / bins), 6))
      .drop("lo", "hi")
  }
}
