package graft.sim

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Distributed k-means (Lloyd's) trained INSIDE the engine — the
  * clustering pass that produces the centroids SemDeDup and the IVF index
  * consume (until now those arrived as offline frozen constants, see
  * [[SemanticCentroids]]; this closes the loop: train → assign → prune,
  * all in-plan).
  *
  * Scale shape (the MLlib choreography, declaratively): per iteration ONE
  * full scan + ONE aggregate whose shuffle carries only k×dim-bounded
  * partial buffers — the assignment step is a pure projection against the
  * centroid set inlined as an array literal (k·dim·8 bytes riding the
  * serialized plan, the degenerate broadcast), so there is NO join and no
  * per-row shuffle anywhere in the loop. Centroid update is the
  * [[VectorQuant]] O(dim)-buffer typed Aggregator, not explode+groupBy
  * (which would shuffle rows×dim records). At 100 TB each Lloyd iteration
  * is therefore exactly one map-side-combined pass over the corpus.
  *
  * Determinism doctrine: coordinates are quantized to the fixed-point
  * long domain (floor(x·10⁴ + 0.5), the engine-agnostic rounding proven
  * by the media-signature oracles) and OFFSET to non-negative so every
  * sum/div is exact integer arithmetic — partial-aggregation order,
  * partition count, and engine all drop out of the result, which is what
  * makes a 3-iteration Lloyd run bit-for-bit replayable as unrolled SQL
  * CTEs in the DuckDB oracle (q_kmeans_train). Seeding is the repo's
  * md5-rank protocol: the k rows with the smallest (md5(id), id) are the
  * initial centroids — deterministic on both engines, no RNG. Empty
  * clusters retain their previous centroid (the standard Lloyd
  * convention, and the one SQL's left-join-coalesce mirrors for free).
  *
  * Reference analogue: none — the reference outsources clustering to its
  * learner stack; this is the training-data-pipeline face (SemDeDup §4
  * trains k-means on embeddings before in-cluster pruning).
  */
object KMeans {

  private val Scale = 10000d

  /** Non-negative fixed-point domain: embeddings are unit-scale, so
    * |x·10⁴| ≤ ~10⁵ and +10⁵ keeps every coordinate ≥ 0 — integer `div`
    * then agrees between Spark (`div`, truncating) and DuckDB (`//`)
    * because both floor on non-negatives. Distances subtract coordinates,
    * so the offset cancels there.
    */
  private val Offset = 100000L

  /** Quantize a float/double vector column into the offset long domain. */
  def quantize(vec: Column): Column =
    transform(vec.cast("array<double>"),
      x => floor(x * lit(Scale) + lit(0.5d)).cast("long") + lit(Offset))

  /** Elementwise long sum over grouped quantized vectors — one O(dim)
    * buffer per group, exact in any merge order (see [[VectorQuant]] for
    * the double-domain sibling and the explode+groupBy anti-pattern).
    */
  private final class LongVecSum(dim: Int)
      extends Aggregator[Seq[Long], (Array[Long], Long), (Seq[Long], Long)] {
    def zero: (Array[Long], Long) = (new Array[Long](dim), 0L)
    // addExact: loud ArithmeticException past 2^63, never a silent wrap
    // (the Gram doctrine; bound here is ~4·10^14 rows per cluster)
    def reduce(b: (Array[Long], Long), v: Seq[Long]): (Array[Long], Long) = {
      var i = 0
      while (i < dim) { b._1(i) = Math.addExact(b._1(i), v(i)); i += 1 }
      (b._1, b._2 + 1)
    }
    def merge(a: (Array[Long], Long), b: (Array[Long], Long)): (Array[Long], Long) = {
      var i = 0
      while (i < dim) { a._1(i) = Math.addExact(a._1(i), b._1(i)); i += 1 }
      (a._1, a._2 + b._2)
    }
    def finish(b: (Array[Long], Long)): (Seq[Long], Long) =
      (b._1.toSeq, b._2)
    def bufferEncoder: Encoder[(Array[Long], Long)] = ExpressionEncoder()
    def outputEncoder: Encoder[(Seq[Long], Long)] = ExpressionEncoder()
  }

  /** Squared-L2 distances to every centroid (array literal), plus the
    * argmin cluster id: `array_position` returns the FIRST minimum, so
    * ties break toward the lower cid — the same (d, cid) order the
    * oracle's row_number window uses.
    */
  private[sim] def withAssignment(q: DataFrame, centroids: Array[Array[Long]]): DataFrame = {
    val cLit = array(centroids.map(c => lit(c)): _*)
    val dists = transform(cLit, c =>
      aggregate(zip_with(col("q"), c, (a, b) => (a - b) * (a - b)),
        lit(0L), (acc, x) => acc + x))
    q.withColumn("__d", dists)
      .withColumn("d", array_min(col("__d")))
      .withColumn("cid", (array_position(col("__d"), col("d")) - 1L).cast("long"))
      .drop("__d")
  }

  /** `iters` Lloyd iterations over `df(idCol, vecCol)`; returns the final
    * centroids (k×dim, offset long domain). Driver holds only k×dim longs
    * per iteration — the k-bounded collect the catalog doctrine allows.
    */
  def train(df: DataFrame, idCol: String, vecCol: String,
      k: Int, dim: Int, iters: Int): Array[Array[Long]] = {
    val q = df.select(col(idCol).cast("long").as("vec_id"),
      quantize(col(vecCol)).as("q")).persist()
    try {
      val seeds = q
        .select(md5(col("vec_id").cast("string")).as("m"), col("vec_id"), col("q"))
        .orderBy(col("m"), col("vec_id")).limit(k)
        .collect().map(_.getSeq[Long](2).toArray)
      var cents = seeds
      val vs = udaf(new LongVecSum(dim), ExpressionEncoder[Seq[Long]]())
      for (_ <- 1 to iters) {
        val upd = withAssignment(q, cents)
          .groupBy(col("cid")).agg(vs(col("q")).as("sn"))
          .select(col("cid"), col("sn._1").as("s"), col("sn._2").as("n"))
          .collect()
          .map(r => r.getLong(0).toInt ->
            (r.getSeq[Long](1).toArray, r.getLong(2)))
          .toMap
        cents = cents.zipWithIndex.map { case (old, j) =>
          upd.get(j).map { case (s, n) => s.map(_ / n) }.getOrElse(old)
        }
      }
      cents
    } finally q.unpersist(blocking = false)
  }

  /** Train then emit the oracled readout: one row per (cid, pos) with the
    * final centroid coordinate and the cluster's final-assignment size and
    * inertia (sum of squared distances) — n/inertia 0 for clusters that
    * ended empty. `pos` is 1-based to match SQL list subscripts.
    */
  def trainReadout(df: DataFrame, idCol: String, vecCol: String,
      k: Int, dim: Int, iters: Int): DataFrame = {
    val spark = df.sparkSession
    val cents = train(df, idCol, vecCol, k, dim, iters)
    val q = df.select(col(idCol).cast("long").as("vec_id"),
      quantize(col(vecCol)).as("q"))
    val stats = withAssignment(q, cents)
      .groupBy(col("cid"))
      .agg(count(lit(1)).as("n"), sum(col("d")).as("inertia"))
    val rows = for {
      (c, j) <- cents.zipWithIndex.toSeq
      (v, i) <- c.zipWithIndex
    } yield (j.toLong, (i + 1).toLong, v)
    import spark.implicits._
    val centDf = rows.toDF("cid", "pos", "cval")
    centDf.join(stats, Seq("cid"), "left")
      .select(col("cid"), coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("inertia"), lit(0L)).as("inertia"),
        col("pos"), col("cval"))
  }
}
