package graft.sim

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Per-dimension linear int8 quantization for embedding storage: corpus
  * min/max per dimension (ONE global aggregate, broadcast back), then
  * q_d = floor((x_d − min_d)/scale_d + 0.5) with scale_d =
  * (max_d − min_d)/255 — 4 bytes/dim float32 becomes 1 byte/dim with
  * reconstruction error ≤ scale/2 per dimension.
  *
  * Scale shape: the stats pass is a typed Aggregator whose buffer is two
  * O(dim) arrays — elementwise min/max folded per partition, then merged
  * across the 32 partial buffers. One pass, one tiny final row, and the
  * aggregate stays a SINGLE expression at ANY width (the previous
  * formulation built 2·dim named agg expressions — 1,536–8,192 of them at
  * production widths 768–4096, past codegen comfort). Quantization itself
  * is a pure projection — the corpus is read once and never shuffled.
  * floor(x + 0.5) is used instead of round(): SQL engines disagree on
  * round-half semantics (HALF_UP vs banker's), floor is identical
  * everywhere, so the quantized codes replay bit-for-bit cross-engine.
  *
  * Poison guard: a single NaN/Inf element would make that dimension's
  * global min/max NaN/Inf and silently corrupt EVERY row's code for the
  * dimension — so rows with a non-finite norm are dropped with the other
  * malformed shapes (the norm is finite iff every element is), mirroring
  * the finite-norm guards on all the cosine paths (see [[Knn]]).
  *
  * Output: (idCol, q_csv — the int codes as a canonical comma string,
  * max_abs_err — the worst per-dim reconstruction error, rounded).
  */
object VectorQuant {

  /** Elementwise min/max over all rows in one pass; buffer = two O(dim)
    * arrays. Runs as an ObjectHashAggregate with a single agg expression
    * regardless of dim — no per-dimension expression blowup.
    */
  private final class MinMaxAgg(dim: Int)
      extends Aggregator[Seq[Double], (Array[Double], Array[Double]), (Seq[Double], Seq[Double])] {
    def zero: (Array[Double], Array[Double]) =
      (Array.fill(dim)(Double.PositiveInfinity),
        Array.fill(dim)(Double.NegativeInfinity))
    def reduce(
        b: (Array[Double], Array[Double]),
        v: Seq[Double]): (Array[Double], Array[Double]) = {
      var i = 0
      while (i < dim) {
        val x = v(i)
        if (x < b._1(i)) b._1(i) = x
        if (x > b._2(i)) b._2(i) = x
        i += 1
      }
      b
    }
    def merge(
        a: (Array[Double], Array[Double]),
        b: (Array[Double], Array[Double])): (Array[Double], Array[Double]) = {
      var i = 0
      while (i < dim) {
        if (b._1(i) < a._1(i)) a._1(i) = b._1(i)
        if (b._2(i) > a._2(i)) a._2(i) = b._2(i)
        i += 1
      }
      a
    }
    def finish(b: (Array[Double], Array[Double])): (Seq[Double], Seq[Double]) =
      (b._1.toSeq, b._2.toSeq)
    def bufferEncoder: Encoder[(Array[Double], Array[Double])] = ExpressionEncoder()
    def outputEncoder: Encoder[(Seq[Double], Seq[Double])] = ExpressionEncoder()
  }

  /** (idCol, __v double array) with malformed rows dropped: null /
    * wrong-dim / non-finite vectors are DROPPED, not fatal — under ANSI
    * mode element access past a short vector's end throws, and one poison
    * row must not kill a corpus-wide job nor poison the global stats (see
    * scaladoc). Callers needing a dead-letter channel anti-join the output
    * against the input ids.
    */
  private[graft] def prepare(
      df: DataFrame, idCol: String, vecCol: String, dim: Int): DataFrame =
    df.select(col(idCol), Vectors.toDoubleArray(col(vecCol)).as("__v"))
      .filter(size(col("__v")) === dim)
      .withColumn("__nrm", Vectors.norm(col("__v")))
      .filter(Vectors.finiteNorm(col("__nrm")))
      .drop("__nrm")

  /** One-row (__mn, __mx) arrays over a [[prepare]]d frame. */
  private[graft] def statsOf(v: DataFrame, dim: Int): DataFrame = {
    val mm = udaf(new MinMaxAgg(dim), ExpressionEncoder[Seq[Double]]())
    v.agg(mm(col("__v")).as("__mm"))
      .select(col("__mm._1").as("__mn"), col("__mm._2").as("__mx"))
  }

  /** int8 code array for a vector given the broadcast stats arrays. */
  private[graft] def codeArray(
      v: org.apache.spark.sql.Column,
      mns: org.apache.spark.sql.Column,
      mxs: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    transform(v, (x, i) => {
      val mn = get(mns, i)
      val mx = get(mxs, i)
      when(mx === mn, lit(0))
        .otherwise(floor((x - mn) / ((mx - mn) / 255.0) + 0.5).cast("int"))
    })

  /** Dequantized vector from an int8 code array: mn_d + q_d · scale_d —
    * the asymmetric-distance reconstruction a quantized ANN scores
    * against (reconstruction error ≤ scale/2 per dimension).
    */
  private[graft] def dequantize(
      codes: org.apache.spark.sql.Column,
      mns: org.apache.spark.sql.Column,
      mxs: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    transform(codes, (q, i) => {
      val mn = get(mns, i)
      val mx = get(mxs, i)
      mn + q.cast("double") * ((mx - mn) / 255.0)
    })

  /** Elementwise mean over grouped vectors in one pass; buffer = one
    * O(dim) sum array + a count. The grouped counterpart of [[MinMaxAgg]]:
    * runs as an ObjectHashAggregate with a single agg expression per
    * group, vs the explode+groupBy(dim) phrasing that shuffles rows×dim
    * records.
    */
  private final class MeanPoolAgg(dim: Int)
      extends Aggregator[Seq[Double], (Array[Double], Long), Seq[Double]] {
    def zero: (Array[Double], Long) = (new Array[Double](dim), 0L)
    def reduce(b: (Array[Double], Long), v: Seq[Double]): (Array[Double], Long) = {
      var i = 0
      while (i < dim) { b._1(i) += v(i); i += 1 }
      (b._1, b._2 + 1)
    }
    def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
      var i = 0
      while (i < dim) { a._1(i) += b._1(i); i += 1 }
      (a._1, a._2 + b._2)
    }
    def finish(b: (Array[Double], Long)): Seq[Double] =
      if (b._2 == 0) Seq.fill(dim)(0.0) else b._1.map(_ / b._2).toSeq
    def bufferEncoder: Encoder[(Array[Double], Long)] = ExpressionEncoder()
    def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder()
  }

  /** Mean-pool vectors per group — the chunk→document embedding pooling
    * step of an embedding pipeline (documents are embedded per chunk; the
    * doc-level vector is the elementwise mean). One hash aggregate keyed
    * on the group column with an O(dim) buffer per group; malformed and
    * non-finite vectors are dropped by the same [[prepare]] contract as
    * quantization (one poison chunk must not corrupt its document's
    * vector).
    *
    * Output: (groupCol, n_vecs, mean vector as a CSV of integer
    * MICRO-UNITS, round(x·10⁶)) — the canonical cross-engine
    * representation: per-dim sums associate in row order, so raw doubles
    * differ in the last ulp between engines, and double→string exponent
    * formatting differs too (Java "1.0E-4" vs DuckDB "1e-04"); integers
    * format identically everywhere and the micro-unit rounding absorbs
    * the ulp.
    *
    * EVERY input group gets a row: a group whose vectors were ALL dropped
    * by [[prepare]] (each chunk poisoned) comes back as (group, n_vecs=0,
    * "") via the group-spine left join — callers can tell "document with
    * zero clean chunks" (n_vecs=0, act: re-embed or drop) from "document
    * absent from the input" (no row). A bare groupBy over the prepared
    * rows would silently omit exactly the documents most in need of
    * attention. The spine is one extra distinct on the group key — same
    * partitioning as the pooling aggregate, nothing corpus-wide.
    */
  def meanPool(
      df: DataFrame,
      groupCol: String,
      vecCol: String,
      dim: Int): DataFrame = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    val v = prepare(df, groupCol, vecCol, dim)
    val mp = udaf(new MeanPoolAgg(dim), ExpressionEncoder[Seq[Double]]())
    val pooled = v.groupBy(col(groupCol))
      .agg(count(lit(1)).as("__n"), mp(col("__v")).as("__mean"))
    df.select(col(groupCol)).distinct()
      .join(pooled, Seq(groupCol), "left_outer")
      .select(col(groupCol),
        coalesce(col("__n"), lit(0L)).as("n_vecs"),
        coalesce(array_join(transform(col("__mean"),
          x => round(x * 1e6, 0).cast("long").cast("string")),
          ","), lit("")).as("mean_micro_csv"))
  }

  def quantizeInt8(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int): DataFrame = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    val v = prepare(df, idCol, vecCol, dim)
    val stats = statsOf(v, dim)
    // codes + reconstruction error in indexed transforms — mins/maxs are
    // plain array lookups, so the projection width is constant in dim
    v.crossJoin(broadcast(stats))
      .withColumn("__q", codeArray(col("__v"), col("__mn"), col("__mx")))
      .select(col(idCol),
        array_join(transform(col("__q"), q => q.cast("string")), ",").as("q_csv"),
        round(array_max(zip_with(col("__v"),
          dequantize(col("__q"), col("__mn"), col("__mx")),
          (x, dv) => abs(x - dv))), 6).as("max_abs_err"))
  }
}
