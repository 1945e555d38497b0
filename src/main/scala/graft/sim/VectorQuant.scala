package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-dimension linear int8 quantization for embedding storage: corpus
  * min/max per dimension (ONE global aggregate, broadcast back), then
  * q_d = floor((x_d − min_d)/scale_d + 0.5) with scale_d =
  * (max_d − min_d)/255 — 4 bytes/dim float32 becomes 1 byte/dim with
  * reconstruction error ≤ scale/2 per dimension.
  *
  * Scale shape: the stats row is a map-side-combined aggregate over the
  * scan; quantization itself is a pure projection — the corpus is read
  * once and never shuffled. floor(x + 0.5) is used instead of round():
  * SQL engines disagree on round-half semantics (HALF_UP vs banker's),
  * floor is identical everywhere, so the quantized codes replay
  * bit-for-bit cross-engine.
  *
  * Output: (idCol, q_csv — the int codes as a canonical comma string,
  * max_abs_err — the worst per-dim reconstruction error, rounded).
  */
object VectorQuant {

  def quantizeInt8(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int): DataFrame = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    // malformed rows (null / wrong-dim vectors) are DROPPED, not fatal:
    // under ANSI mode element_at past a short vector's end throws, and one
    // poison row must not kill a corpus-wide job. Callers needing a
    // dead-letter channel anti-join the output against the input ids.
    val v = df.select(col(idCol), Vectors.toDoubleArray(col(vecCol)).as("__v"))
      .filter(size(col("__v")) === dim)
    val statAggs = (0 until dim).flatMap { d =>
      Seq(min(element_at(col("__v"), d + 1)).as(s"__mn_$d"),
        max(element_at(col("__v"), d + 1)).as(s"__mx_$d"))
    }
    val stats = v.agg(statAggs.head, statAggs.tail: _*)
    def x(d: Int) = element_at(col("__v"), d + 1)
    def mn(d: Int) = col(s"__mn_$d")
    def scale(d: Int) = (col(s"__mx_$d") - mn(d)) / 255.0
    def q(d: Int): Column = when(col(s"__mx_$d") === mn(d), lit(0))
      .otherwise(floor((x(d) - mn(d)) / scale(d) + 0.5).cast("int"))
    def err(d: Int): Column = when(col(s"__mx_$d") === mn(d), abs(x(d) - mn(d)))
      .otherwise(abs(x(d) - (mn(d) + q(d).cast("double") * scale(d))))
    val worst = if (dim == 1) err(0) else greatest((0 until dim).map(err): _*)
    v.crossJoin(broadcast(stats))
      .select(col(idCol),
        concat_ws(",", (0 until dim).map(d => q(d).cast("string")): _*).as("q_csv"),
        round(worst, 6).as("max_abs_err"))
  }
}
