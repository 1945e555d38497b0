package graft.sim

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** One-pass Gram matrix (Xᵀ X) over an embedding column — the covariance
  * / PCA / whitening precursor: at 100 TB the d×d second-moment matrix is
  * the ONLY thing the driver ever needs (eigen-decomposition of a d×d is
  * a driver-side afterthought), so the entire reduction must be a single
  * map-side-combined pass with an O(d²) buffer — never a rows×d² explode
  * and never a driver-side collect of vectors.
  *
  * Scale shape: ONE global typed aggregate; the shuffle carries one
  * d(d+1)/2-long upper-triangle buffer per partition. Determinism: inputs
  * are quantized to fixed-point longs (floor(x·10⁴ + 0.5)); products and
  * sums of longs are exact and order-independent — no offset needed (no
  * division anywhere), signs flow through exactly — so the triangle
  * replays bit-for-bit in SQL (q_gram_matrix).
  */
object Gram {

  private final class GramAgg(dim: Int)
      extends Aggregator[Seq[Long], (Array[Long], Long), (Seq[Long], Long)] {
    private val tri = dim * (dim + 1) / 2
    def zero: (Array[Long], Long) = (new Array[Long](tri), 0L)
    // addExact/multiplyExact (JIT intrinsics — a flag branch, not a cost):
    // a bare += would WRAP silently past ~2^63, and unit-norm fixed-point
    // terms are ~10^8, so the sum bound (~9·10^10 rows) is within an order
    // of magnitude of a real 100 TB embedding corpus — overflow must be an
    // ArithmeticException (the ANSI doctrine), never a wrong triangle.
    def reduce(b: (Array[Long], Long), v: Seq[Long]): (Array[Long], Long) = {
      var k = 0; var i = 0
      while (i < dim) {
        val vi = v(i); var j = i
        while (j < dim) {
          b._1(k) = Math.addExact(b._1(k), Math.multiplyExact(vi, v(j)))
          j += 1; k += 1
        }
        i += 1
      }
      (b._1, b._2 + 1)
    }
    def merge(a: (Array[Long], Long), b: (Array[Long], Long)): (Array[Long], Long) = {
      var k = 0
      while (k < tri) { a._1(k) = Math.addExact(a._1(k), b._1(k)); k += 1 }
      (a._1, a._2 + b._2)
    }
    def finish(b: (Array[Long], Long)): (Seq[Long], Long) = (b._1.toSeq, b._2)
    def bufferEncoder: Encoder[(Array[Long], Long)] = ExpressionEncoder()
    def outputEncoder: Encoder[(Seq[Long], Long)] = ExpressionEncoder()
  }

  /** Upper-triangle Gram entries over the first `dim` coordinates of
    * `vecCol`, quantized. Returns (i, j, s, n), i ≤ j, 1-based — s is the
    * exact Σ qᵢ·qⱼ, n the row count.
    */
  def gramReadout(df: DataFrame, vecCol: String, dim: Int): DataFrame = {
    val agg = udaf(new GramAgg(dim), ExpressionEncoder[Seq[Long]]())
    val q = df.select(transform(slice(col(vecCol).cast("array<double>"), 1, dim),
      x => floor(x * lit(10000d) + lit(0.5d)).cast("long")).as("__q"))
    val sk = q.agg(agg(col("__q")).as("gn"))
      .select(col("gn._1").as("g"), col("gn._2").as("n"))
    // unpack the metadata-scale triangle: posexplode over the d(d+1)/2
    // buffer, then recover (i, j) from the linear index — driver-free,
    // stays a 1-row → tri-rows projection
    val idx = for { i <- 1 to dim; j <- i to dim } yield
      (((i - 1) * (2 * dim - i + 2)) / 2 + (j - i), i.toLong, j.toLong)
    val spark = df.sparkSession
    import spark.implicits._
    val ij = idx.toDF("k", "i", "j")
    sk.select(posexplode(col("g")).as(Seq("k", "s")), col("n"))
      .join(ij, Seq("k"))
      .select(col("i"), col("j"), col("s"), col("n"))
  }
}
