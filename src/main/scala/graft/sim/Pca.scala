package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dominant principal direction by integer power iteration over the
  * one-pass [[Gram]] second moment — the dimensionality-reduction /
  * whitening primitive expressed the only way it scales: the DATA pass is
  * the d×d Gram aggregate (one map-side-combined shuffle of a
  * d(d+1)/2-long buffer), and everything eigen is driver-side arithmetic
  * on a metadata-scale matrix. At 100 TB the corpus is never collected,
  * never re-read per iteration, and the final projection is a broadcast
  * literal dotted against each row — embarrassingly parallel, one scan.
  *
  * Determinism doctrine: floating-point eigensolvers don't replay
  * cross-engine (matvec sum order), so the whole iteration runs in exact
  * long arithmetic — quantized inputs (floor(x·10⁴+0.5), the repo-wide
  * canonical fixed point), per-row-mean Gram via truncating division
  * (Scala `Long./` == DuckDB `//`, both toward zero), and a
  * data-adaptive integer rescale (divide by max|y|/10⁶) instead of a
  * float normalize. Every step is bit-replayable in SQL, any scale
  * factor, no tolerance needed (q_pca_power / q_pca_project).
  *
  * Magnitude audit (ANSI mode throws on long overflow, so the bounds are
  * load-bearing): |q| ≤ 10⁴·max|x|; gh = Σq_iq_j / n ≤ 10⁸·max|x|²;
  * |v| ≤ ~2·10⁶ post-rescale; matvec ≤ dim·gh·|v| ≈ 10¹⁵ for dim ≤ 32
  * and |x| ≤ 1 — three orders under Long.Max.
  */
object Pca {

  val Scale = 1000000L // rescale target: keeps |v| ~1e6 between steps

  /** T power-iteration steps on the per-row-mean Gram matrix of the first
    * `dim` coordinates; returns the un-normalized integer direction
    * (exact) — converges in direction to the top eigenvector since the
    * Gram matrix is PSD (no sign flip-flop between iterations).
    */
  def dominantDirection(df: DataFrame, vecCol: String, dim: Int,
      iters: Int): Array[Long] = {
    // d(d+1)/2 rows — metadata scale, the documented driver-side readout
    val tri = Gram.gramReadout(df, vecCol, dim).collect()
    val g = Array.ofDim[Long](dim, dim)
    var n = 1L
    tri.foreach { r =>
      val i = r.getLong(0).toInt - 1; val j = r.getLong(1).toInt - 1
      g(i)(j) = r.getLong(2); g(j)(i) = r.getLong(2); n = r.getLong(3)
    }
    val gh = g.map(_.map(_ / n))
    var v = Array.fill(dim)(Scale)
    for (_ <- 1 to iters) {
      val y = Array.tabulate(dim) { i =>
        var s = 0L; var j = 0
        while (j < dim) { s += gh(i)(j) * v(j); j += 1 }; s
      }
      val m = math.max(1L, y.map(math.abs).max / Scale)
      v = y.map(_ / m)
    }
    v
  }

  /** The direction itself as a frame: (i, v), 1-based, exact longs. */
  def directionReadout(df: DataFrame, vecCol: String, dim: Int,
      iters: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    dominantDirection(df, vecCol, dim, iters)
      .zipWithIndex.map { case (x, i) => (i + 1L, x) }.toSeq
      .toDF("i", "v")
  }

  /** Top-k rows by |projection| onto the dominant direction — the
    * data-scale face: the direction is a broadcast literal, the score one
    * exact integer dot per row inside codegen, the top-k a
    * TakeOrderedAndProject (per-partition heads, never a global sort).
    */
  def projectTopK(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      iters: Int, k: Int): DataFrame = {
    val v = dominantDirection(df, vecCol, dim, iters)
    val q = transform(slice(col(vecCol).cast("array<double>"), 1, dim),
      x => floor(x * lit(10000d) + lit(0.5d)).cast("long"))
    val vlit = array(v.map(lit): _*)
    val score = aggregate(zip_with(q, vlit, (a, b) => a * b),
      lit(0L), (acc, x) => acc + x)
    df.select(col(idCol).cast("long").as("id"), score.as("score"))
      .orderBy(abs(col("score")).desc, col("id").asc)
      .limit(k)
  }

  /** The full pipeline as ANSI SQL: gram triangle → mirrored mean matrix
    * → `iters` unrolled integer power steps. `fin` consumes CTEs `vN`
    * (the final direction, columns i, v) and `q` (per-row quantized
    * vectors: id, q).
    */
  def oracleSql(idCol: String, dim: Int, iters: Int, fin: String): String = {
    val d1 = dim + 1
    val steps = (1 to iters).map { t =>
      val p = s"v${t - 1}"
      s"""y$t AS MATERIALIZED (SELECT gh.i AS i, CAST(sum(gh.g * $p.v) AS BIGINT) AS y
         |  FROM gh JOIN $p ON gh.j = $p.i GROUP BY 1),
         |m$t AS MATERIALIZED (SELECT greatest(CAST(1 AS BIGINT),
         |  CAST(max(abs(y)) AS BIGINT) // ${Scale}) AS m FROM y$t),
         |v$t AS MATERIALIZED (SELECT i, y // (SELECT m FROM m$t) AS v FROM y$t)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH q AS MATERIALIZED (
       |  SELECT $idCol AS id,
       |    list_transform((CAST(embedding AS DOUBLE[]))[1:$dim],
       |      x -> CAST(floor(x*10000+0.5) AS BIGINT)) AS q
       |  FROM embeddings),
       |gtri AS MATERIALIZED (
       |  SELECT u.i, v.j, CAST(sum(q[u.i]*q[v.j]) AS BIGINT) AS s,
       |    count(*) AS n
       |  FROM q, LATERAL unnest(range(1,$d1)) AS u(i),
       |    LATERAL unnest(range(u.i,$d1)) AS v(j)
       |  GROUP BY 1, 2),
       |gh AS MATERIALIZED (
       |  SELECT i, j, s // n AS g FROM gtri
       |  UNION ALL SELECT j, i, s // n FROM gtri WHERE i <> j),
       |v0 AS MATERIALIZED (SELECT CAST(r.range AS BIGINT) AS i,
       |  CAST(${Scale} AS BIGINT) AS v FROM range(1,$d1) r),
       |$steps
       |$fin""".stripMargin
  }
}
