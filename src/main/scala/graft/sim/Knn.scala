package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import Vectors._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k with the (small) query set broadcast —
  * one pass over the candidate corpus, no shuffle of the big side, window
  * top-k per query. Scale path: sign-random-projection LSH buckets shrink
  * the candidate set per query to one bucket (plus multiprobe neighbors),
  * turning the scan into an equi-join — the IVF-style layout you want when
  * the corpus is billions of vectors.
  */
object Knn {

  /** Brute-force cosine top-k. `queries`/`candidates`: (idCol, vecCol).
    * Output: (query_id, neighbor_id, rank, cosine_sim). Self-pairs excluded.
    */
  def bruteForceTopK(
      queries: DataFrame,
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
      toDoubleArray(col(vecCol)).as("qv"))
    val c = candidates.select(col(idCol).as("neighbor_id"),
      toDoubleArray(col(vecCol)).as("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosineSimilarity(col("qv"), col("cv")).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("sim"), asc("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("sim"), 6).as("cosine_sim"))
  }

  /** Seeded random hyperplanes for sign-random-projection LSH. */
  def randomHyperplanes(numPlanes: Int, dim: Int, seed: Long): Seq[Seq[Double]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(numPlanes)(Seq.fill(dim)(rng.nextGaussian()))
  }

  /** SRP-LSH bucket id: one bit per hyperplane (sign of the projection). */
  def srpBucket(vec: org.apache.spark.sql.Column, planes: Seq[Seq[Double]]) = {
    val bits = planes.map { p =>
      val plane = typedlit(p)
      when(dot(vec, plane) >= 0, lit(1L)).otherwise(lit(0L))
    }
    bits.reduceLeft((acc, b) => acc * 2 + b)
  }

  /** LSH-bucketed ANN top-k: queries only compare against candidates in the
    * same SRP bucket. With `numPlanes` bits the corpus splits into
    * 2^numPlanes buckets, so per-query work drops by that factor at some
    * recall cost (raise k or lower numPlanes for higher recall; multiprobe
    * is the next refinement).
    */
  def lshTopK(
      queries: DataFrame,
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      numPlanes: Int = 4,
      seed: Long = 42L): DataFrame = {
    val dim = candidates.select(size(col(vecCol))).head().getInt(0)
    val planes = randomHyperplanes(numPlanes, dim, seed)
    val q = queries.select(col(idCol).as("query_id"),
        toDoubleArray(col(vecCol)).as("qv"))
      .withColumn("bucket", srpBucket(col("qv"), planes))
    val c = candidates.select(col(idCol).as("neighbor_id"),
        toDoubleArray(col(vecCol)).as("cv"))
      .withColumn("bucket", srpBucket(col("cv"), planes))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosineSimilarity(col("qv"), col("cv")).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("sim"), asc("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("sim"), 6).as("cosine_sim"))
  }

  /** Embedding-cosine near-duplicate pairs (id_a < id_b, sim >= threshold).
    * Exact within blocking: all-pairs via SRP buckets when `numPlanes` > 0,
    * else full cross-pairs (test scale only).
    */
  def cosinePairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      numPlanes: Int = 0,
      seed: Long = 42L): DataFrame = {
    val base = df.select(col(idCol), toDoubleArray(col(vecCol)).as("v"))
    val withBucket =
      if (numPlanes <= 0) base.withColumn("bucket", lit(0L))
      else {
        val dim = df.select(size(col(vecCol))).head().getInt(0)
        base.withColumn("bucket",
          srpBucket(col("v"), randomHyperplanes(numPlanes, dim, seed)))
      }
    val a = withBucket.select(col("bucket"), col(idCol).as("id_a"), col("v").as("va"))
    val b = withBucket.select(col("bucket"), col(idCol).as("id_b"), col("v").as("vb"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(cosineSimilarity(col("va"), col("vb")), 6).as("cosine_sim"))
      .filter(col("cosine_sim") >= threshold)
  }
}
