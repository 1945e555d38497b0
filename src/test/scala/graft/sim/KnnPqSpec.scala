package graft.sim

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Product-quantization ANN semantics: codebook shape/determinism, the
  * exact-refine contract, and the recall invariant the catalog query
  * (q_knn_pq) pins in-plan at every SF.
  */
class KnnPqSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private lazy val emb = graft.ops.Tables.embeddings(spark, dir)

  test("codebooks have shape m x ksub x dim/m and training is deterministic") {
    val a = Knn.trainPqCodebooks(emb, "embedding", dim = 64, m = 8,
      ksub = 16, sampleSize = 500, iters = 5, seed = 7L)
    val b = Knn.trainPqCodebooks(emb, "embedding", dim = 64, m = 8,
      ksub = 16, sampleSize = 500, iters = 5, seed = 7L)
    assert(a.length === 8)
    assert(a.forall(_.length === 16))
    assert(a.forall(_.forall(_.length === 8)))
    assert(a.map(_.toSeq.map(_.toSeq)).toSeq ===
      b.map(_.toSeq.map(_.toSeq)).toSeq)
  }

  test("misconfiguration fails loudly: dim must split into m subspaces") {
    intercept[IllegalArgumentException] {
      Knn.trainPqCodebooks(emb, "embedding", dim = 64, m = 7,
        ksub = 16, sampleSize = 500, iters = 5, seed = 7L)
    }
  }

  test("refined output reports EXACT cosines: every emitted sim matches the brute twin") {
    // the refine stage re-scores shortlist survivors on true floats, so
    // any (query, neighbor) pair PQ emits must carry the same sim the
    // brute-force path computes for that pair
    val q = emb.filter(col("vec_id") < 5)
    val pq = Knn.pqTopK(q, emb, "vec_id", "embedding", k = 5, dim = 64)
      .select(col("query_id"), col("neighbor_id"), col("cosine_sim"))
    val brute = Knn.bruteForceTopK(q, emb, "vec_id", "embedding", k = 1000)
      .select(col("query_id"), col("neighbor_id"),
        col("cosine_sim").as("true_sim"))
    val joined = pq.join(brute, Seq("query_id", "neighbor_id"), "left_outer")
      .select(col("cosine_sim"), col("true_sim"))
      .as[(Double, Option[Double])].collect()
    assert(joined.nonEmpty)
    joined.foreach { case (s, t) =>
      assert(t.contains(s), s"PQ sim $s != exact sim $t")
    }
  }

  test("recall@5 vs the float brute twin clears the 0.85 contract") {
    val q = emb.filter(col("vec_id") < 10)
    val pq = Knn.pqTopK(q, emb, "vec_id", "embedding", k = 5, dim = 64)
      .select(col("query_id"), col("neighbor_id"))
    val brute = Knn.bruteForceTopK(q, emb, "vec_id", "embedding", k = 5)
      .select(col("query_id"), col("neighbor_id"))
    val inter = pq.intersect(brute).count().toDouble
    val total = brute.count().toDouble
    assert(inter / total >= 0.85, s"recall ${inter / total}")
  }

  test("quantizer training is partition-invariant: repartitioned corpus, identical centroids") {
    // r21 regression guard (VERDICT r20 item 1): rand(seed) sampling was
    // per-partition seeded, so a spread()/repartition upstream of training
    // moved every centroid and broke q_knn_wide's oracle. The value-hash
    // draw + canonical k-means++ init must make training a pure function
    // of the corpus MULTISET — any partitioning, same centroids, bit for
    // bit. sampleSize < corpus so the DRAW is exercised, not just init.
    val a = Knn.trainSphericalKmeans(emb, "embedding", k = 8,
      sampleSize = 200, iters = 5, seed = 42L)
    val b = Knn.trainSphericalKmeans(emb.repartition(7), "embedding",
      k = 8, sampleSize = 200, iters = 5, seed = 42L)
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
    val pqA = Knn.trainPqCodebooks(emb, "embedding", dim = 64, m = 8,
      ksub = 16, sampleSize = 200, iters = 5, seed = 7L)
    val pqB = Knn.trainPqCodebooks(emb.repartition(5), "embedding",
      dim = 64, m = 8, ksub = 16, sampleSize = 200, iters = 5, seed = 7L)
    assert(pqA.map(_.toSeq.map(_.toSeq)).toSeq ===
      pqB.map(_.toSeq.map(_.toSeq)).toSeq)
  }

  test("a fully-poisoned corpus degrades to an empty typed result (ivfTopK contract)") {
    val poison = Seq(
      (1L, null.asInstanceOf[Seq[Float]]),
      (6L, Seq.fill(64)(Float.NaN).toSeq),
      (7L, (Float.PositiveInfinity +: Seq.fill(63)(1f)).toSeq)
    ).toDF("vec_id", "embedding")
    val good = emb.filter(col("vec_id") < 3)
    val degraded = Knn.pqTopK(good, poison, "vec_id", "embedding",
      k = 3, dim = 64)
    assert(degraded.count() === 0)
    def shape(df: org.apache.spark.sql.DataFrame) =
      df.schema.fields.map(f => (f.name, f.dataType)).toSeq
    val normal = Knn.pqTopK(good, emb, "vec_id", "embedding", k = 3, dim = 64)
    assert(shape(degraded) === shape(normal))
  }
}
