package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SemDeDup-style semantic deduplication over an embedding column
  * (Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
  * through semantic deduplication"): assign every vector to its nearest
  * centroid, then inside each cluster drop any vector that is
  * cosine-similar (≥ threshold) to a lower-id clustermate.
  *
  * Scale shape — the three stages a 1B-vector corpus needs:
  *  1. assignment = vectors × broadcast centroid set, argmax cosine. The
  *     centroid set is fixed-size (k does NOT grow with the corpus scan;
  *     production trains k ≈ corpus/targetClusterSize centroids offline —
  *     still ≤ ~1e6 rows, broadcastable), so this is a map-side pass.
  *  2. one shuffle keyed on cluster_id co-locates each cluster.
  *  3. in-cluster pruning is an equi-join on cluster_id: candidate pairs
  *     are bounded by targetClusterSize² per cluster, never corpus².
  *  Norms are computed once per row BEFORE the pairwise join
  *  (cosineFromNorms) — recomputing ‖v‖ per pair is O(pairs × dim) waste.
  *
  * The drop rule is "similar to ANY lower-id clustermate" (one join),
  * not the sequential greedy "similar to a KEPT lower-id clustermate":
  * the two differ only on chains (a∼b, b∼c, a≁c), where this rule drops
  * strictly more — the conservative direction for dedup — and it stays a
  * single declarative plan instead of an iterative loop.
  *
  * Determinism: cosine folds left-to-right on both engines (see
  * [[Vectors]]), so argmax ties and threshold comparisons reproduce
  * bit-for-bit; centroid-id ascending breaks exact ties.
  */
object SemanticDedup {

  /** (idCol, cluster_id, keep) — one row per input vector. `centroids`
    * carries (cidCol, vecCol); callers keep it bounded (broadcast-sized).
    */
  def keepFlags(
      vecs: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: DataFrame,
      cidCol: String,
      threshold: Double): DataFrame = {
    val v = graft.prep.Preprocessing.spread(vecs)
      .select(col(idCol), Vectors.toDoubleArray(col(vecCol)).as("__v"))
      .withColumn("__nv", Vectors.norm(col("__v")))
    val c = centroids
      .select(col(cidCol).as("__cid"), Vectors.toDoubleArray(col(vecCol)).as("__c"))
      .withColumn("__nc", Vectors.norm(col("__c")))
    // stage 1: nearest centroid. The window partitions by VECTOR id, so a
    // partition holds exactly k rows — no skew at any corpus size.
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("__sim").desc, col("__cid").asc)
    val assigned = v.crossJoin(c)
      .select(col(idCol), col("__v"), col("__nv"), col("__cid"),
        Vectors.cosineFromNorms(col("__v"), col("__c"), col("__nv"), col("__nc"))
          .as("__sim"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(idCol), col("__v"), col("__nv"), col("__cid").as("cluster_id"))
    // stages 2+3: cluster-keyed self-join, drop the higher id of any
    // similar pair. Non-finite-norm vectors (a NaN or Inf element) are
    // EXCLUDED from the pairwise side: their cosine comes out NaN, and
    // both Spark and DuckDB treat NaN as greater than any threshold, so
    // one poisoned embedding would otherwise mark every clustermate a
    // duplicate. They keep their own rows (assignment already falls back
    // deterministically); they just can't drop anyone.
    val prunable = assigned.filter(Vectors.finiteNorm(col("__nv")))
    val drops = prunable.as("a").join(prunable.as("b"),
        col("a.cluster_id") === col("b.cluster_id") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .filter(Vectors.cosineFromNorms(col("a.__v"), col("b.__v"),
        col("a.__nv"), col("b.__nv")) >= threshold)
      .select(col(s"b.$idCol").as(idCol)).distinct()
      .withColumn("__dropped", lit(true))
    assigned.select(col(idCol), col("cluster_id"))
      .join(drops, Seq(idCol), "left_outer")
      .select(col(idCol), col("cluster_id"),
        not(coalesce(col("__dropped"), lit(false))).as("keep"))
  }
}
