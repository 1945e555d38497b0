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
    *
    * `maxClusterSize`: when set, the clusterSize² prune bound holds BY
    * CONTRACT, not by caller discipline — clusters whose assignment
    * exceeds the cap are split into prune sub-groups (see
    * [[boundedSubgroups]]) before the pairwise join. The REPORTED
    * cluster_id is unchanged (splitting bounds which pairs are compared,
    * not the assignment); the trade-off is that a near-dup pair split
    * across sub-groups goes undetected — the standard bounded-work
    * concession, and only oversized clusters pay it.
    */
  def keepFlags(
      vecs: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: DataFrame,
      cidCol: String,
      threshold: Double,
      maxClusterSize: Option[Int] = None): DataFrame = {
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
    val withSub = maxClusterSize match {
      case Some(max) => boundedSubgroups(assigned, idCol, max)
      case None => assigned.withColumn("__sub", lit("0"))
    }
    val prunable = withSub.filter(Vectors.finiteNorm(col("__nv")))
    val drops = prunable.as("a").join(prunable.as("b"),
        col("a.cluster_id") === col("b.cluster_id") &&
          col("a.__sub") === col("b.__sub") &&
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

  /** Splits oversized clusters into prune sub-groups so no group exceeds
    * ~max: adds a `__sub` string column to `assigned` (members of
    * non-oversized clusters all carry "0").
    *
    * Two rounds:
    *  1. SEMANTIC split — per oversized cluster, train ceil(size/max)
    *     sub-centroids on a bounded member sample ([[Knn.trainSphericalKmeans]]
    *     — the same seeded recipe as the top-level quantizer; a driver
    *     loop over at most k clusters, each a bounded sample + Lloyd's)
    *     and re-assign members by argmax cosine. Similar vectors stay
    *     together, so near-dup recall inside the cluster survives the
    *     split wherever the geometry allows it.
    *  2. SALT backstop — k-means does not hard-bound group sizes (a flood
    *     of identical vectors all land on one sub-centroid), so any
    *     (cluster, sub) still over the cap is hash-chunked:
    *     pmod(xxhash64(id), ceil(size/max)). This bounds every group in
    *     expectation regardless of geometry; pairs split across chunks go
    *     uncompared, but an identical-vector flood has its pairs in every
    *     chunk, so the drop path still fires there.
    *
    * Driver boundary: the two size checks collect ≤ k and ≤ k·ceil(n/max)
    * tiny rows — the same bounded per-level stats boundary as the
    * reference's own training loop; the corpus itself never leaves
    * executors.
    */
  private[graft] def boundedSubgroups(
      assigned: DataFrame,
      idCol: String,
      max: Int): DataFrame = {
    require(max >= 2, s"maxClusterSize must be >= 2, got $max")
    // STAGE BOUNDARY: the guard consumes the assignment several times
    // (size check, one training sample per oversized cluster, the
    // re-assign join) — left lazy, each driver action would replay the
    // full centroid-assignment pass. Same documented materialization
    // pattern as q_corpus_build's cleaned corpus.
    val a = assigned.localCheckpoint()
    val sizes = a.groupBy(col("cluster_id")).count().collect()
      .map(r => r.get(0) -> r.getLong(1)).toMap
    val oversized = sizes.filter(_._2 > max)
    if (oversized.isEmpty) return a.withColumn("__sub", lit("0"))

    // round 1: semantic split — train sub-centroids per oversized cluster.
    // A cluster whose finite training sample is EMPTY (every member
    // embedding non-finite — all poison rows deterministically tie-break
    // into one cluster) gets no centroids back (see
    // [[Knn.trainSphericalKmeans]]): it SKIPS the semantic round and falls
    // straight to the salt backstop, which needs no training data — one
    // all-NaN cluster must not kill the corpus-wide job (ADVICE r9).
    val trained: Seq[(String, Long, Array[Array[Double]])] = oversized.toSeq
      .sortBy(_._1.toString)
      .map { case (cid, size) =>
        val nSub = ((size + max - 1) / max).toInt
        val members = a.filter(col("cluster_id") === lit(cid))
        (cid.toString, size,
          Knn.trainSphericalKmeans(members, "__v", k = nSub,
            sampleSize = math.min(size, 2000L).toInt, iters = 5,
            seed = 42L + cid.toString.hashCode))
      }
    val saltOnly: Map[String, Int] = trained.collect {
      case (cid, size, cents) if cents.isEmpty =>
        cid -> ((size + max - 1) / max).toInt
    }.toMap
    val subCentRows: Seq[(String, Int, Seq[Double])] = trained.flatMap {
      case (cid, _, cents) =>
        cents.zipWithIndex.map { case (cvec, s) => (cid, s, cvec.toSeq) }
    }
    val spark = a.sparkSession
    import spark.implicits._
    val subCents = subCentRows.toDF("__scid", "__ssub", "__scv")
      .withColumn("__snc", Vectors.norm(col("__scv")))
    val wSub = Window.partitionBy(col(idCol))
      .orderBy(col("__ssim").desc, col("__ssub").asc)
    val semantic = a
      .join(broadcast(subCents),
        col("cluster_id").cast("string") === col("__scid"))
      .select(col(idCol), col("cluster_id"), col("__ssub"),
        Vectors.cosineFromNorms(col("__v"), col("__scv"),
          col("__nv"), col("__snc")).as("__ssim"))
      .withColumn("__rn", row_number().over(wSub))
      .filter(col("__rn") === 1)
      .select(col(idCol), col("cluster_id"),
        concat(lit("s"), col("__ssub").cast("string")).as("__sub"))
    val reassigned =
      if (saltOnly.isEmpty) semantic
      else {
        val saltMap = typedlit(saltOnly)
        val direct = a
          .filter(element_at(saltMap, col("cluster_id").cast("string")).isNotNull)
          .select(col(idCol), col("cluster_id"),
            concat(lit("p"),
              pmod(xxhash64(col(idCol)),
                element_at(saltMap, col("cluster_id").cast("string")))
                .cast("string")).as("__sub"))
        semantic.unionByName(direct)
      }

    // round 2: salt backstop for groups k-means failed to shrink
    val subSizes = reassigned.groupBy(col("cluster_id"), col("__sub")).count()
      .collect().map(r => (r.get(0).toString, r.getString(1)) -> r.getLong(2))
      .toMap
    val stillOver = subSizes.filter(_._2 > max)
    val salted =
      if (stillOver.isEmpty) reassigned
      else {
        val saltMod = typedlit(stillOver.map { case ((cid, sub), size) =>
          s"$cid|$sub" -> ((size + max - 1) / max).toInt
        })
        reassigned.withColumn("__mod",
            element_at(saltMod,
              concat(col("cluster_id").cast("string"), lit("|"), col("__sub"))))
          .withColumn("__sub",
            when(col("__mod").isNull, col("__sub"))
              .otherwise(concat(col("__sub"), lit("/"),
                pmod(xxhash64(col(idCol)), col("__mod")).cast("string"))))
          .drop("__mod")
      }
    a.join(
      salted.select(col(idCol), col("__sub")), Seq(idCol), "left_outer")
      .withColumn("__sub", coalesce(col("__sub"), lit("0")))
  }
}
