package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import Vectors._

/** Diversity-aware data selection — the missing face of the sampling
  * family (mix_* reweights domains, weighted_sample draws by priority,
  * domain_cap truncates): pick the k examples that COVER the embedding
  * space, for coreset seeding, prototype selection, eval-set curation,
  * or annotation budgeting.
  */
object Coreset {

  /** k-center greedy (Gonzalez): start from the min-id vector, then
    * repeatedly take the candidate FARTHEST (cosine distance) from every
    * center chosen so far — the classic 2-approximation to the k-center
    * cover. Output: one row per center, `(sel_rank, id, sel_dist)` where
    * sel_dist is the candidate's min distance to the prior centers at
    * selection time (the Gonzalez radius sequence — non-increasing, and
    * sel_dist of row k+1 bounds the full corpus's covering radius of the
    * first k centers).
    *
    * Ties (equal max distance) break to the LOWER id; the first center
    * is the min id — deterministic end to end, which is what makes the
    * unrolled DuckDB oracle (q_select_kcenter) replayable bit-for-bit:
    * each iteration ranks on raw doubles computed by the same
    * left-fold dot product both engines share.
    *
    * Scale shape: k-1 passes over a persisted NARROW (id, vec, norm)
    * frame, each pass ONE global struct-max aggregate (map-side partial
    * combine, no shuffle of data rows, no window, no join); the chosen
    * centers ride into the next pass as literals (k × dim doubles — tiny
    * by construction). Distance work is O(n·k²/2) total: recomputing
    * min-dist per pass trades arithmetic for statelessness — the O(n·k)
    * variant must persist and re-write a per-row min-dist frame every
    * pass, k checkpoint cycles of corpus-scale state. For the modest k
    * this operator targets (prototype/coreset selection, k ≤ a few
    * hundred) the stateless shape wins; for k beyond that, compose with
    * [[Knn.ivfTopK]]'s cells and select per cell.
    *
    * Non-finite and zero-norm vectors are dropped at prep (no cosine
    * direction); k > survivors returns every survivor.
    */
  def kCenterGreedy(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    val base = prepared(df, idCol, vecCol)
      .persist() // k-1 passes read it; released below
    try {
      // (id, vector, norm, selection distance); norms are CARRIED from
      // the frame, never recomputed driver-side — the oracle recomputes
      // them with the same sqrt(left-fold) arithmetic
      var centers = Vector.empty[(Long, Seq[Double], Double, Double)]
      base.orderBy(col("id")).limit(1)
        .select(col("id"), col("v"), col("n")).collect()
        .foreach(r => centers :+=
          ((r.getLong(0), r.getSeq[Double](1), r.getDouble(2), 0.0)))
      var exhausted = centers.isEmpty
      while (!exhausted && centers.size < k) {
        val picked = selectionPass(base,
          centers.map { case (id, cv, cn, _) => (id, cv, cn) }).collect()
        picked.headOption.filterNot(_.isNullAt(0)) match {
          case Some(r) => centers :+=
            ((r.getLong(0), r.getSeq[Double](1), r.getDouble(2),
              r.getDouble(3)))
          case None => exhausted = true // fewer than k survivors
        }
      }
      centers.zipWithIndex
        .map { case ((id, _, _, d), i) => (i + 1L, id, d) }
        .toDF("sel_rank", "id", "sel_dist")
        .select(col("sel_rank"), col("id"),
          round(col("sel_dist"), 6).as("sel_dist"))
    } finally {
      base.unpersist(blocking = false)
      ()
    }
  }

  /** One greedy pass as an UN-collected plan: min distance to the chosen
    * centers (literals), global struct-max, no shuffle of data rows.
    * Package-visible so the catalog lint can screen the per-pass shape
    * the driver-built result frame hides ([[lintPass]]).
    */
  private[graft] def selectionPass(base: DataFrame,
      centers: Seq[(Long, Seq[Double], Double)]): DataFrame = {
    val dists = centers.map { case (_, cv, cn) =>
      lit(1.0) - cosineFromNorms(col("v"), typedlit(cv), col("n"), lit(cn))
    }
    val minDist = if (dists.size == 1) dists.head else least(dists: _*)
    base.filter(!col("id").isInCollection(centers.map(_._1)))
      .select(col("id"), col("v"), col("n"), minDist.as("d"))
      .agg(max(struct(col("d"), (-col("id")).as("ni"), col("id"),
        col("v"), col("n"))).as("b"))
      .select(col("b.id"), col("b.v"), col("b.n"), col("b.d"))
  }

  /** The lint twin for q_select_kcenter: [[kCenterGreedy]] returns a
    * driver-built k-row frame, so the screened plan must be the per-pass
    * aggregate itself — here with two placeholder centers (the plan
    * shape is center-count-independent; it is never executed).
    */
  private[graft] def lintPass(df: DataFrame, idCol: String,
      vecCol: String): DataFrame =
    selectionPass(prepared(df, idCol, vecCol), Seq(
      (-1L, Seq.fill(8)(0.5), 1.0), (-2L, Seq.fill(8)(-0.5), 1.0)))

  /** The narrow candidate projection every pass scans: (id, vector,
    * norm), non-finite and zero-norm rows dropped (no cosine direction).
    */
  private def prepared(df: DataFrame, idCol: String,
      vecCol: String): DataFrame =
    graft.prep.Preprocessing.spread(df)
      .select(col(idCol).cast("long").as("id"),
        toDoubleArray(col(vecCol)).as("v"))
      .withColumn("n", norm(col("v")))
      .filter(finiteNorm(col("n")) && col("n") > 0)
}
