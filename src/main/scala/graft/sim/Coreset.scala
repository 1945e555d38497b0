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

  /** [[kCenterGreedy]] at large k — the documented IVF-cell composition
    * (r17 verdict task 3), now implemented: assign every vector to its
    * nearest centroid of a FROZEN broadcast-sized quantizer (argmax
    * cosine, centroid-id-ascending ties — the [[SemanticDedup]]
    * assignment shape), then advance the greedy selection inside EVERY
    * cell simultaneously with a per-cell budget, and union the centers.
    * Output: (cell, sel_rank, id, sel_dist), sel_rank/sel_dist the
    * within-cell Gonzalez sequence (per-cell min-id anchor at rank 1).
    *
    * Scale shape: kPerCell-1 passes, each ONE aggregate over the
    * persisted assigned frame grouped by cell (map-side combine down to
    * nCells rows — no shuffle of data rows, no data-scale window, no
    * join); every cell advances one center per pass, so selecting
    * nCells × kPerCell total centers costs O(n · kPerCell²) distance
    * arithmetic where the flat loop's O(n · k²) at the same total k
    * would be nCells² times more — the turn from a driver loop into
    * cell-parallel work. Chosen centers ride into the next pass as a
    * broadcast map (nCells × kPerCell × dim doubles — tiny).
    *
    * Deterministic end to end (frozen centroids, min-id anchors,
    * lower-id ties), so the DuckDB oracle (q_select_kcenter_cells)
    * replays the assignment AND every greedy level bit-for-bit. Cells
    * with fewer members than the budget exhaust gracefully; non-finite
    * and zero-norm vectors drop at prep.
    */
  def kCenterPerCell(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      kPerCell: Int,
      centroids: DataFrame,
      cidCol: String,
      centroidVecCol: String): DataFrame = {
    require(kPerCell >= 1, s"kPerCell must be >= 1, got $kPerCell")
    val spark = df.sparkSession
    import spark.implicits._
    val base = assignedCells(df, idCol, vecCol, centroids, cidCol,
      centroidVecCol).persist()
    try {
      // per-cell anchor: the min-id member (struct-min — id leads; the
      // trailing fields only carry the vector/norm forward)
      var sel: Map[Long, Vector[(Long, Seq[Double], Double, Double)]] =
        base.groupBy(col("cell"))
          .agg(min(struct(col("id"), col("v"), col("n"))).as("a"))
          .select(col("cell"), col("a.id"), col("a.v"), col("a.n"))
          .collect()
          .map(r => r.getLong(0) ->
            Vector((r.getLong(1), r.getSeq[Double](2), r.getDouble(3), 0.0)))
          .toMap
      var pass = 1
      var advanced = sel.nonEmpty
      while (advanced && pass < kPerCell) {
        val picked = perCellPass(base, sel).collect()
        advanced = picked.nonEmpty
        picked.foreach { r =>
          val cell = r.getLong(0)
          sel += cell -> (sel(cell) :+
            ((r.getLong(1), r.getSeq[Double](2), r.getDouble(3),
              r.getDouble(4))))
        }
        pass += 1
      }
      sel.toSeq.flatMap { case (cell, centers) =>
        centers.zipWithIndex.map { case ((id, _, _, d), i) =>
          (cell, i + 1L, id, d)
        }
      }.toDF("cell", "sel_rank", "id", "sel_dist")
        .select(col("cell"), col("sel_rank"), col("id"),
          round(col("sel_dist"), 6).as("sel_dist"))
    } finally {
      base.unpersist(blocking = false)
      ()
    }
  }

  /** The frozen-quantizer assignment: argmax cosine over the broadcast
    * centroid set, ties to the ascending centroid id — the
    * [[SemanticDedup.keepFlags]] stage-1 shape, replayed by the oracle
    * as the same windowed argmax over interpolated centroid literals.
    * The window partitions by VECTOR id (k rows per partition — no skew
    * at any corpus size).
    */
  private[graft] def assignedCells(df: DataFrame, idCol: String,
      vecCol: String, centroids: DataFrame, cidCol: String,
      centroidVecCol: String): DataFrame = {
    val c = centroids
      .select(col(cidCol).cast("long").as("__cid"),
        toDoubleArray(col(centroidVecCol)).as("__c"))
      .withColumn("__nc", norm(col("__c")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("__sim").desc, col("__cid").asc)
    prepared(df, idCol, vecCol)
      .crossJoin(broadcast(c))
      .select(col("id"), col("v"), col("n"), col("__cid"),
        cosineFromNorms(col("v"), col("__c"), col("n"), col("__nc"))
          .as("__sim"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("id"), col("v"), col("n"), col("__cid").as("cell"))
  }

  /** One simultaneous per-cell greedy pass: min cosine distance to the
    * cell's OWN chosen centers (broadcast map; same left-fold dot /
    * precomputed-norm arithmetic as [[Vectors.cosineFromNorms]], so the
    * oracle's min-aggregate over joined center rows sees identical
    * doubles), then ONE groupBy(cell) struct-max — d DESC, id ASC ties,
    * exactly the flat [[selectionPass]] contract per cell.
    */
  private[graft] def perCellPass(base: DataFrame,
      sel: Map[Long, Vector[(Long, Seq[Double], Double, Double)]]): DataFrame = {
    val spark = base.sparkSession
    val bc = spark.sparkContext.broadcast(sel.map { case (cell, cs) =>
      cell -> cs.map { case (_, cv, cn, _) => (cv.toArray, cn) }.toArray
    })
    val chosen = sel.valuesIterator.flatMap(_.map(_._1)).toSeq
    val minDist = udf((cell: Long, v: Seq[Double], n: Double) => {
      val cs = bc.value.getOrElse(cell, Array.empty[(Array[Double], Double)])
      var best = Double.PositiveInfinity
      var ci = 0
      while (ci < cs.length) {
        val (cv, cn) = cs(ci)
        var dot = 0.0
        var i = 0
        val m = math.min(cv.length, v.length)
        while (i < m) { dot += cv(i) * v(i); i += 1 }
        val d = 1.0 - (if (n * cn > 0) dot / (n * cn) else 0.0)
        if (d < best) best = d
        ci += 1
      }
      best
    })
    base.filter(!col("id").isInCollection(chosen))
      .select(col("cell"), col("id"), col("v"), col("n"),
        minDist(col("cell"), col("v"), col("n")).as("d"))
      .groupBy(col("cell"))
      .agg(max(struct(col("d"), (-col("id")).as("ni"), col("id"),
        col("v"), col("n"))).as("b"))
      .select(col("cell"), col("b.id"), col("b.v"), col("b.n"), col("b.d"))
  }

  /** The lint twin for q_select_kcenter_cells: the returned frame is
    * driver-built, so the screened plan is the per-pass shape itself —
    * assignment + one placeholder-center pass (never executed).
    */
  private[graft] def lintPerCellPass(df: DataFrame, idCol: String,
      vecCol: String, centroids: DataFrame, cidCol: String,
      centroidVecCol: String): DataFrame =
    perCellPass(
      assignedCells(df, idCol, vecCol, centroids, cidCol, centroidVecCol),
      Map(0L -> Vector((-1L, Seq.fill(8)(0.5), 1.0, 0.0))))

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
