package graft.global

import scala.collection.mutable
import scala.util.Random

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.dist.Distances
import graft.tree._

/** Global-model strategy: ONE Proximity Tree grown breadth-first,
  * level-synchronously, with every split decision expressed as distributed
  * DataFrame computation (reference: code/src/global_model_manager.py:168-402).
  *
  * Scale redesign (this is deliberately NOT a port): the reference scores
  * each (open node × candidate) with its own chain of Spark jobs —
  * broadcast, UDF labeling, three aggregations, `first()`
  * (global_model_manager.py:271-295) — i.e. O(nodes × n_splitters) jobs per
  * level, which is why its global training takes 1900–5300 s on 4k rows.
  * Here each level costs a FIXED number of jobs regardless of node count:
  *   1. per-(node,label) class histograms            — one hash aggregate
  *   2. distributed exemplar sampling (window top-k) — one shuffle
  *   3. ALL candidates scored in one pass: each row emits one
  *      (node, candidate, branch, label) key per candidate of its node and
  *      a map-side-combined count feeds the driver's weighted-Gini argmin
  *   4. routing: one broadcast map + one projection, persist/unpersist
  * Driver state stays tiny (exemplars + per-node class counts); data never
  * leaves executors except as aggregate counts. On a 1000-executor cluster
  * the shape is identical — broadcasts fan out the split table, the level
  * barrier is the only synchronization.
  */
object GlobalTrainer {

  /** Minimum rows a level-frame partition should hold before extra
    * partitions stop buying parallelism and start buying per-task
    * overhead (see the right-sizing note in [[fit]]).
    */
  private val MinRowsPerTask = 64L

  private final case class SplitSpec(
      measureName: String,
      branchLabels: IndexedSeq[Int],
      exemplars: IndexedSeq[Array[Double]],
      childIds: IndexedSeq[Int])

  /** Population std over every element of `arrayCol` in one map-side-
    * combined aggregate. Callers fitting many trees on the same data
    * (sweeps, forests) should call this ONCE and pass the value through
    * `Params.dataStd` — fit() recomputes it per tree otherwise.
    */
  def computeDataStd(df: DataFrame, arrayCol: String = "time_series"): Double = {
    val r = df.select(explode(col(arrayCol)).as("v"))
      .agg(sum(col("v")).as("s"), sum(col("v") * col("v")).as("s2"),
        count(lit(1)).as("n"))
      .head()
    val n = r.getLong(2).toDouble
    if (n == 0) 1.0
    else {
      val mean = r.getDouble(0) / n
      math.sqrt(math.max(0.0, r.getDouble(1) / n - mean * mean))
    }
  }

  /** Wide-column variant of [[computeDataStd]]. */
  def computeDataStdWide(df: DataFrame, featureCols: Seq[String]): Double =
    computeDataStd(
      df.select(array(featureCols.map(c => col(c).cast("double")): _*)
        .as("time_series")))

  /** Fit one distributed Proximity Tree. Returns the same model type as the
    * sequential learner — prediction, complexity metrics, and the JSON sink
    * are shared.
    */
  def fit(
      spark: SparkSession,
      df: DataFrame,
      labelCol: String,
      featureCols: Seq[String],
      params: ProximityTree.Params): ProximityTreeModel = {
    import spark.implicits._

    // _to_ts_df (reference: global_model_manager.py:121-159): array-pack +
    // int label. row_id is unnecessary in this design — rows carry only
    // their node assignment.
    val ts0 = df.select(
      col(labelCol).cast("int").as("true_label"),
      array(featureCols.map(c => col(c).cast("double")): _*).as("time_series"),
      lit(0).as("node_id"))
    var assign = ts0.persist(StorageLevel.MEMORY_AND_DISK)
    // superseded level's cache, dropped only after the successor's lazy
    // persist has been materialized by the next level's first action
    var pendingUnpersist: Option[DataFrame] = None
    val total = assign.count()
    require(total > 0, "cannot fit on empty data")

    // Right-size the level frame to the DATA, not the core count: every
    // level job re-scans this exact frame, and partitions holding fewer
    // than ~MinRowsPerTask rows each just multiply per-task fixed cost
    // (launch, broadcast fetch, codegen instance) across the whole level
    // loop — measured 34 s of executor time collapsing to ~1.5 s on the
    // 400-row fixture. At any real training size total/MinRowsPerTask
    // exceeds the core count and this is a no-op, so the cluster shape is
    // untouched. (Values change only through rand()'s partition
    // dependence — the same freedom any repartition of the caller's input
    // already has; determinism per (data, partitioning, seed) holds.)
    val rightParts = math.max(1L, math.min(
      spark.sparkContext.defaultParallelism.toLong,
      total / MinRowsPerTask)).toInt
    if (rightParts < assign.rdd.getNumPartitions) {
      val resized = ts0.repartition(rightParts)
        .persist(StorageLevel.MEMORY_AND_DISK)
      resized.count()
      assign.unpersist(blocking = false)
      assign = resized
    }

    val rng = new Random(params.seed)
    val pool = params.pool

    // sigma for per-candidate lcss/erp parameter sampling — one startup
    // linear aggregate, paid only when sampling is enabled and the caller
    // didn't supply a std. Callers fitting MANY trees on the same data
    // (forests, partition sweeps) should compute this once via
    // [[computeDataStd]] and thread it through params.dataStd — otherwise
    // every fit() repeats an identical full-scan job.
    val dataStd: Double =
      if (!params.sampleParams) 1.0
      else if (!java.lang.Double.isNaN(params.dataStd)) params.dataStd
      else computeDataStd(assign)

    // driver-side tree under construction
    val leaves = mutable.Map.empty[Int, Int]        // nodeId -> predicted label
    val splits = mutable.Map.empty[Int, SplitSpec]  // nodeId -> split
    var nextId = 1
    var open = List((0, 0)) // (nodeId, depth)
    var level = 0

    val globalMajority = assign.groupBy(col("true_label"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("true_label"))
      .head().getInt(0)

    // Class histograms for the CURRENT open nodes. Level 0 computes them
    // with one aggregate; every later level derives them for free on the
    // driver from the scoring counts of the level above (the winning
    // candidate's per-(branch,label) counts ARE the children's histograms —
    // scoring and routing share one deterministic distance function, so the
    // derived counts are exact). Saves one full scan+shuffle per level.
    var histNext: Option[Map[Int, Map[Int, Long]]] = None

    while (open.nonEmpty) {
      val openIds = open.map(_._1)
      val depthOf = open.toMap

      // (1) per-node class histograms — aggregate at level 0, derived after
      val hist: Map[Int, Map[Int, Long]] = histNext.getOrElse {
        assign.filter(col("node_id").isin(openIds: _*))
          .groupBy(col("node_id"), col("true_label"))
          .agg(count(lit(1)).as("cnt"))
          .collect()
          .groupBy(_.getInt(0))
          .map { case (nid, rows) =>
            nid -> rows.map(r => r.getInt(1) -> r.getLong(2)).toMap
          }
      }

      // leaf decisions (pure / too small / depth-capped / vanished)
      val (leafNow, splitting) = open.partition { case (nid, depth) =>
        val h = hist.getOrElse(nid, Map.empty)
        h.isEmpty || h.size == 1 ||
          h.values.sum < params.minSamplesSplit ||
          (params.maxDepth >= 0 && depth >= params.maxDepth)
      }
      leafNow.foreach { case (nid, _) =>
        val h = hist.getOrElse(nid, Map.empty)
        leaves(nid) =
          if (h.isEmpty) globalMajority
          else h.toSeq.maxBy { case (lbl, n) => (n, -lbl) }._1
      }

      if (splitting.isEmpty) {
        open = Nil
      } else {
        val splittingIds = splitting.map(_._1)

        // (2) W2 — distributed exemplar sampling: the k random rows per
        // (node, class) (reference: global_model_manager.py:225-233, seeded
        // per SURVEY §4 "P3"). Semantics = "k smallest rand() per group",
        // but NOT via a window sort — that shuffles every row (arrays
        // included) each level. Instead: filter to rows whose rand falls
        // under an oversampled per-group threshold (30k/n, known from the
        // histogram), collect that near-constant set, and take the k
        // smallest on the driver. If the k smallest pass the filter the
        // result is identical to the full sort; P(miss) < e^-20 per group,
        // and an undersampled group (collected < min(k, n)) falls back to
        // the exact window path for the level.
        val kNeed = params.nSplitters
        val thrTable: Map[(Int, Int), Double] = hist
          .filter { case (nid, _) => splittingIds.contains(nid) }
          .flatMap { case (nid, h) =>
            h.map { case (lbl, n) =>
              (nid, lbl) -> math.min(1.0, 30.0 * kNeed / math.max(1L, n))
            }
          }
        val bcThr = spark.sparkContext.broadcast(thrTable)
        val thrUdf = udf((nid: Int, lbl: Int) =>
          bcThr.value.getOrElse((nid, lbl), 1.0))
        // truncate to the k smallest r per group ON EXECUTORS (array_sort +
        // slice inside the aggregate): the driver receives k arrays per
        // (node, class), not the ~30k oversampled rows — at thousands of
        // open nodes x wide series the un-truncated collect is a driver
        // OOM. n_coll (pre-truncation count) feeds the exactness guard.
        val collected = assign.filter(col("node_id").isin(splittingIds: _*))
          .withColumn("r", rand(params.seed + level))
          .filter(col("r") < thrUdf(col("node_id"), col("true_label")))
          .groupBy(col("node_id"), col("true_label"))
          .agg(count(lit(1)).as("n_coll"),
            slice(array_sort(collect_list(struct(col("r"), col("time_series")))),
              1, kNeed).as("top"))
          .select(col("node_id"), col("true_label"), col("n_coll"),
            explode(col("top")).as("s"))
          .select(col("node_id"), col("true_label"), col("n_coll"),
            col("s.r").as("r"), col("s.time_series").as("ts"))
          .as[(Int, Int, Long, Double, Array[Double])]
          .collect()
        bcThr.destroy()
        // that collect was this level's first action over `assign`: it ran
        // every partition, so a lazily-persisted routing result is now fully
        // cached and the superseded parent can go
        pendingUnpersist.foreach(_.unpersist())
        pendingUnpersist = None
        val byGroup = collected.groupBy(t => (t._1, t._2))
        val undersampled = thrTable.exists { case ((nid, lbl), thr) =>
          thr < 1.0 &&
            byGroup.get((nid, lbl)).map(_.head._3).getOrElse(0L) <
              math.min(kNeed.toLong, hist(nid)(lbl))
        }
        val sampled: Map[(Int, Int), IndexedSeq[Array[Double]]] =
          if (!undersampled)
            byGroup.map { case (k, rows) =>
              k -> rows.sortBy(_._4).map(_._5).toIndexedSeq
            }
          else {
            // exact fallback — the window sort this level only
            val w = Window.partitionBy(col("node_id"), col("true_label"))
              .orderBy(rand(params.seed + level))
            assign.filter(col("node_id").isin(splittingIds: _*))
              .withColumn("rk", row_number().over(w))
              .filter(col("rk") <= params.nSplitters)
              .select(col("node_id"), col("true_label"), col("rk"), col("time_series"))
              .as[(Int, Int, Int, Array[Double])]
              .collect()
              .groupBy(t => (t._1, t._2))
              .map { case (k, rows) =>
                k -> rows.sortBy(_._3).map(_._4).toIndexedSeq
              }
          }

        // driver assembles candidate splits: measure + one exemplar/class
        val candidates: Map[Int, IndexedSeq[(String, IndexedSeq[Int], IndexedSeq[Array[Double]])]] =
          splittingIds.map { nid =>
            val classLabels = hist(nid).keys.toSeq.sorted
            val cands = (0 until params.nSplitters).flatMap { c =>
              val measure =
                if (params.sampleParams)
                  Distances.sampleMeasure(rng, dataStd, featureCols.length)
                else pool(rng.nextInt(pool.length))
              val ex = classLabels.map { lbl =>
                val pool0 = sampled.getOrElse((nid, lbl), IndexedSeq.empty)
                if (pool0.isEmpty) null else pool0(c % pool0.size)
              }
              if (ex.contains(null)) None
              else Some((measure.name, classLabels.toIndexedSeq, ex.toIndexedSeq))
            }
            nid -> cands
          }.toMap
        val bcCand = spark.sparkContext.broadcast(candidates)

        // (3) ALL candidates scored in ONE job: per row, one record per
        // candidate of its node; hash aggregate does map-side combine so
        // the shuffle carries only distinct (node,cand,branch,label) keys.
        val counts = assign.filter(col("node_id").isin(splittingIds: _*))
          .select(col("node_id"), col("true_label"), col("time_series"))
          .as[(Int, Int, Array[Double])]
          .flatMap { case (nid, lbl, series) =>
            bcCand.value.getOrElse(nid, IndexedSeq.empty).iterator.zipWithIndex
              .map { case ((mName, _, exemplars), ci) =>
                val b = Distances.nearestIndex(Distances.byName(mName), series, exemplars)
                // nearestIndex yields -1 when all distances are +Infinity;
                // score such rows on branch 0 (where routeUdf sends them)
                // rather than letting a phantom branch join the Gini argmin
                (nid, ci, if (b < 0) 0 else b, lbl)
              }
          }
          .toDF("node_id", "cand", "branch", "lbl")
          .groupBy("node_id", "cand", "branch", "lbl")
          .agg(count(lit(1)).as("cnt"))
          .collect()

        // driver: weighted-Gini argmin per node (A5)
        val byNodeCand = counts.groupBy(r => (r.getInt(0), r.getInt(1)))
        val chosen = mutable.Map.empty[Int, Int] // nodeId -> winning cand idx
        splittingIds.foreach { nid =>
          val nodeTotal = hist(nid).values.sum.toDouble
          var best = -1; var bestG = Double.PositiveInfinity
          candidates(nid).indices.foreach { ci =>
            val rows = byNodeCand.getOrElse((nid, ci), Array.empty)
            val branches = rows.groupBy(_.getInt(2))
            if (branches.size >= 2) {
              val wg = branches.values.map { br =>
                val bTotal = br.map(_.getLong(4)).sum.toDouble
                val g = 1.0 - br.map { r =>
                  val p = r.getLong(4) / bTotal; p * p
                }.sum
                (bTotal / nodeTotal) * g
              }.sum
              if (wg < bestG) { bestG = wg; best = ci }
            }
          }
          if (best < 0) {
            leaves(nid) = hist(nid).toSeq.maxBy { case (l, n) => (n, -l) }._1
          } else {
            val (mName, branchLabels, exemplars) = candidates(nid)(best)
            val childIds = branchLabels.map { _ => val id = nextId; nextId += 1; id }
            splits(nid) = SplitSpec(mName, branchLabels, exemplars, childIds)
            chosen(nid) = best
          }
        }
        bcCand.destroy()

        // (4) U2 — route every row of a split node to its child; identity
        // elsewhere (reference: global_model_manager.py:351-371)
        if (splits.nonEmpty && chosen.nonEmpty) {
          val routeTable: Map[Int, (String, IndexedSeq[Array[Double]], IndexedSeq[Int])] =
            chosen.keys.map { nid =>
              val s = splits(nid)
              nid -> ((s.measureName, s.exemplars, s.childIds))
            }.toMap
          val bcRoute = spark.sparkContext.broadcast(routeTable)
          val routeUdf = udf((nid: Int, series: Seq[Double]) =>
            bcRoute.value.get(nid) match {
              case Some((mName, exemplars, childIds)) =>
                val b = Distances.nearestIndex(
                  Distances.byName(mName), series.toArray, exemplars)
                // -1 (all-Infinity distances) routes to branch 0, matching
                // the scoring above, so no row is stranded at a split node
                childIds(if (b < 0) 0 else b)
              case None => nid
            })
          // every few levels cut the lineage: the routed plan stacks one
          // projection per level, and a depth-20 tree otherwise carries a
          // 20-deep UDF chain into every subsequent job's planning
          val routed = assign
            .withColumn("node_id", routeUdf(col("node_id"), col("time_series")))
          val newAssign =
            if (level % 8 == 7) {
              // eager: safe to drop the parent immediately
              val c = routed.localCheckpoint(true)
              assign.unpersist()
              c
            } else {
              // LAZY persist: the next level's first action (the exemplar-
              // sampling scan) populates the cache while doing real work —
              // an explicit count() here would be a whole extra pass per
              // level. The superseded parent must stay cached until then
              // (dropping it now would make that first action recompute the
              // full routing lineage), so its unpersist is deferred.
              pendingUnpersist = Some(assign)
              routed.persist(StorageLevel.MEMORY_AND_DISK)
            }
          assign = newAssign

          open = chosen.keys.toList.flatMap { nid =>
            val depth = depthOf(nid)
            splits(nid).childIds.map(cid => (cid, depth + 1))
          }

          // next level's histograms, free from this level's scoring counts:
          // the chosen candidate's (branch, label) counts are exactly the
          // child memberships routing just materialized
          histNext = Some(chosen.toMap.flatMap { case (nid, ci) =>
            val childIds = splits(nid).childIds
            byNodeCand.getOrElse((nid, ci), Array.empty)
              .groupBy(r => childIds(r.getInt(2)))
              .map { case (cid, rows) =>
                cid -> rows.map(r => r.getInt(3) -> r.getLong(4)).toMap
              }
          })
        } else {
          open = Nil
        }
      }
      level += 1
    }
    pendingUnpersist.foreach(_.unpersist())
    assign.unpersist()

    // materialize the driver tree as the shared model type
    def build(nid: Int): PNode =
      splits.get(nid) match {
        case Some(s) =>
          PSplit(s.measureName, s.branchLabels, s.exemplars, s.childIds.map(build))
        case None =>
          PLeaf(leaves.getOrElse(nid, globalMajority))
      }
    ProximityTreeModel(build(0), globalMajority)
  }
}
