package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Catalog-wide plan linter: every query in the driver contract gets its
  * physical plan screened for scale-hostile operators. A cartesian product
  * or an unbounded broadcast-nested-loop join that sneaks into a future
  * query fails HERE, at test scale, instead of on a cluster.
  *
  * Allowlist = queries whose non-equi/cross shapes are deliberate and
  * bounded, each with the reason it is scale-safe.
  */
class CatalogPlanLintSpec extends AnyFunSuite with SparkSpec {

  private val d = "/root/testdata/sf0.001"

  /** Queries whose runtime path materializes mid-plan (localCheckpoint /
    * sketch build at construction) are screened via their `lintVariants`
    * twin — same logical content, stage boundary elided — so NOTHING in
    * the catalog escapes the lint. The twins live next to the queries
    * (DedupQueries.lintVariants, TextQueries.lintVariants); this spec
    * fails if a twin goes stale or a new eager query ships without one.
    */
  private val lintVariants: Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] =
    graft.dedup.DedupQueries.lintVariants ++ graft.text.TextQueries.lintVariants ++
      graft.quality.QualityQueries.lintVariants

  /** The screened catalog: every driver-contract query, with the eager
    * ones swapped for their declarative twins.
    */
  private def screened =
    graft.SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> lintVariants.getOrElse(name, fn)
    }

  /** (query, reason the flagged shape is bounded by design). */
  private val allowed: Map[String, String] = Map(
    "q_dedup_cosine_exact" -> "documented O(n^2) small-data twin (block-pair exact baseline)",
    "q_knn_brute" -> "brute-force baseline; query side bounded to 10 vectors by design",
    "q_hard_negatives" -> "the q_knn_brute shape with the label inequality fused into the predicate; broadcast side bounded to 10 query vectors",
    "q11_important_parts" -> "cross join against a broadcast 1-row scalar aggregate",
    "q15_top_supplier" -> "cross join against a broadcast 1-row max aggregate",
    "q22_idle_customers" -> "cross join against a broadcast 1-row average aggregate",
    "q_text_bm25" -> "cross join against the broadcast 1-row corpus-stats aggregate",
    "q_text_bm25_rel" -> "cross join against the broadcast 1-row corpus-stats aggregate",
    "q_text_bm25_index" -> "cross join against the broadcast 1-row spine-stats aggregate (the q_text_bm25_rel shape served from the stored index)",
    "q_text_bm25_mutable" -> "same stored-index shape as q_text_bm25_index with the tombstone anti join added (sidecar-bounded)",
    "q_text_lm_score" -> "cross join against the broadcast 1-row vocabulary-size aggregate",
    "q_vec_quantize" -> "cross join against the broadcast 1-row per-dim min/max aggregate",
    "q_text_boilerplate" -> "fractional df-cap cross-joins the broadcast 1-row corpus count onto the gram-df frame",
    "q_corpus_build" -> "same boilerplate df-cap shape as q_text_boilerplate, repeated per consuming subtree in the unmaterialized lint twin (runtime plan checkpoints the cleaned corpus once)",
    "q_text_heavy_hitters" -> "cross join against the broadcast 1-row total-token-count aggregate",
    "q_knn_lsh" -> "recall invariant joins ANN vs brute-force twin; brute side bounded to 10 query vectors",
    "q_knn_ivf" -> "recall invariant joins ANN vs brute-force twin; brute side bounded to 10 query vectors",
    "q_knn_ivf_index" -> "recall invariant joins the persistent-index probe vs brute twin; brute side bounded to 10 query vectors (index side is equi on cell under partition pruning)",
    "q_knn_quantized" -> "recall invariant joins quantized vs float brute twin; query sides bounded to 10 vectors; stats cross join is a broadcast 1-row aggregate",
    "q_knn_ivf_quantized" -> "recall invariant joins quantized IVF vs brute twin; query side bounded to 10 vectors; stats cross join is a broadcast 1-row aggregate",
    "q_knn_pq" -> "recall invariant joins PQ+refine vs brute twin; ADC pass and brute side both bounded to 10 query vectors; refine join is equi on neighbor_id",
    "q_knn_binary" -> "recall invariant joins binary+refine vs brute twin; Hamming pass and brute side both bounded to 10 query vectors; refine join is equi on neighbor_id (the q_knn_pq shape)",
    "q_knn_binary_adc" -> "the q_knn_binary shape three times (saturated ADC, starved ADC, starved symmetric) vs one brute twin, all query-bounded; the three 1-row recall scalars cross-join for the invariant readout",
    "q_knn_ivf_binary" -> "recall invariant joins the IVF+binary stack vs brute twin; Hamming pass is equi on cell with the 10-query probe set broadcast; refine join is equi on neighbor_id",
    "q_knn_wide" -> "recall invariant joins wide-dim IVF+SQ8 vs brute twin; query side bounded to 10 vectors; stats cross join is a broadcast 1-row aggregate",
    "q_dedup_semantic" -> "centroid-assignment cross join against the frozen 32-row trained-centroid local relation",
    "q_select_kcenter_cells" -> "the q_dedup_semantic centroid-assignment cross join (frozen 32-row quantizer); the per-cell pass itself is one groupBy(cell) aggregate",
    "q_dedup_cosine_recall" -> "recall query joins the LSH path against the documented exact twin",
    "q_dedup_cluster_repair" -> "cross join of two broadcast 1-row aggregates: the healed keep-set fingerprint and the maintenance-ledger arc summary",
    "q_dq_outliers" -> "cross join against the broadcast 1-row mean/sigma stats aggregate",
    "q_select_importance" -> "ratio table crosses the broadcast 1-row gram-total aggregate; scoring join is equi on bucket against the broadcast <=256-row ratio table",
    "q_select_gumbel" -> "the q_select_importance shape (broadcast 1-row gram-total cross; equi bucket join); the Gumbel draw is a pure projection over the scored frame",
    "q_select_lm_band" -> "band cut crosses the broadcast 1-row p10/p90 percentile aggregate (the q_winsorize fence idiom); LM scoring itself is the q_text_lm_score equi-join shape",
    "q_select_dsir_served" -> "the q_select_importance shape with the ratio chain trained on the %5<>1 slice: cross join against the broadcast 1-row gram-total aggregate; held-out scoring is equi on bucket against the broadcast <=256-row frozen ratio table",
    "q_text_lm_served" -> "the q_text_lm_score shape split across the train/serve slices: cross join against the broadcast 1-row vocabulary-size scalar from the frozen trainCounts",
    "q_select_mix" -> "the 20-row per-source rate table crosses the broadcast 1-row total/weight-sum aggregate; the admit join is equi on source against the broadcast rate table",
    "q_select_pipeline" -> "the composed funnel inherits exactly its stages' own adjudicated shapes: the q_quality_lr_multi 1-row stats cross, the q_select_gumbel ratio-broadcast/tot-cross, the q_text_lm_score 1-row vocab cross and q_select_lm_band 1-row fence cross (both over the k-row resampled subset), and the q_select_kcenter_cells frozen 32-row centroid-assignment cross",
    "q_select_funnel" -> "the q_select_pipeline composition plus the q_select_mix tail over the <=64-row diversified survivors: the survivor ids broadcast into the documents join, the per-source rate table crosses the broadcast 1-row total/weight-sum aggregate, and the admit join is equi on source against the broadcast rates",
    "q_quality_lr_multi" -> "cross join against the broadcast 1-row decimal-summed standardization-stats aggregate feeding the feature expressions",
    "q_quality_lr_softmax" -> "the q_quality_lr_multi standardization shape (broadcast 1-row stats cross join); the coupled gradient pass itself is one aggregate",
    "q_skew_profile" -> "cross join of the broadcast 1-row total/nkeys aggregate onto the 20-row TakeOrdered result",
    "q_domain_stats" -> "cross join against the broadcast 1-row corpus-total aggregate for per-domain share",
    "q_ndv_incremental" -> "cross join of two broadcast 1-row sketch/exact aggregates for the invariant row",
    "q_stats_incremental" -> "cross join of the column-count-sized stats table against the broadcast 1-row exact-NDV aggregate (invariant flag)",
    "q_pagerank" -> "per-iteration cross join against ONE combined broadcast 1-row scalar (dangling mass x node count) — the standard distributed PageRank decomposition; edge/rank joins are equi",
    "q_triangles" -> "summary row crosses three broadcast 1-row aggregates (nodes, edges, triangles); triangle enumeration itself is two equi self-joins",
    "q_profile_robust" -> "cross join against the broadcast 1-row percentile aggregate (the adjudicated q_dq_outliers two-pass shape)",
    "q_winsorize" -> "cross join against the broadcast 1-row p01/p99 aggregate feeding the clipping projection",
    "q_split_leakage" -> "cross joins against the broadcast 1-row temporal-fence percentile aggregate (the q_winsorize shape)",
    "q_text_tfidf" -> "cross join against the broadcast 1-row corpus-count aggregate (the q_text_bm25 shape)",
    "q_histogram_eqdepth" -> "cross join against the broadcast 1-row quartile-fence aggregate",
    "q_psi_drift" -> "both sides cross-join the broadcast 1-row reference-fence aggregate (binning protocol)",
    "q_join_size_est" -> "cross join against the broadcast 1-row predicted-total aggregate for per-key share",
    "q_ab_test" -> "cross of the two 1-row arm-moment frames (control x treatment readout)",
    "q_parquet_bloom_stats" -> "cross join against the broadcast 1-row sorted probe-set array aggregate (the q_minmax broadcast-scalar pattern)",
    "q_zorder_layout" -> "layoutBoxes crosses the broadcast 1-row leading-key min/max span aggregate (the deterministic bin protocol)",
    "q_cms_freq" -> "cross join against the broadcast 1-row count-min sketch aggregate (O(depth*width) grid; probes never shuffle)",
    "q_quantile_hist" -> "crosses the broadcast 1-row init-batch fence, total-count scalar, and 3-row rational-target frame onto the 32-bin histogram (binning protocol, the q_psi_drift shape)",
    "q_text_cosine" -> "cross join against the broadcast 1-row corpus-count aggregate feeding the idf (the q_text_bm25 shape)",
    "q_text_nb" -> "crosses the broadcast 1-row vocabulary/train-count scalars and the per-class prior frame — rows bounded by label cardinality, not data size",
    "q_dtw_topk" -> "LB/DTW passes cross the broadcast query-envelope frame (query-bounded) and the 1-row corpus-count scalar; per-query caps join is equi on qid — the q_knn brute-twin shape")

  test("lint variants cover a live query and never go stale") {
    val gone = lintVariants.keySet.diff(graft.SparkEntry.queries.keySet)
    assert(gone.isEmpty, s"lint variant for absent query: $gone")
  }

  test("no catalog query plans a cartesian or nested-loop join off-allowlist") {
    val offenders = screened.flatMap {
      case (name, fn) =>
        if (allowed.contains(name)) None
        else {
          // sparkPlan (pre-AQE-finalization) suffices: Cartesian/BNLJ are
          // join-STRATEGY choices visible before adaptive re-planning, and
          // not executing keeps the lint fast across the whole catalog
          val plan =
            try fn(spark, d).queryExecution.sparkPlan.toString
            catch { case e: Throwable => s"PLANNING FAILED: $e" }
          if (plan.contains("CartesianProduct") ||
              plan.contains("BroadcastNestedLoopJoin") ||
              plan.startsWith("PLANNING FAILED"))
            Some(name -> plan.linesIterator
              .filter(l => l.contains("CartesianProduct") ||
                l.contains("BroadcastNestedLoopJoin") ||
                l.contains("PLANNING FAILED"))
              .mkString("; "))
          else None
        }
    }
    assert(offenders.isEmpty,
      offenders.map { case (n, l) => s"$n: $l" }.mkString("\n"))
  }

  test("allowlist entries still exist in the catalog (no stale excuses)") {
    val gone = allowed.keySet.diff(graft.SparkEntry.queries.keySet)
    assert(gone.isEmpty, s"allowlisted but absent: $gone")
  }

  /** Queries that legitimately hint a scale-proportional subtree, with the
    * reason the hint is safe.
    */
  private val hintAllowed: Map[String, String] = Map(
    "q_events_enrich" -> ("enrichStream gates the hint on the dim's " +
      "estimated plan size (256 MB cap) — an outgrown dim drops the hint"),
    "q_knn_brute" -> "broadcast side is the query set, bounded to 10 vectors by the pushed filter",
    "q_hard_negatives" -> "broadcast side is the query set, bounded to 10 vectors by the pushed filter (the q_knn_brute shape)",
    "q_knn_lsh" -> "broadcast side is the query set, bounded to 10 vectors by the pushed filter",
    "q_knn_ivf" -> "broadcast sides are the 10-vector query set and k centroids",
    "q_knn_ivf_index" -> "broadcast side is the 10-vector query set, bounded by the pushed filter (IvfIndex.search probe join)",
    "q_knn_quantized" -> "broadcast sides are the 10-vector query set and the 1-row stats aggregate",
    "q_knn_ivf_quantized" -> "broadcast sides are the 10-vector query set, k centroids, and the 1-row stats aggregate",
    "q_knn_pq" -> "broadcast side is the query set, bounded to 10 vectors by the pushed filter (codebooks ride the closure, not a join)",
    "q_knn_binary" -> "broadcast sides are the 10-vector query set's bit codes (Hamming pass) and float vectors (refine) — both query-bounded; planes ride the closure, not a join",
    "q_knn_binary_adc" -> "the q_knn_binary broadcast sides three times over (saturated ADC, starved ADC, starved symmetric) — query projections/bit codes and refine floats, all bounded to the 10-vector query set",
    "q_knn_ivf_binary" -> "broadcast sides are the 10-vector query probe set (bit codes + probed cells) and float vectors (refine) — query-bounded; centroids and planes ride the closure",
    "q_knn_wide" -> "broadcast sides are the 10-vector query set, k centroids, and the 1-row stats aggregate (q_knn_ivf_quantized at dim 1536)",
    "q_text_bm25_rel" -> "broadcast side is the per-term df aggregate — rows bounded by the query term count",
    "q_text_bm25_index" -> ("broadcast sides are the query-term relation and the per-term " +
      "df aggregate over index postings — both bounded by the query term count"),
    "q_text_bm25_mutable" -> ("q_text_bm25_index's hinted sides plus the tombstone " +
      "sidecar (deletes-since-last-compact — the DV mask bound)"),
    "q_dpp" -> ("broadcast side is DISTINCT order-months after a triple selective filter — " +
      "bounded by the calendar (~84 values over the 7-year range), not by data size; " +
      "the broadcast-hash join is what carries the dynamicpruning subquery into the fact scan"),
    "q_group_standardize" -> ("broadcast side is the per-flag moments aggregate — " +
      "rows bounded by return-flag cardinality (3), not by data size"),
    "q_select_pipeline" -> ("hinted sides are stage outputs bounded by the " +
      "pipeline knobs, not data size: the Gumbel TakeOrdered result " +
      "(pipeGumbelK = 60 rows — the hint carries a LIMIT the lint's leaf " +
      "walk cannot see), the 1-row LM fence aggregate, and the stages' " +
      "own adjudicated hints (DSIR ratio table <= 256 buckets, 1-row " +
      "stats/vocab scalars)"),
    "q_select_mix" -> ("broadcast side is the per-source acceptance-rate " +
      "table — rows bounded by source cardinality (20), not data size " +
      "(the q_group_standardize shape); its inner cross is the broadcast " +
      "1-row total/weight-sum aggregate"),
    "q_select_funnel" -> ("q_select_pipeline's hinted knob-bounded stage " +
      "outputs, plus the funnel tail's: the diversified-survivor id set " +
      "(<= kPerCell x 32 rows) hinted into the documents join, and the " +
      "q_select_mix rate table (survivor-source-bounded) with its 1-row " +
      "total/weight-sum cross"),
    "q_select_importance" -> ("broadcast side is the bucket log-ratio table — a " +
      "groupBy(bucket) aggregate bounded to dsirBuckets (256) rows by the hash " +
      "modulus, not by data size (plus the 1-row gram-totals scalar)"),
    "q_select_gumbel" -> ("the q_select_importance hinted sides (256-row bucket " +
      "ratio table + 1-row gram totals); the Gumbel key adds no join"),
    "q_select_dsir_served" -> ("broadcast side is the FROZEN bucket log-ratio " +
      "table — bounded to dsirBuckets (256) rows by the hash modulus, trained " +
      "once at rebuild cadence from the %5<>1 slice (the q_select_importance " +
      "hinted side, served); plus the 1-row gram-totals scalar"),
    "q_merge_on_read" -> ("applyDv GATES the hint on the DV mask's estimated size " +
      "(256 MB cap, the enrichStream doctrine) — a fold-starved sidecar degrades to " +
      "a keyed shuffle join; in production the mask is deltas-since-last-fold, " +
      "simulated here from filtered orders"),
    "q_dv_mask_stats" -> ("same gated applyDv mask broadcast as q_merge_on_read; " +
      "sidecar bounded by deltas-since-last-fold"),
    "q_dv_asof" -> ("three per-version gated applyDv mask broadcasts (one per " +
      "as-of state) — each sidecar bounded by deltas-since-last-fold, " +
      "simulated here from filtered orders"),
    "q_dv_change_feed" -> ("changesOf's gated broadcasts: two applyDv masks " +
      "(live-at-from/to) plus the window's new-mask key set — all sidecar-bounded"),
    "q_pos_delete" -> ("both hints are the GATED sidecar broadcasts (256 MB cap, " +
      "shuffle fallback): scanWithPositionMask's (file, ordinal) anti-join side " +
      "and applyDv's equality mask — each bounded by deltas-since-last-fold"),
    "q_join_mv" -> ("same gated applyDv mask broadcast as q_merge_on_read on the " +
      "maintained view's read path; sidecar bounded by CDC'd keys since last fold"),
    "q_dedup_lsh_index" -> ("all three hinted sides are probe-batch- or candidate-" +
      "bounded (batch band postings, candidate pairs, batch shingles), each behind " +
      "LshIndex's 256 MB gate with shuffle fallback — the index side never shuffles"),
    "q_zorder_layout" -> ("broadcast sides are layoutBoxes' per-range-partition " +
      "count/offset frames — rows bounded by rangePartitions (32), not data size"),
    "q_text_nb" -> ("broadcast side is the per-class prior/default aggregate — " +
      "rows bounded by label cardinality (languages), not data size"),
    "q_dtw_topk" -> ("broadcast sides are the query-envelope frame " +
      "(query-bounded by queryPred), the k·|queries| per-query DTW caps, " +
      "and the 1-row corpus-count scalar — never the corpus"))

  /** Queries whose plans legitimately contain an UNPARTITIONED window,
    * with the reason the frame under it is bounded (metadata scale or
    * k-row scale), never data scale. Everything else in the catalog must
    * window under a partitionBy — an unpartitioned WindowExec funnels the
    * whole frame through ONE task, the classic invisible-at-test-scale
    * cluster killer (round-13 verdict finding #4; layoutBoxes was the
    * last data-scale offender and is now rewritten).
    */
  private val windowAllowed: Map[String, String] = Map(
    "q_chi_square" -> "windows over the contingency-cell frame — rows bounded by flag x segment cardinality, not data size",
    "q_col_entropy" -> "window over the per-category counts frame — category cardinality",
    "q_compaction_plan" -> "cumulative-bytes window over the per-FILE metadata frame (~800k rows at 100 TB / 128 MB files; Compaction.scala:41-45 adjudication)",
    "q_compaction_bins" -> "same per-file metadata frame as q_compaction_plan",
    "q_mix_divergence" -> "windows over the per-domain token aggregate — domain cardinality",
    "q_mix_sample" -> "windows over the per-domain token aggregate — domain cardinality",
    "q_mix_temperature" -> "windows over the per-domain token aggregate — domain cardinality",
    "q_mix_weights" -> "windows over the per-domain token aggregate — domain cardinality",
    "q_mix_weights_bpe" -> "windows over the per-domain BPE-token aggregate — domain cardinality",
    "q_retention_plan" -> "max(version) over the snapshot-version listing — versions-retained scale",
    "q_skew_profile" -> "rank/cum-share windows over the 20-row TakeOrdered result (round-12 verdict shape)",
    "q_text_zipf" -> "row_number over the top-100 TakeOrdered token frame feeding the log-log fit",
    "q_woe_encode" -> "event/nonevent totals window over the per-category frame — category cardinality",
    "q_zorder_layout" -> "offset/total windows over layoutBoxes' per-bin counts frame — <= bins (32) rows, metadata scale",
    "q_quantile_hist" -> "cumulative window over the merged 32-bin histogram — bin cardinality, metadata scale")

  test("no catalog query plans an unpartitioned window off-allowlist") {
    import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
    val offenders = screened.flatMap {
      case (name, fn) =>
        if (windowAllowed.contains(name)) None
        else {
          val bad =
            try fn(spark, d).queryExecution.sparkPlan.collect {
              case w: WindowExec if w.partitionSpec.isEmpty =>
                w.windowExpression.map(_.sql).mkString(",").take(120)
              case w: WindowGroupLimitExec if w.partitionSpec.isEmpty =>
                s"WindowGroupLimit(${w.rankLikeFunction.sql})"
            } catch { case e: Throwable => Seq(s"PLANNING FAILED: $e") }
          if (bad.isEmpty) None else Some(name -> bad.mkString("; "))
        }
    }
    assert(offenders.isEmpty,
      offenders.map { case (n, l) => s"$n: $l" }.mkString("\n"))
  }

  test("window allowlist entries still exist in the catalog") {
    val gone = windowAllowed.keySet.diff(graft.SparkEntry.queries.keySet)
    assert(gone.isEmpty, s"allowlisted but absent: $gone")
  }

  test("pipeline/funnel production fetches honor the bounded-collect contract " +
    "(r21 VERDICT item 9: the shipped lint=false branches, not just the twins)") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    // the caps must be query constants, small enough that the driver
    // collect and the isin list stay metadata-scale at ANY corpus size
    val caps = graft.quality.QualityQueries.lintFetchCaps
    assert(caps.nonEmpty && caps.values.forall(c => c > 0 && c <= 256),
      s"fetch caps must be small query constants: $caps")
    // the shared fetch definition must (a) refuse an over-cap id set and
    // (b) plan as a pushed In() filter on the parquet scan — the
    // row-group-skipping shape the production branches ship
    val ids = (1L to 3L).toSeq
    intercept[IllegalArgumentException] {
      graft.quality.QualityQueries.idFetch(
        graft.ops.Tables.documents(spark, d), "doc_id", ids, cap = 2,
        what = "lint probe")
    }
    val fetches = Seq(
      ("doc_id", graft.quality.QualityQueries.idFetch(
        graft.ops.Tables.documents(spark, d), "doc_id", ids, cap = 64,
        what = "lint probe")
        .select(org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.col("text"))),
      ("vec_id", graft.quality.QualityQueries.idFetch(
        graft.ops.Tables.embeddings(spark, d), "vec_id", ids, cap = 64,
        what = "lint probe")))
    fetches.foreach { case (idCol, df) =>
      val scans = df.queryExecution.sparkPlan.collect {
        case f: FileSourceScanExec => f.metadata.getOrElse("PushedFilters", "")
      }
      assert(scans.nonEmpty && scans.exists(_.contains(s"In($idCol")),
        s"fetch on $idCol does not push its isin filter to the scan: $scans")
    }
  }

  test("no catalog query force-broadcasts a scale-proportional table off-allowlist") {
    // BroadcastGatingSpec doctrine, catalog-wide: constant dims (nation,
    // region) may carry forced hints; anything that grows with the data
    // must not — a forced broadcast of a 15M-row side is an executor OOM
    // at sf100, invisible at test scale where it still fits.
    val constantDims = Set("n_nationkey", "r_regionkey")
    val offenders = screened.flatMap {
      case (name, fn) =>
        if (hintAllowed.contains(name)) None
        // An analysis failure is an OFFENSE, not a skip: a query that can't
        // analyze would otherwise silently escape this lint (it already
        // fails the strategy lint above, but each gate reports its own).
        else (try Right(fn(spark, d).queryExecution.analyzed)
              catch { case e: Throwable =>
                Left(s"ANALYSIS FAILED: ${e.toString.take(200)}") }) match {
          case Left(err) => Some(name -> err)
          case Right(analyzed) =>
          val bad = analyzed.collect {
            case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint =>
              import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Project}
              // a global aggregate (no grouping) under the hint is 1 row no
              // matter how big its inputs — the broadcast-scalar pattern
              def topNonTrivial(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
                  : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = p match {
                case Project(_, c) => topNonTrivial(c)
                case Filter(_, c) => topNonTrivial(c)
                case other => other
              }
              val scalarAgg = topNonTrivial(h.child) match {
                case a: Aggregate => a.groupingExpressions.isEmpty
                case _ => false
              }
              // otherwise: a hinted subtree whose EVERY leaf is a constant
              // dim or a KNOWN driver-local relation is fine; anything else
              // under a hint is the hazard. The escape hatch is a closed
              // list — a hinted Range / LogicalRDD / InMemoryRelation is
              // NOT provably constant-size and must be allowlisted, not
              // waved through.
              import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, OneRowRelation}
              val onlyConstantScans = h.child.collectLeaves().forall {
                case _: LocalRelation | _: OneRowRelation => true
                case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
                  lr.output.map(_.name).exists(constantDims.contains)
                case _ => false
              }
              if (scalarAgg || onlyConstantScans) None
              else Some(h.child.collectLeaves()
                .flatMap(_.output.map(_.name))
                .filterNot(constantDims.contains).take(3))
          }.flatten
          if (bad.isEmpty) None else Some(name -> bad.mkString(", "))
        }
    }
    assert(offenders.isEmpty,
      offenders.map { case (n, c) => s"$n hints a scale-proportional scan ($c)" }
        .mkString("\n"))
  }
}
