package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Data profiling and constraint validation — the admission gate a 100 TB
  * training-data lake runs before a corpus version ships (the Deequ /
  * expectations shape, re-expressed as plain declarative aggregates so
  * Catalyst fuses and codegens everything).
  *
  * Profilers are ONE aggregate pass over the table (all columns' stats in
  * a single job; exact NDV per column plans as one Expand — for very wide
  * tables swap `countDistinct` for `approx_count_distinct` at the marked
  * line, the only scale knob). Checks are each one aggregate / one
  * anti-join; `report` unions them into the violations table a scheduler
  * can gate on.
  *
  * Numeric parity doctrine (matches the catalog-wide rules): sums through
  * DECIMAL (order-independent), ratios from exact counts, final
  * `round(, 6)` surfaced as DOUBLE.
  */
object DataQuality {

  private val dec = DecimalType(28, 6)

  /** Long-format numeric profile: one row per column with
    * (col_name, n, n_null, null_frac, ndv, min_num, max_num, avg_num).
    * Single scan: per-column aggregates land in one wide row, then `stack`
    * pivots to long format driver-free.
    *
    * NDV is EXACT (`countDistinct`) — right for fixture-exactness, but a
    * multi-column exact-distinct plans one Expand branch per column; on a
    * very wide 100 TB table use [[profileNumericApprox]] (the HLL scale
    * knob: O(1) sketch memory per column, one plain aggregate, mergeable
    * across partitions).
    */
  def profileNumeric(df: DataFrame, cols: Seq[String]): DataFrame =
    profileImpl(df, cols, c => countDistinct(col(c)))

  /** [[profileNumeric]] with HLL++ NDV (`approx_count_distinct`, default
    * rsd 2%) — the variant a 100 TB table actually runs. Every other stat
    * stays exact. q_profile_numeric_approx pins the sketch within 5% of
    * exact per column.
    */
  def profileNumericApprox(df: DataFrame, cols: Seq[String],
      rsd: Double = 0.02): DataFrame =
    profileImpl(df, cols, c => approx_count_distinct(col(c), rsd))

  private def profileImpl(df0: DataFrame, cols: Seq[String],
      ndvAgg: String => Column): DataFrame = {
    require(cols.nonEmpty, "profileNumeric needs at least one column")
    // r20: the fixture tables are single-row-group parquet, so the scan
    // (and with it the exact-NDV Expand / percentile / decimal-moment
    // partial aggregation) runs on ONE core no matter the split size —
    // spread() round-robins the narrow scan across the cluster first
    // (measured sf0.1: profileNumeric 2.9 -> 1.5 s, profileCorr 1.6 ->
    // 0.9 s, profileRobust 3.8 -> 2.8 s). At 100 TB scans already carry
    // >= cores partitions and spread is a no-op. All aggregates here are
    // partition-order independent (exact counts, decimal sums, exact
    // percentile value-count maps, HLL register merges), so results are
    // bit-identical.
    val df = graft.prep.Preprocessing.spread(df0)
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__nn"),
        ndvAgg(c).as(s"${c}__ndv"),
        min(col(c)).cast("double").as(s"${c}__min"),
        max(col(c)).cast("double").as(s"${c}__max"),
        sum(col(c).cast(dec)).cast("double").as(s"${c}__sum"))
    }
    val wide = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val stackArgs = cols.map { c =>
      s"'$c', `${c}__nn`, `${c}__ndv`, `${c}__min`, `${c}__max`, `${c}__sum`"
    }.mkString(", ")
    wide
      .select(col("__n"), expr(
        s"stack(${cols.size}, $stackArgs) AS (col_name, _nn, ndv, min_num, max_num, _sum)"))
      .select(
        col("col_name"),
        col("__n").as("n"),
        (col("__n") - col("_nn")).as("n_null"),
        round((col("__n") - col("_nn")) / col("__n"), 6).as("null_frac"),
        col("ndv"),
        col("min_num"), col("max_num"),
        round(col("_sum") / col("_nn"), 6).as("avg_num"))
  }

  /** Robust (quantile-based) numeric profile: exact p25/p50/p75, IQR,
    * and Tukey-fence outlier counts (x outside [p25 − 1.5·IQR,
    * p75 + 1.5·IQR]) — the skew/heavy-tail complement to
    * [[checkOutliers]]'s mean/stddev z-score, which a single extreme
    * value can drag. Two passes by necessity (fences depend on the full
    * distribution): ONE percentile aggregate (broadcast 1-row result),
    * then ONE counting scan against the broadcast fences — the same
    * adjudicated two-pass shape as checkOutliers. Fences are snapped to
    * 6 dp before comparison so a data value landing exactly on a fence
    * decides identically on every engine (exact percentile can land ON
    * data values; an unrounded fence would sit one ulp away from them).
    * Exact percentile materializes per-column value counts —
    * bounded-cardinality columns; at unbounded 100 TB scale swap
    * `approx_percentile` exactly as [[profileNumericApprox]] swaps NDV.
    */
  def profileRobust(df0: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profileRobust needs at least one column")
    val df = graft.prep.Preprocessing.spread(df0) // r20: see profileImpl
    val qAggs = cols.flatMap { c =>
      // explicit double input: DuckDB's quantile_cont interpolates in the
      // input type (DECIMAL stays DECIMAL); pinning both engines to
      // double interpolation keeps the quantiles bit-comparable. ONE
      // array-percentile per column: the three quantiles share a single
      // value-count buffer instead of building it three times
      Seq(expr(
        s"percentile(CAST($c AS DOUBLE), array(0.25D, 0.5D, 0.75D))")
        .as(s"${c}__q"))
    }
    val q = df.agg(qAggs.head, qAggs.tail: _*)
    def pq(c: String, i: Int) = element_at(col(s"${c}__q"), i)
    def iqr(c: String) = pq(c, 3) - pq(c, 1)
    val outAggs = cols.flatMap { c =>
      val lo = round(pq(c, 1) - iqr(c) * 1.5, 6)
      val hi = round(pq(c, 3) + iqr(c) * 1.5, 6)
      Seq(
        count(col(c)).as(s"${c}__nn"),
        sum(when(col(c) < lo || col(c) > hi, 1L).otherwise(0L))
          .as(s"${c}__out"),
        first(pq(c, 1)).as(s"${c}__q25"),
        first(pq(c, 2)).as(s"${c}__q50"),
        first(pq(c, 3)).as(s"${c}__q75"))
    }
    val wide = df.crossJoin(broadcast(q)).agg(outAggs.head, outAggs.tail: _*)
    val stackArgs = cols.map { c =>
      s"'$c', `${c}__nn`, `${c}__out`, `${c}__q25`, `${c}__q50`, `${c}__q75`"
    }.mkString(", ")
    wide
      .select(expr(s"stack(${cols.size}, $stackArgs) " +
        "AS (col_name, _nn, _out, _q25, _q50, _q75)"))
      .select(
        col("col_name"),
        round(col("_q25"), 6).as("p25"),
        round(col("_q50"), 6).as("p50"),
        round(col("_q75"), 6).as("p75"),
        round(col("_q75") - col("_q25"), 6).as("iqr"),
        col("_out").as("n_outliers"),
        round(col("_out").cast("double") / col("_nn"), 6).as("outlier_frac"))
  }

  /** Numeric profile from a DETERMINISTIC row sample — how a 100 TB
    * table actually gets profiled daily: an md5-keyed Bernoulli sample
    * ([[graft.prep.DeterministicSampling]] — replayable across engines,
    * reruns, and repartitions, unlike `TABLESAMPLE`/`rand()`) feeds the
    * same one-pass aggregate, and counts scale back up by 1/rate. Sample
    * stats are labeled for what they are: `n_est` extrapolates (exact in
    * expectation), `min_num`/`max_num` are sample extremes (bounds-only),
    * `avg_num` is the unbiased sample mean, and NDV is deliberately NOT
    * reported — distinct counts don't scale linearly from a row sample;
    * use [[profileNumericApprox]]'s HLL on the full data for that.
    */
  def profileNumericSampled(df0: DataFrame, idCol: Column,
      cols: Seq[String], rate: Double): DataFrame = {
    require(cols.nonEmpty, "profileNumericSampled needs at least one column")
    require(rate > 0 && rate <= 1, s"rate must be in (0,1]: $rate")
    val df = graft.prep.Preprocessing.spread(df0) // r20: see profileImpl
    val sampled = df.filter(
      graft.prep.DeterministicSampling.uniformDraw(idCol) < rate)
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__nn"),
        min(col(c)).cast("double").as(s"${c}__min"),
        max(col(c)).cast("double").as(s"${c}__max"),
        sum(col(c).cast(dec)).cast("double").as(s"${c}__sum"))
    }
    val wide = sampled.agg(count(lit(1)).as("__n"), aggs: _*)
    val stackArgs = cols.map { c =>
      s"'$c', `${c}__nn`, `${c}__min`, `${c}__max`, `${c}__sum`"
    }.mkString(", ")
    wide
      .select(col("__n"), expr(
        s"stack(${cols.size}, $stackArgs) AS (col_name, _nn, min_num, max_num, _sum)"))
      .select(
        col("col_name"),
        col("__n").as("n_sampled"),
        (col("__n") / rate).as("n_est"),
        round((col("__n") - col("_nn")) / col("__n"), 6).as("null_frac"),
        col("min_num"), col("max_num"),
        round(col("_sum") / col("_nn"), 6).as("avg_num"))
  }

  /** One-pass exact Pearson correlation for the given column pairs: one
    * row per pair with (x_col, y_col, n, corr). The moment sums (Σx, Σy,
    * Σx², Σy², Σxy) accumulate in DECIMAL — order-independent and exact,
    * so "one pass" and "recomputed" can never drift — and only the final
    * closed-form combination runs in double (identical IEEE expression
    * tree in the SQL twin). A float `corr` aggregate would be
    * partition-order dependent and hash-break the oracle; Spark's builtin
    * `corr` is exactly that. Pairwise-complete null handling: a row
    * contributes to a pair only when BOTH sides are non-null. Scale note:
    * products sum in DECIMAL(38,4); for values far above the fixture's
    * price magnitudes pre-scale the inputs (the same knob as the NDV one
    * above).
    */
  def profileCorrelation(df0: DataFrame,
      pairs: Seq[(String, String)]): DataFrame = {
    require(pairs.nonEmpty, "profileCorrelation needs at least one pair")
    val df = graft.prep.Preprocessing.spread(df0) // r20: see profileImpl
    val d = DecimalType(18, 2)
    val aggs = pairs.zipWithIndex.flatMap { case ((x, y), i) =>
      val both = col(x).isNotNull && col(y).isNotNull
      val xd = when(both, col(x).cast(d))
      val yd = when(both, col(y).cast(d))
      Seq(
        count(when(both, lit(1))).as(s"p${i}__n"),
        sum(xd).as(s"p${i}__sx"),
        sum(yd).as(s"p${i}__sy"),
        sum(xd * xd).as(s"p${i}__sxx"),
        sum(yd * yd).as(s"p${i}__syy"),
        sum(xd * yd).as(s"p${i}__sxy"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = pairs.zipWithIndex.map { case ((x, y), i) =>
      s"'$x', '$y', `p${i}__n`, " +
        s"CAST(`p${i}__sx` AS DOUBLE), CAST(`p${i}__sy` AS DOUBLE), " +
        s"CAST(`p${i}__sxx` AS DOUBLE), CAST(`p${i}__syy` AS DOUBLE), " +
        s"CAST(`p${i}__sxy` AS DOUBLE)"
    }.mkString(", ")
    wide
      .select(expr(s"stack(${pairs.size}, $stackArgs) " +
        "AS (x_col, y_col, n, _sx, _sy, _sxx, _syy, _sxy)"))
      .select(col("x_col"), col("y_col"), col("n"),
        round(
          (col("n") * col("_sxy") - col("_sx") * col("_sy")) /
            (sqrt(col("n") * col("_sxx") - col("_sx") * col("_sx")) *
              sqrt(col("n") * col("_syy") - col("_sy") * col("_sy"))),
          6).as("corr"))
  }

  /** Cross-replica reconciliation — the check every migration, backfill,
    * and layout rewrite runs before cutover: both sides collapse to
    * (keys, cnt, decimal sum) — each side ONE aggregate over its own
    * copy, shuffling only group-level rows — then a full-outer compare
    * emits a per-group verdict: `ok`, `missing_left`/`missing_right`
    * (a group exists on one side only), `count_mismatch`, or
    * `value_mismatch` (same rows, different content — decimal sums make
    * this exact, not float-noise). At 100 TB the compare frame is
    * #groups-sized; neither table crosses the network.
    */
  def reconcile(left: DataFrame, right: DataFrame, keys: Seq[String],
      valCol: String): DataFrame = {
    require(keys.nonEmpty, "reconcile needs at least one key column")
    def sideAgg(df: DataFrame, tag: String) =
      df.groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as(s"cnt_$tag"),
          sum(col(valCol).cast(dec)).as(s"_sum_$tag"))
    sideAgg(left, "a").join(sideAgg(right, "b"), keys, "full_outer")
      .withColumn("status",
        when(col("cnt_a").isNull, lit("missing_left"))
          .when(col("cnt_b").isNull, lit("missing_right"))
          .when(col("cnt_a") =!= col("cnt_b"), lit("count_mismatch"))
          .when(!(col("_sum_a") <=> col("_sum_b")), lit("value_mismatch"))
          .otherwise(lit("ok")))
      .select(keys.map(col) ++ Seq(col("cnt_a"), col("cnt_b"),
        col("_sum_a").cast("double").as("sum_a"),
        col("_sum_b").cast("double").as("sum_b"), col("status")): _*)
  }

  /** Long-format string profile: one row per column with
    * (col_name, n, n_null, null_frac, ndv, min_len, max_len, avg_len).
    * Lengths are exact character counts (both engines count codepoints the
    * same way for the fixture's data), so every stat is integer-exact
    * until the final rounded ratio.
    */
  def profileStrings(df0: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profileStrings needs at least one column")
    val df = graft.prep.Preprocessing.spread(df0) // r20: see profileImpl
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__nn"),
        countDistinct(col(c)).as(s"${c}__ndv"),
        min(length(col(c))).cast("long").as(s"${c}__minl"),
        max(length(col(c))).cast("long").as(s"${c}__maxl"),
        sum(length(col(c)).cast("long")).as(s"${c}__suml"))
    }
    val wide = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val stackArgs = cols.map { c =>
      s"'$c', `${c}__nn`, `${c}__ndv`, `${c}__minl`, `${c}__maxl`, `${c}__suml`"
    }.mkString(", ")
    wide
      .select(col("__n"), expr(
        s"stack(${cols.size}, $stackArgs) AS (col_name, _nn, ndv, min_len, max_len, _suml)"))
      .select(
        col("col_name"),
        col("__n").as("n"),
        (col("__n") - col("_nn")).as("n_null"),
        round((col("__n") - col("_nn")) / col("__n"), 6).as("null_frac"),
        col("ndv"),
        col("min_len"), col("max_len"),
        round(col("_suml") / col("_nn"), 6).as("avg_len"))
  }

  /** Equi-width histogram of a numeric column: bucket id in [0, buckets),
    * row count, and the bucket's [lo_edge, hi_edge) — explicit bounds so
    * the whole histogram is ONE aggregate pass (deriving bounds in-query
    * would need a second pass; feed them from [[profileNumeric]] when
    * unknown). Values outside [lo, hi] clamp into the edge buckets, nulls
    * are dropped, empty buckets don't emit.
    */
  def histogram(df: DataFrame, c: String, buckets: Int,
      lo: Double, hi: Double): DataFrame = {
    require(buckets > 0 && hi > lo, s"bad histogram config: $buckets, [$lo, $hi]")
    val w = (hi - lo) / buckets
    val bucket = least(greatest(
      floor((col(c) - lit(lo)) / lit(w)), lit(0.0)), lit((buckets - 1).toDouble))
      .cast("long")
    df.filter(col(c).isNotNull)
      .groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).as("n"))
      .select(col("bucket"), col("n"),
        round(lit(lo) + col("bucket") * lit(w), 6).as("lo_edge"),
        round(lit(lo) + (col("bucket") + lit(1L)) * lit(w), 6).as("hi_edge"))
  }

  /** A finished check row: (check_name, n_checked, violations).
    * ("check_name", not "check" — CHECK is a reserved word downstream.) */
  private def asCheck(name: String, df: DataFrame): DataFrame =
    df.select(lit(name).as("check_name"),
      col("n_checked").cast("long").as("n_checked"),
      col("violations").cast("long").as("violations"))

  /** Duplicate-key violations: rows beyond the first per distinct key
    * tuple. One hash aggregate. SQL COUNT DISTINCT semantics: tuples
    * containing a null are dropped from the distinct count (so a null key
    * inflates `violations`) — key columns are assumed null-free; pair with
    * [[checkNonNull]] when they may not be.
    */
  def checkUnique(name: String, df: DataFrame, cols: Seq[String]): DataFrame =
    asCheck(name, graft.prep.Preprocessing.spread(df).agg(
      count(lit(1)).as("n_checked"),
      (count(lit(1)) - countDistinct(col(cols.head), cols.tail.map(col): _*))
        .as("violations")))

  /** Referential integrity: child rows whose key has no parent (null child
    * keys are orphans too — a null FK can't resolve). Plans as the child
    * scan left-anti-joined to the parent key set; Catalyst broadcasts the
    * parent side when it is small enough, and at 100 TB the anti join
    * shuffles on the key like any equi-join — no driver collect.
    */
  def checkForeignKey(
      name: String, child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame = {
    // ONE child scan: left-outer to the distinct parent keys, then count
    // total and unmatched in the same aggregate (a separate total + anti
    // count would scan the child twice and cross-join two 1-row frames).
    val pk = parent.select(col(parentKey).as(childKey)).distinct()
      .withColumn("_pk_hit", lit(1))
    asCheck(name, child.select(col(childKey))
      .join(pk, Seq(childKey), "left_outer")
      .agg(
        count(lit(1)).as("n_checked"),
        count(when(col("_pk_hit").isNull, 1)).as("violations")))
  }

  /** Out-of-range values (nulls are not range violations — pair with
    * [[checkNonNull]] when nulls are also illegal).
    */
  def checkRange(name: String, df: DataFrame, c: String,
      lo: Double, hi: Double): DataFrame =
    asCheck(name, df.agg(
      count(lit(1)).as("n_checked"),
      count(when(!col(c).between(lo, hi), 1)).as("violations")))

  /** Null violations. */
  def checkNonNull(name: String, df: DataFrame, c: String): DataFrame =
    asCheck(name, df.agg(
      count(lit(1)).as("n_checked"),
      (count(lit(1)) - count(col(c))).as("violations")))

  /** Z-score outliers: non-null values with |v − mean| > k·σ. Mean and
    * sample variance derive from ORDER-INDEPENDENT decimal sums (sum,
    * sum-of-squares), so both engines compute bit-identical doubles and
    * the violation count is exact — a float `stddev` aggregate would be
    * partition-order dependent and hash-break. Two passes by necessity
    * (stats, then compare); the 1-row stats frame broadcasts onto the
    * second scan.
    */
  def checkOutliers(name: String, df0: DataFrame, c: String,
      k: Double = 3.0): DataFrame = {
    val df = graft.prep.Preprocessing.spread(df0) // r20: see profileImpl
    val decSq = DecimalType(38, 12)
    val stats = df.agg(
      count(col(c)).as("n_checked"),
      sum(col(c).cast(decSq)).cast("double").as("_s"),
      sum((col(c) * col(c)).cast(decSq)).cast("double").as("_sq"))
      .withColumn("_mean", col("_s") / col("n_checked"))
      .withColumn("_sigma", sqrt(greatest(
        (col("_sq") - col("_s") * col("_s") / col("n_checked")) /
          (col("n_checked") - lit(1L)), lit(0.0))))
    asCheck(name, df
      .crossJoin(broadcast(stats.select("n_checked", "_mean", "_sigma")))
      .agg(
        // empty input → empty cross join → first() is null; surface 0
        coalesce(first(col("n_checked")), lit(0L)).as("n_checked"),
        count(when(abs(col(c) - col("_mean")) > lit(k) * col("_sigma"), 1))
          .as("violations")))
  }

  /** Functional-dependency violations: determinant tuples that map to
    * more than one distinct dependent value (the "one order ⇒ one
    * status"-style invariant). n_checked = distinct determinant tuples,
    * violations = determinants with ≥2 distinct dependents. Two chained
    * aggregates on the determinant key — one shuffle.
    */
  def checkFunctionalDependency(name: String, df: DataFrame,
      determinant: Seq[String], dependent: String): DataFrame = {
    require(determinant.nonEmpty, "need at least one determinant column")
    asCheck(name, df
      .groupBy(determinant.map(col): _*)
      .agg(countDistinct(col(dependent)).as("_ndv"))
      .agg(
        count(lit(1)).as("n_checked"),
        count(when(col("_ndv") > 1, 1)).as("violations")))
  }

  /** Values outside the accepted set (nulls excluded, as with ranges). */
  def checkAccepted(name: String, df: DataFrame, c: String,
      values: Seq[String]): DataFrame =
    asCheck(name, df.agg(
      count(lit(1)).as("n_checked"),
      count(when(!col(c).isin(values: _*), 1)).as("violations")))

  /** Union the checks into the gate table: (check, n_checked, violations,
    * pass). Each check stays its own job tree; the union is free.
    */
  def report(checks: Seq[DataFrame]): DataFrame = {
    require(checks.nonEmpty, "report needs at least one check")
    checks.reduce(_ unionByName _)
      .withColumn("pass", col("violations") === lit(0L))
  }
}
