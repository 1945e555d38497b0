package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental min/max maintenance — the gap [[IncrementalAgg]] documents
  * out: count/sum self-maintain under deletes, but a deleted minimum
  * needs the base to find the runner-up. The production fix is a k-deep
  * RESERVE per group: keep the k smallest (and k largest) current values
  * plus a COVER BOUND — the threshold below which the reserve is the
  * complete multiset of the group's values. Then:
  *
  *   - insert below the bound → enters the reserve (trimming lowers the
  *     bound, so the invariant never lies);
  *   - delete below the bound → removes its reserve instance — the next
  *     extremum is already on hand, no base scan;
  *   - only when a reserve EXHAUSTS with rows remaining does the group
  *     need re-derivation — a targeted, group-semi-joined base probe
  *     ([[refresh]]), amortized k extremum-deletes apart, instead of a
  *     full scan per delete.
  *
  * Values are LongType (the repo's integer-cents doctrine — exact
  * cross-engine comparison needs exact arithmetic; positive domain — the
  * max side reuses the min-side machinery on negated values). Delta
  * processing is delta-sized end to end: per-group insert/delete lists
  * are cap-bounded (k+1 inserts, 2k+1 deletes — anything beyond provably
  * either cannot enter the reserve or has already emptied it), the merge
  * is a k-bounded primitive-loop UDF, and untouched groups stream
  * through an anti join, exactly the [[IncrementalAgg.applyDelta]]
  * shape.
  *
  * The extreme-value lists come from [[BottomKAggregator]] — a typed
  * Aggregator with a cap-bounded sorted buffer, so both [[init]] over
  * the 100 TB base and the delta prep are ONE map-side-combinable
  * aggregate pass (ObjectHashAggregate with partial merge): a
  * low-cardinality group key costs a k-sized merge per group, never a
  * per-group window funnel.
  *
  * Invariant (per side, stated for min; max is the mirror): `lo` is the
  * sorted multiset of ALL current group values strictly below `lo_bound`
  * (null bound = +inf), with `size(lo) <= k`. min = lo[0] whenever lo is
  * non-empty; lo empty with cnt > 0 means every remaining value is at or
  * above the bound — untracked — and the group is flagged.
  */
object IncrementalExtrema {

  private val StateCols = Seq("lo", "lo_bound", "hi", "hi_bound", "cnt")

  /** Cap-bounded sorted buffer of the k smallest values seen. */
  final case class BottomKBuf(vs: Array[Long])

  /** Output wrapper (Encoders.product needs a case class). */
  final case class BottomKOut(vs: Seq[Long])

  /** The k-smallest typed aggregate: per-input insertion into a sorted
    * cap-bounded array, partial buffers merge by sorted-merge-and-trim —
    * exact for the cap smallest of the union (each partial's buffer is a
    * superset of the union's cap smallest within that partial). Null
    * inputs are skipped, which is how callers aggregate several
    * differently-filtered sides from one pass (`when(cond, v)` feeds).
    */
  final class BottomKAggregator(cap: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        java.lang.Long, BottomKBuf, BottomKOut] {
    override def zero: BottomKBuf = BottomKBuf(Array.empty)
    override def reduce(b: BottomKBuf, v: java.lang.Long): BottomKBuf =
      if (v == null) b
      else {
        val x = v.longValue
        if (b.vs.length >= cap && x >= b.vs(b.vs.length - 1)) b
        else {
          val at0 = java.util.Arrays.binarySearch(b.vs, x)
          val at = if (at0 >= 0) at0 else -(at0 + 1)
          val out = new Array[Long](math.min(cap, b.vs.length + 1))
          System.arraycopy(b.vs, 0, out, 0, at)
          out(at) = x
          System.arraycopy(b.vs, at, out, at + 1,
            math.min(b.vs.length - at, out.length - at - 1))
          BottomKBuf(out)
        }
      }
    override def merge(a: BottomKBuf, b: BottomKBuf): BottomKBuf = {
      val out = new Array[Long](math.min(cap, a.vs.length + b.vs.length))
      var i = 0; var j = 0; var o = 0
      while (o < out.length) {
        if (j >= b.vs.length || (i < a.vs.length && a.vs(i) <= b.vs(j))) {
          out(o) = a.vs(i); i += 1
        } else { out(o) = b.vs(j); j += 1 }
        o += 1
      }
      BottomKBuf(out)
    }
    override def finish(b: BottomKBuf): BottomKOut = BottomKOut(b.vs.toSeq)
    override def bufferEncoder = org.apache.spark.sql.Encoders.product[BottomKBuf]
    override def outputEncoder = org.apache.spark.sql.Encoders.product[BottomKOut]
  }

  /** (k+1)-bounded ascending extreme list of `v` (nulls skipped) as an
    * aggregate column — `.getField("vs")` for the array.
    */
  private def bottomK(cap: Int, v: org.apache.spark.sql.Column) =
    udaf(new BottomKAggregator(cap),
      org.apache.spark.sql.Encoders.LONG).apply(v)

  /** Build the maintained state from the base in ONE aggregate pass:
    * reserves = k extreme values per side, bound = the (k+1)-th where one
    * exists (the max side aggregates negated values through the same
    * bottom-k buffer).
    */
  def init(fact: DataFrame, groupCols: Seq[String], valueCol: String,
      k: Int): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column")
    require(k >= 1, "reserve depth k must be >= 1")
    val g = groupCols.map(col)
    val v = col(valueCol).cast("long")
    fact
      .select(g :+ v.as("_v"): _*)
      .groupBy(g: _*)
      .agg(
        bottomK(k + 1, col("_v")).getField("vs").as("_loAll"),
        bottomK(k + 1, -col("_v")).getField("vs").as("_hiAllNeg"),
        count(lit(1)).as("cnt"))
      .select(g ++ Seq(
        slice(col("_loAll"), 1, k).as("lo"),
        when(size(col("_loAll")) > k, element_at(col("_loAll"), k + 1))
          .as("lo_bound"),
        transform(slice(col("_hiAllNeg"), 1, k), x => -x).as("hi"),
        when(size(col("_hiAllNeg")) > k, -element_at(col("_hiAllNeg"), k + 1))
          .as("hi_bound"),
        col("cnt")): _*)
  }

  /** Shared per-side merge: reserve ⊎ kept-inserts ∖ deletes, then trim
    * to the new bound and to k. Works in ASCENDING order — the max side
    * feeds negated values. Inputs are pre-capped by rank ([[applyDelta]]).
    *
    * The bound discipline is load-bearing: when inserts overflow the cap,
    * the bound drops to the smallest DROPPED insert, and everything at or
    * above the new bound is trimmed from the reserve — downward closure
    * ("the reserve is the complete multiset below the bound") is what
    * lets future deletes at/above the bound be ignored safely. A del that
    * misses is therefore provably targeting an untracked (≥ bound) value;
    * and a cap-dropped del's target is either hit by a kept del, or is
    * ≥ the new bound and gets trimmed — staleness cannot survive.
    */
  private def mergeSide(reserve: Seq[Long], bound: Option[Long],
      ins: Seq[Long], dels: Seq[Long], k: Int): (Seq[Long], Option[Long]) = {
    val keptIns = ins.take(k)
    val droppedBound = if (ins.length > k) Some(ins(k)) else None
    val pendingBound = (bound, droppedBound) match {
      case (Some(a), Some(b)) => Some(math.min(a, b))
      case (a, b) => a.orElse(b)
    }
    val merged = scala.collection.mutable.ArrayBuffer[Long]()
    merged ++= reserve
    keptIns.foreach { x =>
      // insert keeping ascending order (k-bounded, so linear is fine)
      val at = merged.indexWhere(_ > x)
      if (at < 0) merged += x else merged.insert(at, x)
    }
    dels.foreach { x =>
      val at = merged.indexOf(x)
      if (at >= 0) merged.remove(at)
    }
    val trimmed = pendingBound match {
      case Some(b) => merged.filter(_ < b)
      case None => merged
    }
    if (trimmed.length > k) (trimmed.take(k).toSeq, Some(trimmed(k)))
    else (trimmed.toSeq, pendingBound)
  }

  /** Apply a CDC batch (op = 'd' rows are OLD images leaving, others NEW
    * images entering; an update is its d+i pair, order-free within the
    * batch). Result state is exactly `init(fact ⊕ changes)` up to reserve
    * depth: reserves and counts match; groups whose count reaches zero
    * drop out; first-seen groups appear with complete (bound-less)
    * reserves. Sides that exhausted surface via [[needsRefresh]].
    */
  def applyDelta(state: DataFrame, changes: DataFrame,
      groupCols: Seq[String], valueCol: String, k: Int,
      opCol: String = "op"): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column")
    val expected = (groupCols ++ StateCols).sorted
    require(state.columns.sorted.sameElements(expected),
      s"state schema ${state.columns.sorted.mkString(",")} != ${expected.mkString(",")}")
    val g = groupCols.map(col)
    val v = col(valueCol).cast("long")

    // annotate each change row with the group's current bounds (delta-
    // group-sized join: the state side is semi-bounded by delta groups)
    val bounds = state.select(g ++ Seq(col("lo_bound").as("_lb"),
      col("hi_bound").as("_hb")): _*)
    val annotated = changes
      .select(g ++ Seq(v.as("_v"), (col(opCol) === "d").as("_del")): _*)
      .join(bounds, groupCols, "left_outer")

    // relevance + rank caps, per side: inserts below the bound ranked
    // ascending, capped at k+1 (the k+1-th is the dropped-insert bound
    // marker); deletes below the bound capped at 2k+1 (a merge holds at
    // most 2k values — more deletes than that provably empty it)
    val loRelevant = col("_lb").isNull || col("_v") < col("_lb")
    val hiRelevant = col("_hb").isNull || col("_v") > col("_hb")

    // one aggregate pass caps all four per-group lists (nulled-out
    // inputs route each row to its relevant side/op buffers only)
    val deltaAgg = annotated
      .groupBy(g: _*)
      .agg(
        bottomK(k + 1, when(!col("_del") && loRelevant, col("_v")))
          .getField("vs").as("d_lo_ins"),
        bottomK(2 * k + 1, when(col("_del") && loRelevant, col("_v")))
          .getField("vs").as("d_lo_del"),
        bottomK(k + 1, when(!col("_del") && hiRelevant, -col("_v")))
          .getField("vs").as("_d_hi_ins_neg"),
        bottomK(2 * k + 1, when(col("_del") && hiRelevant, -col("_v")))
          .getField("vs").as("_d_hi_del_neg"),
        sum(when(col("_del"), -1L).otherwise(1L)).as("d_cnt"))
      .withColumn("d_hi_ins", transform(col("_d_hi_ins_neg"), x => -x))
      .withColumn("d_hi_del", transform(col("_d_hi_del_neg"), x => -x))
      .drop("_d_hi_ins_neg", "_d_hi_del_neg")

    val merge = udf((lo: Seq[Long], loB: java.lang.Long,
        hi: Seq[Long], hiB: java.lang.Long,
        loIns: Seq[Long], loDel: Seq[Long],
        hiIns: Seq[Long], hiDel: Seq[Long]) => {
      val (nLo, nLoB) = mergeSide(
        Option(lo).getOrElse(Seq.empty), Option(loB).map(_.longValue),
        Option(loIns).getOrElse(Seq.empty), Option(loDel).getOrElse(Seq.empty), k)
      // max side runs the same ascending logic on negated values
      val (nHiNeg, nHiBNeg) = mergeSide(
        Option(hi).getOrElse(Seq.empty).map(x => -x),
        Option(hiB).map(b => -b.longValue),
        Option(hiIns).getOrElse(Seq.empty).map(x => -x),
        Option(hiDel).getOrElse(Seq.empty).map(x => -x), k)
      (nLo, nLoB.map(Long.box).orNull,
        nHiNeg.map(x => -x), nHiBNeg.map(b => Long.box(-b)).orNull)
    })

    val touched = state.join(deltaAgg.select(g: _*), groupCols, "left_semi")
    val untouched = state.join(deltaAgg.select(g: _*), groupCols, "left_anti")
    val combined = deltaAgg
      .join(touched, groupCols, "left_outer")
      .withColumn("_m", merge(col("lo"), col("lo_bound"),
        col("hi"), col("hi_bound"),
        col("d_lo_ins"), col("d_lo_del"), col("d_hi_ins"), col("d_hi_del")))
      .select(g ++ Seq(
        col("_m._1").as("lo"), col("_m._2").as("lo_bound"),
        col("_m._3").as("hi"), col("_m._4").as("hi_bound"),
        (coalesce(col("cnt"), lit(0L)) + col("d_cnt")).as("cnt")): _*)
      .filter(col("cnt") > 0)
    untouched.unionByName(combined)
  }

  /** Groups whose reserve exhausted with rows remaining — min/max for
    * these is unknown until [[refresh]] re-derives them from the base.
    */
  def needsRefresh(state: DataFrame): DataFrame =
    state.filter(col("cnt") > 0 &&
      ((size(col("lo")) === 0 && col("lo_bound").isNotNull) ||
        (size(col("hi")) === 0 && col("hi_bound").isNotNull)))

  /** Re-derive the flagged groups from the CURRENT base — a group-semi-
    * joined probe (partition/bloom-prunable on a laid-out lake), never a
    * full re-init. Unflagged groups pass through untouched.
    */
  def refresh(state: DataFrame, fact: DataFrame, groupCols: Seq[String],
      valueCol: String, k: Int): DataFrame = {
    val flaggedKeys = needsRefresh(state).select(groupCols.map(col): _*)
    val kept = state.join(flaggedKeys, groupCols, "left_anti")
    val rebuilt = init(fact.join(flaggedKeys, groupCols, "left_semi"),
      groupCols, valueCol, k)
    kept.unionByName(rebuilt)
  }

  /** The served readout: (group, min, max, cnt). Requires no pending
    * refresh flags — call [[refresh]] first after a destructive batch.
    */
  def extrema(state: DataFrame, groupCols: Seq[String]): DataFrame =
    state.select(groupCols.map(col) ++ Seq(
      element_at(col("lo"), 1).as("min_v"),
      element_at(col("hi"), 1).as("max_v"),
      col("cnt")): _*)
}
