package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.dist.Distances

/** Exact top-k DTW similarity search with LB_Keogh pruning — the
  * UCR-suite two-phase shape (Keogh & Ratanamahatana 2005; REPOSE/ICDE'21
  * is the distributed cousin) for "find the k most similar trajectories /
  * time series" without paying the O(L²) DTW against every corpus row:
  *
  *   1. envelope the (query-bounded) query set on the driver — U/L per
  *      position over the Sakoe-Chiba band — and broadcast it;
  *   2. one corpus scan computes LB_Keogh per (row, query): the O(L)
  *      sum of squared excursions OUTSIDE the envelope, which provably
  *      lower-bounds banded DTW with the same band and squared costs;
  *   3. seed phase: the k smallest-LB rows per query (a bounded
  *      [[graft.ops.TopKAgg]] aggregate, never a window over data) get
  *      exact DTW; T = the worst seed distance caps the true kth;
  *   4. verify phase: exact DTW ONLY where lb ≤ T — every true top-k
  *      member has dtw ≤ T and lb ≤ dtw, so the pruned candidate set
  *      provably contains the exact answer; final top-k by
  *      (dtw ASC, id ASC), a total order.
  *
  * Exactness is not asserted, it is MEASURED in-plan: the report joins
  * the pruned result against the brute-force twin rank-by-rank (the
  * q_knn recall-invariant doctrine) — `match` must be 1 on every row.
  *
  * Scale shape: the corpus never shuffles — both phases are projections
  * against broadcast frames (queries, then per-query thresholds), and
  * the only aggregations are k-bounded TopKAgg buffers keyed by qid.
  * The LB projection is the codegen'd native lb_keogh expression
  * ([[graft.functions.LbKeogh]], beside dtw_distance) — no interpreted
  * HOF in the corpus×queries hot pass.
  */
object DtwSearch {

  private def dtwUdf(band: Int) =
    udf((a: Seq[Double], b: Seq[Double]) =>
      Distances.dtw(a.toArray, b.toArray, band))

  /** Per-(query, rank) exactness report: (qid, rank, n_corpus, match).
    * `queryPred` selects the query rows out of the corpus (self-matches
    * excluded); `band` is the Sakoe-Chiba half-width shared by the
    * envelope and the exact kernel — the bound only holds when the two
    * agree.
    */
  def topKReport(corpus: DataFrame, idCol: String, vecCol: String,
      queryPred: Column => Column, k: Int, band: Int): DataFrame =
    phases(corpus, idCol, vecCol, queryPred, k, band)._1

  /** Rows the LB gate ADMITS to the exact phase, per query — the
    * measured pruning (DtwSearchSpec pins admitted < corpus on shaped
    * trajectories; on i.i.d.-noise vectors the envelope is wide and the
    * gate admits nearly everything — DTW pruning is a SHAPE lever).
    */
  def admittedCounts(corpus: DataFrame, idCol: String, vecCol: String,
      queryPred: Column => Column, k: Int, band: Int): DataFrame =
    phases(corpus, idCol, vecCol, queryPred, k, band)._2

  private def phases(corpus: DataFrame, idCol: String, vecCol: String,
      queryPred: Column => Column, k: Int, band: Int)
      : (DataFrame, DataFrame) = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val base = graft.prep.Preprocessing.spread(corpus)
      .select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("x"))
      // null/empty series have no DTW neighborhood (the kernel returns
      // +Inf) and would NPE the driver-side envelope build if selected
      // as queries — excluded up front
      .filter(col("x").isNotNull && size(col("x")) > 0)
    // query-bounded driver collect (the Knn/GlobalTrainer doctrine): the
    // envelope is a per-query O(L·band) precompute the executors consume
    val qRows = base.filter(queryPred(col("id"))).collect().map { r =>
      val q = r.getSeq[Double](1).toArray
      val u = new Array[Double](q.length)
      val l = new Array[Double](q.length)
      var i = 0
      while (i < q.length) {
        var lo = q(i); var hi = q(i)
        var j = math.max(0, i - band)
        val jHi = math.min(q.length - 1, i + band)
        while (j <= jHi) {
          if (q(j) < lo) lo = q(j); if (q(j) > hi) hi = q(j); j += 1
        }
        u(i) = hi; l(i) = lo; i += 1
      }
      (r.getLong(0), q.toSeq, u.toSeq, l.toSeq)
    }
    require(qRows.nonEmpty, "queryPred selected no rows")
    val qFrame = broadcast(qRows.toSeq.toDF("qid", "q", "u", "l"))

    // LB_Keogh per (corpus row, query): squared excursions outside [l, u]
    // — the codegen'd native expression (functions/DtwExpression.scala
    // LbKeogh), not an interpreted HOF chain: this projection runs once
    // per (corpus row, query) and is the whole point of the lower bound
    val lbCol = graft.functions.GraftFunctions.lbKeogh(
      col("x"), col("u"), col("l"))
    val lbFrame = base.crossJoin(qFrame)
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id"), col("x"), col("q"), lbCol.as("lb"))

    val dtw = dtwUdf(band)
    // seed phase: k smallest LB per query -> exact DTW -> per-query cap T.
    // Vectors come from base/qFrame (k·|queries|-row keyed join + a
    // broadcast), NOT from re-deriving the cross-product frame.
    val seeds = graft.ops.TopKAgg
      .topK(lbFrame.withColumn("neg_lb", -col("lb")),
        Seq("qid"), "id", "neg_lb", k)
      .select(col("qid"), col("id"))
      .join(base, Seq("id"))
      .join(qFrame.select(col("qid"), col("q")), Seq("qid"))
      .select(col("qid"), dtw(col("q"), col("x")).as("d"))
    val caps = broadcast(seeds.groupBy(col("qid")).agg(max(col("d")).as("t")))

    // verify phase: exact DTW only where the lower bound admits the row
    val pruned = lbFrame.join(caps, Seq("qid"))
      .filter(col("lb") <= col("t"))
      .select(col("qid"), col("id"), dtw(col("q"), col("x")).as("d"))
    val prunedTop = graft.ops.TopKAgg
      .topK(pruned.withColumn("neg_d", -col("d")), Seq("qid"), "id", "neg_d", k)
      .select(col("qid"), col("rank"), col("id").as("pruned_id"))

    // brute twin: exact DTW against every corpus row, same total order
    val bruteTop = graft.ops.TopKAgg
      .topK(lbFrame.select(col("qid"), col("id"),
          (-dtw(col("q"), col("x"))).as("neg_d")),
        Seq("qid"), "id", "neg_d", k)
      .select(col("qid"), col("rank"), col("id").as("brute_id"))

    val nCorpus = broadcast(base.agg(count(lit(1)).as("n_corpus")))
    val report = prunedTop.join(bruteTop, Seq("qid", "rank"))
      .crossJoin(nCorpus)
      .select(col("qid"), col("rank"), col("n_corpus"),
        (col("pruned_id") === col("brute_id")).cast("long").as("is_match"))
    val admitted = lbFrame.join(caps, Seq("qid"))
      .filter(col("lb") <= col("t"))
      .groupBy(col("qid")).agg(count(lit(1)).as("admitted"))
      .crossJoin(nCorpus)
    (report, admitted)
  }
}
