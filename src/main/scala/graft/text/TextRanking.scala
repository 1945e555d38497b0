package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 relevance scoring against a fixed query term set (Robertson et
  * al.; the Lucene idf variant ln(1 + (N − df + 0.5)/(df + 0.5)), which
  * keeps idf positive for df > N/2).
  *
  * Scale shape: corpus statistics (N, avgdl, per-term df) are ONE global
  * aggregate producing a single row — broadcast back as scalars — and the
  * score itself is a pure projection over the scan (per-term tf from the
  * token array). No shuffle proportional to the corpus: the plan is
  * scan → project, plus a 1-row cross join the planner broadcasts. Term
  * count is query-bounded (a handful), not data-bounded.
  */
object TextRanking {

  def bm25(
      df: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "terms must be non-empty")
    // NULL text scores like an empty document, not NULL
    val toks = TextFunctions.safeLowerTokens(col(textCol))
    val base = graft.prep.Preprocessing.spread(df)
      .select(col(idCol), toks.as("__toks"))
      .withColumn("__dl", size(col("__toks")).cast("double"))
    // one row: N, avgdl, df per term. Document lengths and df counts are
    // integer-valued doubles, so the sums (hence avg) are exact and
    // order-independent — safe to compare cross-engine bit-for-bit.
    val statAggs =
      count(lit(1)).cast("double").as("__n") +:
        avg(col("__dl")).as("__avgdl") +:
        terms.zipWithIndex.map { case (t, i) =>
          sum(when(array_contains(col("__toks"), t), 1L).otherwise(0L))
            .cast("double").as(s"__df_$i")
        }
    val stats = base.agg(statAggs.head, statAggs.tail: _*)
    val score: Column = terms.zipWithIndex.map { case (t, i) =>
      val tf = size(filter(col("__toks"), x => x === lit(t))).cast("double")
      val idf = log(lit(1.0) +
        (col("__n") - col(s"__df_$i") + 0.5) / (col(s"__df_$i") + 0.5))
      idf * tf * (k1 + 1.0) /
        (tf + lit(k1) * (lit(1.0) - b + lit(b) * col("__dl") / col("__avgdl")))
    }.reduce(_ + _)
    base.crossJoin(broadcast(stats))
      .select(col(idCol), round(score, 6).as("bm25"))
  }

  /** BM25 against a query-terms RELATION — the search-engine shape: terms
    * arrive as a (small) DataFrame instead of a compiled-in list, so the
    * same plan serves any query without re-codegen, and per-term document
    * frequencies come from ONE aggregation.
    *
    * Scale shape: the corpus side explodes to (doc, token) rows that
    * immediately broadcast-hash-join the term set — non-matching tokens
    * never leave the scan pipeline, so the only corpus-proportional
    * shuffles are (doc, term) tf aggregates over MATCHED postings
    * (query-bounded selectivity). df per term is a tiny aggregate
    * (rows = term count), broadcast back; corpus stats are one broadcast
    * scalar row; unmatched docs rejoin with score 0 through an id-keyed
    * left join on the doc spine. The plan reads the corpus a CONSTANT
    * number of times (stats, tf-for-score, tf-for-df, spine — each a
    * 2-column pipelined scan; a production search deployment materializes
    * the posting frame once and pays one) and every join is equi-keyed or
    * a broadcast scalar — nothing quadratic, nothing skew-keyed (df comes
    * from an aggregate, NOT a per-term window, so a stopword term cannot
    * funnel the matched frame through one task).
    *
    * Scores equal [[bm25]] for the same term set to the 6-dp rounding
    * (the per-doc sum associates in row order rather than term-list
    * order — a ≤1-ulp double difference absorbed by round(6)).
    */
  def bm25Relation(
      df: DataFrame,
      idCol: String,
      textCol: String,
      terms: DataFrame,
      termCol: String = "term",
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    val toks = TextFunctions.safeLowerTokens(col(textCol))
    val base = graft.prep.Preprocessing.spread(df)
      .select(col(idCol), toks.as("__toks"))
      .withColumn("__dl", size(col("__toks")).cast("double"))
    val stats = base.agg(count(lit(1)).cast("double").as("__n"),
      avg(col("__dl")).as("__avgdl"))
    val t = broadcast(terms.select(col(termCol).as("__term")).distinct())
    val matched = base
      .select(col(idCol), col("__dl"), explode(col("__toks")).as("__tok"))
      .join(t, col("__tok") === col("__term"))
      .groupBy(col(idCol), col("__dl"), col("__term"))
      .agg(count(lit(1)).cast("double").as("__tf"))
    val dfreq = matched.groupBy(col("__term"))
      .agg(count(lit(1)).cast("double").as("__df"))
    val scored = matched
      .join(broadcast(dfreq), Seq("__term"))
      .crossJoin(broadcast(stats))
      .select(col(idCol),
        (log(lit(1.0) +
          (col("__n") - col("__df") + 0.5) / (col("__df") + 0.5)) *
          col("__tf") * (k1 + 1.0) /
          (col("__tf") +
            lit(k1) * (lit(1.0) - b + lit(b) * col("__dl") / col("__avgdl"))))
          .as("__s"))
      .groupBy(col(idCol)).agg(sum(col("__s")).as("__score"))
    base.select(col(idCol))
      .join(scored, Seq(idCol), "left_outer")
      .select(col(idCol),
        round(coalesce(col("__score"), lit(0.0)), 6).as("bm25"))
  }
}
