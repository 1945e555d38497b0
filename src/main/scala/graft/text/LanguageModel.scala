package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** In-corpus bigram language-model scoring — the CCNet-style LM quality
  * filter (Wenzek et al. 2020 score documents with a KenLM model and
  * keep the low-perplexity band; the Spark-shaped equivalent trains the
  * n-gram LM FROM the corpus in the same plan): P(w2|w1) with add-k
  * smoothing over corpus bigram/prefix counts, each document scored by
  * its mean bigram log-probability. Gibberish and vocabulary floods sit
  * in the low tail, templated boilerplate in the high tail — the two
  * bands a curation pipeline cuts.
  *
  * Scale shape: the LM is two equi-keyed aggregates over exploded bigram
  * postings (map-side combine; gram keys distribute). Prefix totals
  * attach to the LM table aggregate-to-aggregate on w1 (vocab-bounded
  * rows), and postings then join the combined LM on the BIGRAM key only —
  * high key diversity, so a stopword prefix like "the" cannot funnel the
  * posting frame through one task. The vocabulary size for the smoothing
  * denominator is one broadcast scalar. Docs without bigrams rejoin with
  * score 0 through an id-keyed left join on the doc spine. Everything is
  * scan → explode → equi-join → aggregate: no broadcast of anything
  * data-sized, nothing quadratic.
  */
object LanguageModel {

  private def toks(textCol: Column): Column =
    TextFunctions.safeLowerTokens(textCol)

  /** (w1, bg) structs for each sequential bigram, with multiplicity. */
  private def bigramArr(t: Column): Column =
    when(size(t) >= 2,
      zip_with(slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1),
        (a, b) => struct(a.as("w1"), concat_ws(" ", a, b).as("bg"))))
      .otherwise(array())

  /** (idCol, n_bigrams, avg_logprob): mean ln P(w2|w1) over the document's
    * bigram sequence, P = (c(w1w2) + k) / (c(w1·) + k·V), V = unigram
    * vocabulary size. Trained on `df` itself, so every document bigram
    * hits the LM table; smoothing keeps the mass proper.
    */
  def bigramLogProbScores(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Double = 0.5): DataFrame = {
    require(k > 0, s"smoothing k must be > 0, got $k")
    val (lm, vocab) = trainCounts(df, textCol)
    scoreWith(df, idCol, textCol, lm, vocab, k)
  }

  /** The LM's entire model state, trained once at rebuild cadence (r19
    * verdict task 3): the (__bg, __cbg, __cw1) count table — bigram
    * count with its prefix total attached aggregate-to-aggregate — and
    * the 1-row unigram vocabulary size for the smoothing denominator.
    * Both are exactly what [[bigramLogProbScores]] derives in-plan;
    * freeze them (localCheckpoint / write) and serve new documents via
    * [[scoreWith]] — the production CCNet cadence, where the reference
    * LM retrains at snapshot cadence, not per scoring batch.
    */
  def trainCounts(df: DataFrame, textCol: String): (DataFrame, DataFrame) = {
    val base = graft.prep.Preprocessing.spread(df)
      .select(toks(col(textCol)).as("__toks"))
    val postings = base
      .select(explode(bigramArr(col("__toks"))).as("__p"))
      .select(col("__p.w1").as("__w1"), col("__p.bg").as("__bg"))
    val cbg = postings.groupBy(col("__w1"), col("__bg"))
      .agg(count(lit(1)).as("__cbg"))
    // r20 (guide §2.3 "aggregate before you shuffle"): the prefix total
    // c(w1·) = Σ_bg c(w1,bg) EXACTLY, so derive it from the bigram-count
    // aggregate with a vocab-scale window instead of a second full pass
    // over the data-scale postings (old shape: postings → groupBy(w1) →
    // join — one more corpus-scale aggregate plus a vocab join; new
    // shape: one window over the already-aggregated cbg rows, per-w1
    // groups vocab-bounded). Integer sums — bit-identical counts.
    val ww1 = org.apache.spark.sql.expressions.Window.partitionBy(col("__w1"))
    val lm = cbg
      .select(col("__bg"), col("__cbg"),
        sum(col("__cbg")).over(ww1).as("__cw1"))
    val vocab = base
      .select(explode(col("__toks")).as("__tok"))
      .agg(countDistinct(col("__tok")).cast("double").as("__v"))
    (lm, vocab)
  }

  /** The frozen-stats SERVING face: score `df` against a FROZEN count
    * table + vocab scalar from [[trainCounts]]. Serving semantics for
    * out-of-model bigrams: a bigram the frozen LM never saw carries no
    * defined P(w2|w1) under this add-k model (its prefix total may be
    * equally unseen), so it is EXCLUDED — `n_bigrams` counts the KNOWN
    * bigrams a doc was scored on, and a doc with zero known bigrams
    * surfaces (0, 0.0) through the spine join rather than vanishing.
    * Scoring is per-doc against broadcast-joined model state — no
    * cross-doc dependency, so it runs identically inside a foreachBatch
    * micro-batch (LanguageModelSpec pins stream == batch). In-corpus
    * training makes every bigram known, which is why
    * [[bigramLogProbScores]] == trainCounts + scoreWith exactly.
    */
  def scoreWith(
      df: DataFrame,
      idCol: String,
      textCol: String,
      lm: DataFrame,
      vocab: DataFrame,
      k: Double = 0.5): DataFrame = {
    require(k > 0, s"smoothing k must be > 0, got $k")
    val base = graft.prep.Preprocessing.spread(df)
      .select(col(idCol), toks(col(textCol)).as("__toks"))
    val postings = base
      .select(col(idCol), explode(bigramArr(col("__toks"))).as("__p"))
      .select(col(idCol), col("__p.w1").as("__w1"), col("__p.bg").as("__bg"))
    val scored = postings
      .join(lm.drop("__w1"), Seq("__bg"))
      .crossJoin(broadcast(vocab))
      .select(col(idCol),
        log((col("__cbg") + k) / (col("__cw1") + lit(k) * col("__v"))).as("__lp"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_bigrams"),
        (sum(col("__lp")) / count(lit(1))).as("__avg"))
    base.select(col(idCol))
      .join(scored, Seq(idCol), "left_outer")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        round(coalesce(col("__avg"), lit(0.0)), 6).as("avg_logprob"))
  }
}
