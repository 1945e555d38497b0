package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-shaped data selection — importance resampling over hashed
  * n-gram features (the Xie et al. 2023 "Data Selection for Language
  * Models via Importance Resampling" recipe): pick raw-pool documents
  * whose n-gram distribution looks like a curated TARGET set, the move
  * a pre-training pipeline runs between dedup and mixing when it has a
  * small high-quality seed corpus and a vast raw crawl.
  *
  * Features are unigrams + space-joined bigrams of the lowercased
  * whitespace tokens ([[graft.text.TextFunctions.safeLowerTokens]]),
  * hashed into `buckets` bins by the md5 bucket function the codebook
  * encoder uses ([[graft.prep.Codebook.hashEncode]] — the same
  * DuckDB-mirrorable hash as q_feature_hash/q_cms_freq). Both
  * distributions get add-`alpha` smoothing, so every bucket has defined
  * mass; a raw doc's importance weight is
  *
  *   score(doc) = Σ_{gram ∈ doc} [ ln p̂_target(bucket(gram))
  *                                − ln p̂_raw(bucket(gram)) ]
  *
  * — the log likelihood ratio of the doc under the two hashed-unigram/
  * bigram models, summed per OCCURRENCE (a doc repeating target-like
  * phrasing scores higher, the DSIR bag-of-ngrams semantics).
  *
  * Plan shape at 100 TB: one explode pass feeds ONE map-side-combined
  * groupBy(bucket) that computes BOTH distributions (≤ `buckets` rows —
  * the bounded-stats boundary every trainer here respects); the ratio
  * table broadcasts back onto the raw gram stream; scoring is one
  * map-side-combined groupBy(doc). No corpus-sized shuffle anywhere —
  * gram rows move only into combiners. Per-gram log-ratios are
  * round(12) → DECIMAL(38,12)-summed (the LogReg doctrine), so scores
  * are bit-identical under repartitioning and the DuckDB oracle replays
  * them exactly.
  *
  * Docs with zero grams (null/empty text) have no distribution evidence
  * and are unscorable — they simply don't appear (callers wanting a
  * total ranking can left-join the corpus spine).
  */
object Dsir {

  /** The hashed gram stream (id[, is_target], bucket) — ONE definition
    * for the in-corpus trainer and the frozen-stats serving face, so a
    * served doc hashes exactly like a training doc. Unigrams + adjacent
    * bigrams, one array per doc, then exploded; spread BEFORE the
    * explode (the LanguageModel/TextIndex idiom): a small-file corpus
    * scan is one partition, and without it both gram passes serialize
    * on a single task.
    */
  private def gramBuckets(docs: DataFrame, idCol: String, textCol: String,
      buckets: Int, isTarget: Option[Column]): DataFrame = {
    val toks = graft.text.TextFunctions.safeLowerTokens(col(textCol))
    val nBi = greatest(size(col("__toks")) - 1, lit(0))
    val tagged = graft.prep.Preprocessing.spread(docs)
      .select(col(idCol).as("id") +:
        isTarget.map(_.as("is_target")).toSeq :+ toks.as("__toks"): _*)
    val grams0 = tagged
      .select(col("id") +: isTarget.map(_ => col("is_target")).toSeq :+
        explode(concat(col("__toks"),
          zip_with(slice(col("__toks"), lit(1), nBi),
            slice(col("__toks"), lit(2), nBi),
            (a, b) => concat(a, lit(" "), b)))).as("gram"): _*)
    graft.prep.Codebook.hashEncode(grams0, "gram", "bucket", buckets)
      .drop("gram")
  }

  /** The per-doc scoring aggregate — shared by [[importanceScores]] and
    * [[scoreWith]]: per-gram log-ratio round(12) → DECIMAL(38,12) sum
    * (bit-identical under repartitioning, DuckDB-replayable). */
  private def scoreGrams(grams: DataFrame, ratio: DataFrame): DataFrame =
    grams.join(broadcast(ratio), Seq("bucket"))
      .groupBy(col("id"))
      .agg(round(sum(round(col("logratio"), 12).cast("decimal(38,12)"))
        .cast("double"), 6).as("score"))

  /** The trained bucket log-ratio table (bucket, logratio) — ≤ `buckets`
    * rows, broadcast-sized: DSIR's entire model state. The production
    * cadence trains it from a REFERENCE snapshot at rebuild time and
    * serves new documents against the frozen table via [[scoreWith]]
    * (r19 verdict task 3); [[importanceScores]] is the same arithmetic
    * trained in-plan.
    */
  def ratios(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, buckets: Int = 256,
      alpha: Double = 0.5): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    require(alpha > 0.0, s"alpha must be positive, got $alpha")
    ratioFromGrams(
      gramBuckets(docs, idCol, textCol, buckets, Some(isTarget)),
      buckets, alpha)
  }

  private def ratioFromGrams(grams: DataFrame, buckets: Int,
      alpha: Double): DataFrame = {
    // both distributions in ONE bounded aggregate
    val counts = grams.groupBy(col("bucket")).agg(
      sum(when(col("is_target"), 1L).otherwise(0L)).as("t"),
      sum(when(col("is_target"), 0L).otherwise(1L)).as("r"))
    val totals = counts.agg(sum(col("t")).as("bigT"), sum(col("r")).as("bigR"))
    counts.crossJoin(broadcast(totals))
      .select(col("bucket"),
        (log((col("t") + lit(alpha)) /
            (col("bigT") + lit(alpha * buckets))) -
          log((col("r") + lit(alpha)) /
            (col("bigR") + lit(alpha * buckets)))).as("logratio"))
  }

  /** The frozen-stats SERVING face: (id, score) for every doc of `docs`
    * with ≥ 1 gram, scored against a FROZEN `ratiosDf` (bucket,
    * logratio — broadcast-sized, trained by [[ratios]] at rebuild
    * cadence). Same gram/hash/score definitions as the in-corpus
    * trainer, so scoring is a pure per-doc computation against
    * broadcast state — it runs identically inside a foreachBatch
    * micro-batch (each doc's grams arrive with the doc; no cross-doc
    * state), and DsirSpec pins stream == batch. Buckets the frozen
    * table wasn't trained with are a caller error the bucket join
    * surfaces as missing mass — pass the training `buckets`.
    */
  def scoreWith(docs: DataFrame, idCol: String, textCol: String,
      ratiosDf: DataFrame, buckets: Int = 256): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    scoreGrams(gramBuckets(docs, idCol, textCol, buckets, None), ratiosDf)
  }

  /** (id, score) for every non-target doc with ≥ 1 gram; `isTarget`
    * marks the curated seed rows INSIDE `docs` (the usual shape: one
    * corpus, a small labeled slice).
    */
  def importanceScores(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, buckets: Int = 256,
      alpha: Double = 0.5): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    require(alpha > 0.0, s"alpha must be positive, got $alpha")
    val grams = gramBuckets(docs, idCol, textCol, buckets, Some(isTarget))
    val ratio = ratioFromGrams(grams, buckets, alpha)
    scoreGrams(grams.filter(!col("is_target")).drop("is_target"), ratio)
  }

  /** The k most target-like raw docs — deterministic (score desc, id)
    * TakeOrdered; no global sort materializes.
    */
  def selectTopK(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, k: Int, buckets: Int = 256,
      alpha: Double = 0.5): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    importanceScores(docs, idCol, textCol, isTarget, buckets, alpha)
      .orderBy(desc("score"), asc("id")).limit(k)
  }

  /** Seeded Gumbel-top-k — the actual DSIR RESAMPLER beside
    * [[selectTopK]]'s deterministic head: adding Gumbel(0,1) noise to
    * each log-weight and taking the top k samples WITHOUT REPLACEMENT
    * with probability ∝ exp(score), i.e. ∝ the raw likelihood ratio
    * p̂_target/p̂_raw (the Gumbel-max trick; a pure head over-selects
    * one template, the resample keeps diversity). Noise is
    * hash-derived — md5(seed:id) → 52-bit uniform u = (v + 0.5)/2^52
    * (strictly inside (0,1), exactly representable) → −ln(−ln u) —
    * so the draw is deterministic given the seed and exactly
    * replayable by the DuckDB oracle: the seeded-hash randomness
    * doctrine every sampler in this repo uses. Still a pure
    * TakeOrdered over the scored frame; no extra pass.
    */
  def selectGumbel(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, k: Int, seed: Long = 42L, buckets: Int = 256,
      alpha: Double = 0.5): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val v = conv(substring(md5(concat(lit(s"$seed:"),
      col("id").cast("string"))), 1, 13), 16, 10).cast("long")
    val u = (v.cast("double") + lit(0.5)) / lit(4503599627370496.0) // 2^52
    val key = col("score") + (-log(-log(u)))
    importanceScores(docs, idCol, textCol, isTarget, buckets, alpha)
      .select(col("id"), col("score"), round(key, 6).as("key"))
      .orderBy(desc("key"), asc("id")).limit(k)
  }
}
