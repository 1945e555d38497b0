package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import TextFunctions.safeLowerTokens

/** Multinomial Naive Bayes trained and applied INSIDE the engine — the
  * fastText-shaped corpus classifier a curation pipeline runs at ingest
  * (language ID, source attribution, quality-tier routing) when a learned
  * signal must ride the same scan as the rule-based ones.
  *
  * Scale shape: training is ONE token explode + two aggregates (per-class
  * token counts, per-class totals) — map-side combined, no joins; the
  * model is a (class × vocab)-sparse weight relation plus a
  * classes-bounded scalar frame. Scoring cross-joins the token stream
  * with the BROADCAST class frame (|classes| is single digits — the same
  * bounded fan-out a dense softmax head pays) and left-joins the weight
  * relation on (class, token); the per-(doc, class) partial sums combine
  * map-side, so the only data-scale shuffle keys on (doc, class). At
  * 100 TB nothing here collects: the argmax is a doc_id-partitioned
  * row_number window.
  *
  * Determinism doctrine: add-one-smoothed log probabilities are frozen to
  * the fixed-point long domain w = floor(ln((c+1)/(tot+V))·10⁶ + 0.5)
  * (the [[TextQueries]] q_text_cosine idf pattern, scale 10⁶) so every
  * per-document score is an exact integer SUM — partial-aggregation order
  * and engine drop out, and the argmax replays bit-for-bit as SQL.
  * The train/test split is doc_id-residue (fold = id mod folds), the
  * engine-agnostic split every oracled split query here uses.
  *
  * Reference analogue: none — the reference outsources classification to
  * aeon; this is the training-data-pipeline face (CCNet/fastText langid
  * runs exactly this shape over a web corpus).
  */
object NaiveBayes {

  /** Fixed-point scale for log-domain weights: 10⁶ keeps a 1-ulp libm
    * divergence ~10 orders of magnitude away from the floor boundary
    * while per-doc sums stay far inside long range (|w| ≤ ~2·10⁷/token).
    */
  private val Scale = 1000000d

  private def fpLog(x: Column): Column =
    floor(log(x) * lit(Scale) + lit(0.5d)).cast("long")

  /** Train on folds ≠ `testFold` of `docs(idCol, labelCol, textCol)`,
    * score fold = `testFold`; returns one row per test document:
    * (doc_id, <labelCol> true label, pred, score) with `score` the
    * winning class's fixed-point log-posterior. Ties break toward the
    * lexicographically smaller class — pinned on both engines.
    */
  def trainPredict(docs: DataFrame, idCol: String, textCol: String,
      labelCol: String, folds: Int = 5, testFold: Int = 4): DataFrame = {
    val base = graft.prep.Preprocessing.spread(docs)
      .select(col(idCol).cast("long").as("doc_id"),
        col(labelCol).as("cls"), safeLowerTokens(col(textCol)).as("toks"))
    val train = base.filter(pmod(col("doc_id"), lit(folds)) =!= testFold)
    val test = base.filter(pmod(col("doc_id"), lit(folds)) === testFold)

    val trTok = train.select(col("cls"), explode(col("toks")).as("tok"))
    // ONE data-scale pass over the training tokens: the per-(class,
    // token) count frame — i.e. the model itself, (classes × vocab)-
    // bounded — MATERIALIZED because totals, vocabulary and weights all
    // derive from it and Spark shares no common subplans across
    // consumers: without the cut each consumer re-tokenized the corpus
    // (measured 3 recomputes × ~2.3 s at sf0.1). localCheckpoint(true)
    // is the corpus_build doctrine: bounded frame, lineage cut, blocks
    // GC-freed by the ContextCleaner.
    val ctok = trTok.groupBy(col("cls"), col("tok"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val tot = ctok.groupBy(col("cls")).agg(sum(col("c")).as("tot"))
    val vocab = ctok.agg(count_distinct(col("tok")).as("v"))
    // doc-level statistics re-derive without tokens: `toks` is column-
    // pruned out of these scans, so each is a plain filter-count pass
    val nd = train.groupBy(col("cls")).agg(count(lit(1)).as("nd"))
    val nTr = nd.agg(sum(col("nd")).as("ntr"))
    // classes-bounded frame: prior + the unseen-token default weight
    // (count 0 under the same smoothing) per class
    val classes = nd
      .join(tot, Seq("cls"))
      .crossJoin(broadcast(vocab)).crossJoin(broadcast(nTr))
      .select(col("cls"),
        fpLog(col("nd") / col("ntr")).as("prior"),
        fpLog(lit(1.0d) / (col("tot") + col("v"))).as("dflt"))
    // sparse (class, token) weight relation — only pairs seen in training
    val weights = ctok
      .join(tot, Seq("cls")).crossJoin(broadcast(vocab))
      .select(col("cls"), col("tok"),
        fpLog((col("c") + lit(1)) / (col("tot") + col("v"))).as("w"))

    val teTok = test.select(col("doc_id"), explode(col("toks")).as("tok"))
    val clsB = broadcast(classes)
    // token-level evidence: every test token scored under every class,
    // unseen (class, token) pairs falling back to the class default
    val tokSums = teTok.crossJoin(clsB.select(col("cls"), col("dflt")))
      .join(weights, Seq("cls", "tok"), "left_outer")
      .groupBy(col("doc_id"), col("cls"))
      .agg(sum(coalesce(col("w"), col("dflt"))).as("ev"))
    // spine keeps token-less test docs (score = prior alone)
    val spine = test.select(col("doc_id"), col("cls").as("lbl"))
      .crossJoin(clsB.select(col("cls"), col("prior")))
    val scored = spine.join(tokSums, Seq("doc_id", "cls"), "left_outer")
      .select(col("doc_id"), col("lbl"), col("cls"),
        (col("prior") + coalesce(col("ev"), lit(0L))).as("score"))
    val rk = row_number().over(Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("cls").asc))
    scored.withColumn("__rk", rk).filter(col("__rk") === 1)
      .select(col("doc_id"), col("lbl"), col("cls").as("pred"), col("score"))
  }
}
