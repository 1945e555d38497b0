package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.global.GlobalTrainer
import graft.local.LocalTrainer
import graft.tree.ProximityTree

/** Time-series-classification queries — the reference's two training
  * strategies (SURVEY §3.2/§3.4) driven end-to-end over the `embeddings`
  * table (64-point series, 10 classes). Deterministic: fixed train/test
  * split on vec_id, seeded learners, md5-keyed partition balance. Not
  * SQL-expressible → driver applies the rows-only check; accuracy-band
  * assertions live in ScalaTest (SURVEY §7 hard part (c)).
  */
object TscQueries {

  private val dim = 64
  private val featureCols: Seq[String] = (0 until dim).map(i => s"_f$i")

  /** embeddings → wide (label, _f0.._f63) frame. */
  private def wide(s: SparkSession, d: String): DataFrame = {
    val cols = Seq(col("vec_id"), col("label").cast("int").as("label")) ++
      (0 until dim).map(i => col("embedding").getItem(i).cast("double").as(s"_f$i"))
    Tables.embeddings(s, d).select(cols: _*)
  }

  private def confusion(pred: DataFrame): DataFrame =
    pred.groupBy(col("label"), col("prediction"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("label"), col("prediction"))

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    baseQueries ++ scaleQuery ++ mediaQuery

  private val baseQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Local strategy: k per-partition trees -> forest vote
    "q_tsc_local_forest" -> ((s, d) => {
      val all = wide(s, d)
      val train = all.filter(col("vec_id") < 400)
      val test = all.filter(col("vec_id") >= 400 && col("vec_id") < 500)
      val forest = LocalTrainer.trainEnsemble(
        s, train.drop("vec_id"), "label", featureCols,
        numPartitions = 4,
        params = ProximityTree.Params(nSplitters = 3, seed = 42,
          poolNames = Seq("euclidean", "manhattan")),
        deterministicKeyCol = None) // train already deterministic subset
      confusion(LocalTrainer.predict(s, forest, test, featureCols))
    }),

    // Global strategy: one distributed level-synchronous tree
    // (repartition the single-file scan so level jobs parallelize)
    "q_tsc_global_tree" -> ((s, d) => {
      val all = wide(s, d)
      val train = all.filter(col("vec_id") < 400).repartition(8)
      val test = all.filter(col("vec_id") >= 400 && col("vec_id") < 500)
      val tree = GlobalTrainer.fit(
        s, train, "label", featureCols,
        ProximityTree.Params(nSplitters = 3, maxDepth = 8, seed = 42,
          poolNames = Seq("euclidean", "manhattan")))
      confusion(LocalTrainer.predictTree(s, tree, test, featureCols))
    })
  )

  /** Scaling proof for the distributed trainer: one level-synchronous tree
    * over the FULL lineitem fact table (numeric features, returnflag as
    * label) — 600k rows at sf0.1, millions at sf1. Depth-capped: the point
    * is per-level cost scaling with rows, not model quality on synthetic
    * labels. The level loop's job count is independent of node count, so
    * wall-clock grows ~linearly with data volume.
    */
  lazy val scaleQuery: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_tsc_global_scale" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(
        when(col("l_returnflag") === "A", 0)
          .when(col("l_returnflag") === "N", 1).otherwise(2).as("label"),
        col("l_quantity").as("_f0"), col("l_extendedprice").as("_f1"),
        col("l_discount").as("_f2"), col("l_tax").as("_f3"))
      val tree = GlobalTrainer.fit(
        s, li, "label", Seq("_f0", "_f1", "_f2", "_f3"),
        ProximityTree.Params(nSplitters = 2, maxDepth = 3,
          minSamplesSplit = 1000, seed = 42, poolNames = Seq("euclidean")))
      confusion(LocalTrainer.predictTree(
        s, tree, li.sample(0.01, 42), Seq("_f0", "_f1", "_f2", "_f3")))
    }))

  /** Multimodal plumbing driven through the driver gate: documents' text
    * bytes stand in for opaque media payloads (deterministic), exercising
    * the binary-column feature-extraction path end-to-end.
    */
  lazy val mediaQuery: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_media_features" -> ((s, d) => {
      val media = Tables.documents(s, d).select(
        col("doc_id").as("media_id"),
        lit("image").as("kind"),
        encode(col("text"), "UTF-8").as("payload"),
        lit(32).as("width"), lit(32).as("height"),
        lit(null).cast("int").as("sample_rate"),
        lit(null).cast("long").as("duration_ms"))
      graft.multimodal.Multimodal.imageFeatures(s, media, dim = 4)
        .select(col("media_id"),
          round(element_at(col("features"), 1), 4).as("f0"),
          round(element_at(col("features"), 2), 4).as("f1"))
    }))

  /** Not SQL-expressible — no oracle entries; driver rows-only check. */
  val oracles: Map[String, String] = Map.empty
}
