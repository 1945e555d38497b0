package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.RandomForestClassifier
import org.apache.spark.ml.feature.{MinMaxScaler, StringIndexer, VectorAssembler}
import org.apache.spark.sql.DataFrame

/** Spark MLlib pipeline strategy — the idiomatic-Spark alternative to the
  * custom Proximity learners: feature assembly + scaling + a distributed
  * tree ensemble as one `Pipeline`, trained and applied by MLlib's own
  * distributed implementations.
  *
  * This is deliberately NOT in the reference (it shells out to aeon on
  * pandas); it exists because a user at 100 TB should get the
  * platform-native estimator family for the same wide-table classification
  * task, with identical input/output contracts as the Proximity paths
  * (labelCol + featureCols in, `prediction` out).
  */
object MlPipeline {

  final case class Config(
      numTrees: Int = 50,
      maxDepth: Int = 8,
      seed: Long = 42L,
      scale: Boolean = false)

  /** Build the pipeline: assemble wide features into a vector
    * (+ optional min-max scaling), index labels, fit a RandomForest.
    */
  def pipeline(labelCol: String, featureCols: Seq[String], cfg: Config): Pipeline = {
    val assembler = new VectorAssembler()
      .setInputCols(featureCols.toArray)
      .setOutputCol("features_raw")
      .setHandleInvalid("skip")
    val indexer = new StringIndexer()
      .setInputCol(labelCol)
      .setOutputCol("label_idx")
      .setStringOrderType("alphabetAsc") // deterministic label mapping
    val (featuresCol, scaleStages) =
      if (cfg.scale) {
        val sc = new MinMaxScaler().setInputCol("features_raw").setOutputCol("features")
        ("features", Seq(sc))
      } else ("features_raw", Nil)
    val rf = new RandomForestClassifier()
      .setLabelCol("label_idx")
      .setFeaturesCol(featuresCol)
      .setPredictionCol("prediction_idx")
      .setNumTrees(cfg.numTrees)
      .setMaxDepth(cfg.maxDepth)
      .setSeed(cfg.seed)
    new Pipeline().setStages(
      (Seq(assembler, indexer) ++ scaleStages :+ rf).toArray)
  }

  def fit(train: DataFrame, labelCol: String, featureCols: Seq[String],
      cfg: Config = Config()): PipelineModel =
    pipeline(labelCol, featureCols, cfg).fit(train)

  /** Apply + map the indexed prediction back to the original label domain. */
  def predict(model: PipelineModel, test: DataFrame, labelCol: String): DataFrame = {
    import org.apache.spark.ml.feature.StringIndexerModel
    import org.apache.spark.sql.functions._
    val labels = model.stages.collectFirst {
      case m: StringIndexerModel => m.labelsArray.head
    }.getOrElse(throw new IllegalStateException("no StringIndexerModel in pipeline"))
    val mapping = typedlit(labels.toSeq)
    model.transform(test)
      .withColumn("prediction",
        element_at(mapping, col("prediction_idx").cast("int") + 1))
      .drop("features_raw", "features", "label_idx", "prediction_idx",
        "rawPrediction", "probability")
  }
}
