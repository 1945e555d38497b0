package graft.ml

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.eval.Metrics
import graft.io.Ingestion

class MlPipelineSpec extends AnyFunSuite with SparkSpec {

  test("MLlib RandomForest pipeline classifies ECG5000 above majority baseline") {
    assume(graft.TestData.ecg5000Available, "reference ECG5000 checkout absent")
    val df = Ingestion.readUcrTsv(spark,
      graft.TestData.ecg5000Path, numFeatures = 140)
    val (train, test) = graft.split.Splits.hashSplit(df.withColumn(
      "rid", org.apache.spark.sql.functions.monotonically_increasing_id()),
      "rid", sixteenths = 13)
    val features = Ingestion.featureCols(140)
    val model = MlPipeline.fit(train, "label", features,
      MlPipeline.Config(numTrees = 30, maxDepth = 6, seed = 7))
    val pred = MlPipeline.predict(model, test, "label")
    assert(pred.columns.contains("prediction"))
    val acc = Metrics.accuracy(
      pred.withColumn("prediction",
        org.apache.spark.sql.functions.col("prediction").cast("int")),
      "label", "prediction")
    assert(acc > 0.8, s"accuracy $acc")
  }
}
