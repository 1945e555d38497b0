package graft.local

import scala.util.Random

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.prep.Preprocessing
import graft.tree._

/** Local-models strategy (reference: code/src/local_model_manager.py:148-217):
  * split the data into k class-balanced partitions, train one sequential
  * Proximity Tree per partition inside `mapPartitions`, collect the (small)
  * fitted trees to the driver, and ensemble them into a forest.
  *
  * Scale shape: one shuffle (the class-balanced repartition), then training
  * is embarrassingly parallel with zero further data movement — only model
  * objects (KBs) cross the wire. The Python reference pays pandas/pickle
  * conversion per partition (local_model_manager.py:166-173); here rows
  * deserialize straight into primitive arrays.
  */
object LocalTrainer {

  /** In-partition stratified holdout (T3, reference:
    * code/src/local_model_manager.py:180-182): per label, seeded shuffle and
    * hold out `fraction` (at least 1 row stays in train per class).
    */
  def stratifiedHoldout(
      data: IndexedSeq[ProximityTree.Instance],
      fraction: Double,
      seed: Long): (IndexedSeq[ProximityTree.Instance], IndexedSeq[ProximityTree.Instance]) = {
    val rng = new Random(seed)
    val train = IndexedSeq.newBuilder[ProximityTree.Instance]
    val hold = IndexedSeq.newBuilder[ProximityTree.Instance]
    data.groupBy(_.label).toSeq.sortBy(_._1).foreach { case (_, insts) =>
      val shuffled = rng.shuffle(insts)
      val nHold = math.min(insts.size - 1, (insts.size * fraction).toInt)
      hold ++= shuffled.take(nHold)
      train ++= shuffled.drop(nHold)
    }
    (train.result(), hold.result())
  }

  /** Train one tree per partition; returns the assembled forest.
    *
    * @param df          input with `labelCol` + `featureCols`
    * @param holdoutFraction 0 disables the OOB holdout (weight 1.0/tree)
    */
  def trainEnsemble(
      spark: SparkSession,
      df: DataFrame,
      labelCol: String,
      featureCols: Seq[String],
      numPartitions: Int,
      params: ProximityTree.Params,
      holdoutFraction: Double = 0.0,
      useWeighting: Boolean = false,
      deterministicKeyCol: Option[String] = None): ProximityForestModel = {
    import spark.implicits._

    // seeded-random balance by default; md5(key)-ordered balance when a key
    // column is supplied (bit-reproducible across runs and engines)
    val balanced = deterministicKeyCol match {
      case Some(key) =>
        Preprocessing.deterministicPartitionId(df, labelCol, key, numPartitions)
          .repartitionByRange(numPartitions, col("_partition_id"))
          .drop("_partition_id")
      case None =>
        Preprocessing.classBalancedPartition(
          df, labelCol, numPartitions, seed = params.seed)
    }
    val packed = balanced.select(
      col(labelCol).cast("int").as("label"),
      array(featureCols.map(c => col(c).cast("double")): _*).as("ts"))
      .as[(Int, Array[Double])]

    // Trees come back as JSON strings (the model sink format) so the only
    // Encoder needed is the product (String, Double) — no Kryo/Java-ser.
    val fitted: Array[(String, Double)] = packed.mapPartitions { it =>
      val data = it.map { case (l, ts) => ProximityTree.Instance(ts, l) }.toIndexedSeq
      if (data.isEmpty) Iterator.empty
      else {
        val pid = TaskContext.getPartitionId()
        val treeSeed = params.seed + pid
        val (trainData, holdData) =
          if (holdoutFraction > 0)
            stratifiedHoldout(data, holdoutFraction, treeSeed)
          else (data, IndexedSeq.empty[ProximityTree.Instance])
        val model = ProximityTree.fit(trainData, params.copy(seed = treeSeed))
        val weight =
          if (holdData.nonEmpty)
            holdData.count(i => model.predictOne(i.ts) == i.label).toDouble / holdData.size
          else 1.0
        Iterator.single((ModelJson.treeJson(model), weight))
      }
    }.collect()

    require(fitted.nonEmpty, "no partition produced a tree (empty input?)")
    ProximityForestModel(
      fitted.map(f => ModelJson.treeFromJson(f._1)).toIndexedSeq,
      fitted.map(_._2).toIndexedSeq,
      useWeighting)
  }

  /** U4 — forest prediction: broadcast the fitted forest, route every row
    * through it (reference: code/src/prediction_manager.py:81-125). JVM-native
    * closure — the Arrow/pickle boundary of the reference disappears.
    */
  def predict(
      spark: SparkSession,
      forest: ProximityForestModel,
      df: DataFrame,
      featureCols: Seq[String],
      predictionCol: String = "prediction"): DataFrame = {
    val bc = spark.sparkContext.broadcast(forest)
    val predictUdf = udf((ts: Seq[Double]) => bc.value.predictOne(ts.toArray))
    df.withColumn(predictionCol,
      predictUdf(array(featureCols.map(c => col(c).cast("double")): _*)))
  }

  /** Single-tree prediction (used by the global path too). */
  def predictTree(
      spark: SparkSession,
      tree: ProximityTreeModel,
      df: DataFrame,
      featureCols: Seq[String],
      predictionCol: String = "prediction"): DataFrame = {
    val bc = spark.sparkContext.broadcast(tree)
    val predictUdf = udf((ts: Seq[Double]) => bc.value.predictOne(ts.toArray))
    df.withColumn(predictionCol,
      predictUdf(array(featureCols.map(c => col(c).cast("double")): _*)))
  }
}
