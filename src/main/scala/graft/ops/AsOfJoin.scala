package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (point-in-time join): for every left row, attach the single
  * most recent right row with `rightTime <= leftTime` within the same key —
  * the canonical time-series enrichment operator Spark lacks as a built-in.
  *
  * Compose-built-ins formulation (preference (a) from the design notes):
  * tag + union both sides, one window sorted by (time, side) per key carries
  * the last-seen right payload forward, then keep left rows. Cost: one
  * shuffle of the union by key + one in-partition sort — the same shape a
  * native sort-merge as-of implementation pays (see
  * [[graft.plans.AsOfJoinExec]] for the native operator).
  */
object AsOfJoin {

  /** @param valueCols right-side columns to carry onto left rows (null when
    *                  no right row is at or before the left row's time)
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      timeCol: String,
      valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!valueCols.exists(leftCols.contains),
      "right value columns must not collide with left columns")

    // All value columns travel as ONE struct so the carried values always
    // come from the same right row — per-column last(ignoreNulls) would
    // stitch a null field from an older right row into a newer match.
    val payloadType = org.apache.spark.sql.types.StructType(
      valueCols.map(c => org.apache.spark.sql.types.StructField(
        c, right.schema(c).dataType, nullable = true)))

    val taggedLeft = left.withColumn("_side", lit(1))
      .withColumn("_payload", lit(null).cast(payloadType))
    val taggedRight = leftCols.filterNot(c => c == keyCol || c == timeCol)
      .foldLeft(right.select(
        (keyCol +: timeCol +: valueCols).map(col): _*)
        .withColumn("_payload", struct(valueCols.map(col): _*))
        .withColumn("_side", lit(0)))((df, c) =>
        df.withColumn(c, lit(null).cast(left.schema(c).dataType)))

    val outCols = (leftCols :+ "_payload" :+ "_side").map(col)
    val unioned = taggedLeft.select(outCols: _*)
      .unionByName(taggedRight.select(outCols: _*))

    // right rows (side 0) sort before left rows (side 1) at equal times, so
    // a right row AT the left row's timestamp is visible to it
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(timeCol), col("_side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = unioned.withColumn(
      "_payload", last(col("_payload"), ignoreNulls = true).over(w))
    carried.filter(col("_side") === 1)
      .select(leftCols.map(col) ++
        valueCols.map(c => col("_payload")(c).as(c)): _*)
  }
}
