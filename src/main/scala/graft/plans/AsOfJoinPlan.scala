package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, BindReferences, Expression, GenericInternalRow,
  JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join — the full custom-operator path (logical node →
  * planner strategy → physical sort-merge exec), for the one relational
  * operator the engine needs that Spark has no built-in for.
  *
  * Semantics: every left row is joined to the LAST right row of the same
  * key with rightTime <= leftTime (nulls when none). Physical shape: both
  * sides hash-clustered on key and sorted by (key, time) — declared via
  * requiredChildDistribution/Ordering so EnsureRequirements inserts the
  * exchanges/sorts — then one streaming merge pass per partition with an
  * O(1) "last right row" buffer. No build-side materialization: memory is
  * one row per stream regardless of partition size, so a 100 TB fact side
  * streams through.
  */
final case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    leftTime: Expression,
    rightKey: Expression,
    rightTime: Expression) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

final case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    leftTime: Expression,
    rightKey: Expression,
    rightTime: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyB = BindReferences.bindReference(leftKey, left.output)
    val lTimeB = BindReferences.bindReference(leftTime, left.output)
    val rKeyB = BindReferences.bindReference(rightKey, right.output)
    val rTimeB = BindReferences.bindReference(rightTime, right.output)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    val rightArity = right.output.size
    val outSchema = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val nullRight = new GenericInternalRow(rightArity)
      val joined = new JoinedRow
      val project = UnsafeProjection.create(outSchema, outSchema)
      val buffered = rIter.buffered

      // last right row (copied) whose (key, time) <= current left (key, time)
      var heldKey: Any = null
      var heldRow: InternalRow = null

      lIter.map { lRow =>
        val lk = lKeyB.eval(lRow)
        val lt = lTimeB.eval(lRow)
        if (lk == null || lt == null) {
          // null key/time never matches; ascending sort puts these rows
          // first, so the held-row state is untouched
          project(joined(lRow, nullRight))
        } else {
          // drop held row if from an earlier key group
          if (heldRow != null && keyOrd.compare(heldKey, lk) != 0) {
            heldRow = null; heldKey = null
          }
          // advance the right side to the last row at-or-before (lk, lt),
          // discarding right rows with null key or time (they sort first
          // and can match nothing)
          var advancing = true
          while (advancing && buffered.hasNext) {
            val peek = buffered.head
            val rk = rKeyB.eval(peek)
            if (rk == null) { buffered.next(); () }
            else {
              val kc = keyOrd.compare(rk, lk)
              if (kc < 0) { buffered.next(); () } // key group already passed
              else if (kc == 0) {
                val rt = rTimeB.eval(peek)
                if (rt == null) { buffered.next(); () }
                else if (timeOrd.compare(rt, lt) <= 0) {
                  heldRow = buffered.next().copy()
                  heldKey = rk
                } else advancing = false
              } else advancing = false
            }
          }
          val r = if (heldRow != null) heldRow else nullRight
          project(joined(lRow, r))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, lt, rk, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, lt, rk, rt) :: Nil
    case _ => Nil
  }
}

object AsOfJoinPlan {

  /** Ensure the strategy is installed (idempotent; public experimental
    * hook — no session-build-time extension required). */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies = cur :+ AsOfJoinStrategy
  }

  /** Native as-of join of two DataFrames on (keyCol, timeCol). Right-side
    * column names must not collide with left's (rename first).
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      leftKeyCol: String, leftTimeCol: String,
      rightKeyCol: String, rightTimeCol: String): DataFrame = {
    val spark = left.sparkSession
    install(spark)
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"no column $name"))
    val node = AsOfJoinNode(lPlan, rPlan,
      attr(lPlan, leftKeyCol), attr(lPlan, leftTimeCol),
      attr(rPlan, rightKeyCol), attr(rPlan, rightTimeCol))
    org.apache.spark.sql.GraftColumnBridge.ofRows(spark, node)
  }

  /** FORWARD as-of (pandas merge_asof direction="forward"): every left
    * row joined to the FIRST right row of the same key with
    * rightTime >= leftTime (equality included) — the "next scheduled
    * event / next price tick" enrichment. Implemented as the backward
    * operator over NEGATED times (last right with -rt <= -lt IS the
    * first right with rt >= lt), so the exact same exchange/sort/merge
    * physical machinery runs; time columns must be numeric (the catalog
    * convention: epoch micros as long).
    */
  def asOfForward(
      left: DataFrame,
      right: DataFrame,
      leftKeyCol: String, leftTimeCol: String,
      rightKeyCol: String, rightTimeCol: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, when}
    val lNeg = left.withColumn("__negt_l", -col(leftTimeCol).cast("long"))
    val rNeg = right.withColumn("__negt_r", -col(rightTimeCol).cast("long"))
    asOf(lNeg, rNeg, leftKeyCol, "__negt_l", rightKeyCol, "__negt_r")
      .drop("__negt_l", "__negt_r")
  }

  /** NEAREST as-of (pandas direction="nearest"): the right row
    * minimizing |rightTime - leftTime| within the key; ties break
    * BACKWARD (the at-or-before row wins), matching the convention the
    * scaladoc pins so both engines replay it. Needs `leftIdCol` unique
    * per left row to stitch the backward and forward candidates back
    * together — two runs of the native operator and one id-keyed join
    * of the (left-row-scale) results, never a widened state machine.
    * Right columns other than the key arrive suffixed `_b`/`_f` on the
    * candidate frames and the winner is CASE-selected per column.
    */
  def asOfNearest(
      left: DataFrame,
      right: DataFrame,
      leftIdCol: String,
      leftKeyCol: String, leftTimeCol: String,
      rightKeyCol: String, rightTimeCol: String,
      valueCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.{col, when}
    def renamed(suffix: String): (DataFrame, Seq[String], String) = {
      val vs = valueCols.map(c => s"$c$suffix")
      val rt = s"$rightTimeCol$suffix"
      val df = (valueCols :+ rightTimeCol).foldLeft(right)((d, c) =>
        d.withColumnRenamed(c, s"$c$suffix"))
      (df, vs, rt)
    }
    val (rb, vb, rtb) = renamed("_b")
    val (rf, vf, rtf) = renamed("_f")
    val back = asOf(left, rb, leftKeyCol, leftTimeCol, rightKeyCol, rtb)
      .select((leftIdCol +: rtb +: vb).map(col): _*)
    val fwd = asOfForward(left, rf, leftKeyCol, leftTimeCol, rightKeyCol, rtf)
      .select((leftIdCol +: rtf +: vf).map(col): _*)
    // backward wins when the forward side is absent OR not strictly
    // closer: (lt - rt_b) <= (rt_f - lt), null-safe on both sides
    val joined = left.join(back, Seq(leftIdCol), "left_outer")
      .join(fwd, Seq(leftIdCol), "left_outer")
    val lt = col(leftTimeCol).cast("long")
    val backWins = col(rtf).isNull ||
      (col(rtb).isNotNull && (lt - col(rtb)) <= (col(rtf) - lt))
    joined.select(left.columns.map(col) ++
      valueCols.zip(vb.zip(vf)).map { case (c, (b, f)) =>
        when(backWins, col(b)).otherwise(col(f)).as(c)
      } :+ when(backWins, col(rtb)).otherwise(col(rtf))
        .as(s"${rightTimeCol}_matched"): _*)
  }
}
