package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema evolution across file generations — the ingest-side reality of
  * a long-lived lake: yesterday's files carry INT ids and no
  * `priority_rank`; today's carry BIGINT ids and the new column. A
  * reader that unions generations must reconcile by NAME with type
  * WIDENING, never by position (`union` is positional and silently
  * mis-binds after a column add) and never by narrowing (ANSI mode makes
  * a long→int cast a runtime crash on the first wide value — correctly).
  *
  * Widening is a closed, explicit lattice (below) rather than Spark's
  * internal coercion rules: evolution decisions on a production table
  * should be deterministic and reviewable, not a side effect of analyzer
  * version. Unsupported pairs throw at PLAN time — a schema conflict
  * should fail the job before it reads a byte, not corrupt silently.
  *
  * Scale shape: pure projection per input (cast + null-fill) and a
  * union — no shuffle, no driver data movement; the scans still prune
  * and push down through the casts' child columns.
  */
object SchemaEvolution {

  /** Widest common type, or None if the pair doesn't widen losslessly.
    * byte<short<int<long; float<double; int-family→double is admitted
    * (the conventional lake rule; exact for |v| <= 2^53); date→timestamp;
    * identical types trivially. String absorbs nothing — an int column
    * that became string is a REWRITE, not an evolution.
    */
  def widen(a: DataType, b: DataType): Option[DataType] = {
    val intOrder = Seq[DataType](ByteType, ShortType, IntegerType, LongType)
    def intRank(t: DataType) = intOrder.indexOf(t)
    (a, b) match {
      case _ if a == b => Some(a)
      case _ if intRank(a) >= 0 && intRank(b) >= 0 =>
        Some(intOrder(math.max(intRank(a), intRank(b))))
      case (FloatType, DoubleType) | (DoubleType, FloatType) => Some(DoubleType)
      case _ if (intRank(a) >= 0 && (b == DoubleType || b == FloatType)) =>
        Some(DoubleType)
      case _ if (intRank(b) >= 0 && (a == DoubleType || a == FloatType)) =>
        Some(DoubleType)
      case (DateType, TimestampType) | (TimestampType, DateType) =>
        Some(TimestampType)
      case _ => None
    }
  }

  /** Schema-drift report — the DETECTION half next to [[unionEvolve]]'s
    * reconciliation: compare a table's loaded schema against the
    * contracted one and emit one row per difference class. `status`:
    * `ok` (name+type match), `type_widened` (actual widens losslessly
    * from expected — tolerable, the evolve path absorbs it),
    * `type_changed` (no lossless widening — a rewrite happened; page
    * someone), `missing` (contracted column absent), `added` (new column
    * not yet under contract). Pure metadata — the report materializes
    * from the parquet FOOTER schema, zero data rows read, so it can gate
    * every ingest batch for free.
    */
  def driftReport(spark: org.apache.spark.sql.SparkSession,
      expected: Seq[(String, DataType)], actual: StructType): DataFrame = {
    val actualMap = actual.fields.map(f => f.name -> f.dataType).toMap
    val expNames = expected.map(_._1).toSet
    val rows =
      expected.map { case (name, expT) =>
        actualMap.get(name) match {
          case None => (name, "missing", expT.simpleString, null: String)
          case Some(actT) if actT == expT =>
            (name, "ok", expT.simpleString, actT.simpleString)
          case Some(actT) if widen(expT, actT).contains(actT) =>
            (name, "type_widened", expT.simpleString, actT.simpleString)
          case Some(actT) =>
            (name, "type_changed", expT.simpleString, actT.simpleString)
        }
      } ++
        actual.fields.filterNot(f => expNames.contains(f.name))
          .map(f => (f.name, "added", null: String, f.dataType.simpleString))
    import spark.implicits._
    rows.toDF("col_name", "status", "expected_type", "actual_type")
  }

  /** Union any number of generations under the evolved schema: columns
    * matched by name (first-seen order), each column's type the
    * [[widen]]-fold of every generation that carries it, generations
    * missing a column contribute typed NULLs.
    */
  def unionEvolve(gens: Seq[DataFrame]): DataFrame = {
    require(gens.nonEmpty, "at least one generation")
    val evolved = gens.foldLeft(Vector.empty[StructField]) { (acc, df) =>
      df.schema.fields.foldLeft(acc) { (acc2, f) =>
        acc2.indexWhere(_.name == f.name) match {
          case -1 => acc2 :+ f
          case i =>
            val prev = acc2(i)
            val w = widen(prev.dataType, f.dataType).getOrElse(throw
              new IllegalArgumentException(
                s"column ${f.name}: ${prev.dataType.simpleString} and " +
                  s"${f.dataType.simpleString} do not widen — rewrite required"))
            acc2.updated(i, StructField(f.name, w,
              prev.nullable || f.nullable))
        }
      }
    }
    gens.map { df =>
      val have = df.columns.toSet
      df.select(evolved.map { f =>
        if (have.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
        else lit(null).cast(f.dataType).as(f.name)
      }: _*)
    }.reduce(_ unionByName _)
  }
}
