package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Golden-record survivorship — the master-data merge: an entity's
  * attributes arrive across many rows (sources, updates, partial events)
  * and the served record wants, PER COLUMN, the value from the latest row
  * where that column is actually populated — not the latest row's null
  * overwriting an older fact (the classic MDM mistake a plain
  * "latest row wins" makes).
  *
  * Scale shape: ONE map-side-combined hash aggregate — every attribute is
  * a `max_by(attr, recency-if-populated)` in the same groupBy, so the
  * merge is a single pass with an O(attrs) buffer per entity, no
  * window-per-column (N sorted shuffles of the corpus) and no
  * self-join-per-column. Spark's max_by skips rows whose ordering
  * expression is null, which is exactly the "only populated rows compete"
  * rule; `when(attr.isNotNull, struct(ts, tie))` encodes it. Ties are
  * impossible when `tieCol` is unique; recency comparison is
  * lexicographic on (ts, tie), matching the oracle's
  * `ORDER BY ts DESC, tie DESC` window replay (q_golden_record).
  */
object Survivorship {

  /** Per `entityCol`: each attr's latest-non-null value by (tsCol DESC,
    * tieCol DESC), plus last_ts (any-column activity) and n (row count).
    * An attr never populated for an entity stays null.
    */
  def goldenRecord(df: DataFrame, entityCol: String, tsCol: String,
      tieCol: String, attrs: Seq[String]): DataFrame = {
    require(attrs.nonEmpty, "at least one attribute")
    val picks = attrs.map { c =>
      max_by(col(c), when(col(c).isNotNull,
        struct(col(tsCol), col(tieCol)))).as(c)
    }
    val extras = Seq(max(col(tsCol)).as("last_ts"), count(lit(1)).as("n"))
    df.groupBy(col(entityCol)).agg(picks.head, (picks.tail ++ extras): _*)
  }
}
