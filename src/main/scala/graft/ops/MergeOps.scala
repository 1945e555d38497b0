package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MERGE / CDC-apply for snapshot maintenance — the incremental-update
  * primitive a 100 TB corpus needs between full rebuilds (nightly deltas
  * into a training-data lake, crawl refreshes, label fixes).
  *
  * Deliberately NOT a full-outer join: `updates ∪ (base anti-join
  * updateKeys)` touches the base exactly once and never shuffles it when
  * the update batch is small — the anti join broadcasts the narrow
  * DISTINCT KEY SET of the batch (not its payload), so a 100 TB base +
  * 1 GB delta plans as scan-filter-union. A full-outer join would shuffle
  * both sides on the key regardless of delta size. When the delta is
  * shuffle-scale too, Catalyst falls back to a shuffled anti join — still
  * one pass over base.
  */
object MergeOps {

  /** Upsert: update rows win per key, base rows without an update
    * survive, new-key update rows insert. Update rows with a legitimately
    * NULL column overwrite (row-presence semantics, not column-coalesce).
    * Requires identical schemas; key collisions WITHIN the batch are the
    * caller's contract (dedup the batch first — both copies would emit).
    */
  def upsert(base: DataFrame, updates: DataFrame, key: String): DataFrame = {
    require(base.columns.sorted.sameElements(updates.columns.sorted),
      s"schema mismatch: base ${base.columns.mkString(",")} vs updates ${updates.columns.mkString(",")}")
    updates.unionByName(
      base.join(updates.select(col(key)).distinct(), Seq(key), "left_anti"))
  }

  /** CDC apply: `changes` carries an op column — 'd' rows delete their
    * key, anything else upserts. One pass over base (anti join against
    * ALL change keys — deletes and upserts both mask the base row).
    */
  def applyChanges(
      base: DataFrame, changes: DataFrame, key: String,
      opCol: String = "op"): DataFrame = {
    val upserts = changes.filter(col(opCol) =!= "d").drop(opCol)
    require(base.columns.sorted.sameElements(upserts.columns.sorted),
      "changes must be base schema + op column")
    upserts.unionByName(
      base.join(changes.select(col(key)).distinct(), Seq(key), "left_anti"))
  }

  /** Change-feed generation — the INVERSE of [[applyChanges]]: diff two
    * keyed snapshots into the minimal CDC batch that transforms `old`
    * into `neu` (keys only in `neu` → 'i', only in `old` → 'd' carrying
    * the departing row, payload-changed keys → 'u' carrying the new row;
    * identical rows are absent). Round-trip law (spec-pinned):
    * `applyChanges(old, changeFeed(old, neu), key) ≡ neu` — so a rebuilt
    * snapshot can feed every incremental consumer ([[IncrementalAgg]],
    * downstream MERGEs) without shipping the full table.
    *
    * Scale shape: the one operator here where a full-outer join IS the
    * right plan — a diff must co-locate both sides by key, so both
    * shuffle once (bucket both snapshots on the key to make it
    * exchange-free). Payload equality is one null-safe struct compare,
    * not per-column OR chains. Caller contract: key non-null and unique
    * per side.
    */
  def changeFeed(old: DataFrame, neu: DataFrame, key: String,
      opCol: String = "op"): DataFrame = {
    require(old.columns.sorted.sameElements(neu.columns.sorted),
      s"schema mismatch: ${old.columns.mkString(",")} vs ${neu.columns.mkString(",")}")
    val payload = old.columns.filterNot(_ == key).toSeq
    val l = old.select(col(key).as("_ko"),
      struct(payload.map(col): _*).as("_po"))
    val r = neu.select(col(key).as("_kn"),
      struct(payload.map(col): _*).as("_pn"))
    l.join(r, col("_ko") === col("_kn"), "full_outer")
      .filter(col("_ko").isNull || col("_kn").isNull ||
        !(col("_po") <=> col("_pn")))
      .select(
        coalesce(col("_kn"), col("_ko")).as(key) +:
          payload.map(c =>
            when(col("_kn").isNull, col(s"_po.$c"))
              .otherwise(col(s"_pn.$c")).as(c)) :+
          when(col("_kn").isNull, lit("d"))
            .when(col("_ko").isNull, lit("i"))
            .otherwise(lit("u")).as(opCol): _*)
  }

  /** SCD type-2 apply: `history` is the versioned dimension
    * (key, attrs…, fromCol, endCol with NULL = current row); `changes` is
    * one new version per key (key, attrs…, changeTsCol). Each changed
    * key's current row closes at the change timestamp and the new version
    * appends as current. One pass over history (left-outer to the narrow
    * (key, ts) change set — broadcastable), plus the appended batch;
    * closed history rows pass through untouched. Keys with multiple rows
    * in `changes` are the caller's contract (collapse to latest first).
    */
  def scd2Apply(
      history: DataFrame, changes: DataFrame, key: String,
      fromCol: String = "effective_from", endCol: String = "effective_to",
      changeTsCol: String = "change_ts"): DataFrame = {
    val endType = history.schema(endCol).dataType
    val changeKeys = changes.select(col(key), col(changeTsCol).as("_change_ts"))
    val closed = history
      .join(changeKeys, Seq(key), "left_outer")
      .withColumn(endCol,
        when(col(endCol).isNull && col("_change_ts").isNotNull,
          col("_change_ts").cast(endType)).otherwise(col(endCol)))
      .drop("_change_ts")
    val inserts = changes
      .withColumnRenamed(changeTsCol, fromCol)
      .withColumn(endCol, lit(null).cast(endType))
    closed.unionByName(inserts)
  }
}
