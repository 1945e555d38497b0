package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Merge-on-read maintenance of a MATERIALIZED JOIN VIEW — the missing
  * third of the incremental-maintenance family: [[MergeOps]] maintains
  * base tables from CDC, [[IncrementalAgg]] maintains derived AGGREGATES,
  * this maintains a derived fact ⋈ dim JOIN. A 100 TB pipeline serves
  * most reads from exactly such denormalized views, and a full refresh
  * re-joins the whole fact for a delta of kilobytes.
  *
  * The delta rule for a keyed fact ⋈ broadcast-scale dim is delta-sized
  * end to end: only CDC'd fact keys can change view rows, and the
  * replacement rows come from re-joining THE DELTA (not the fact) against
  * the dim. Storage-side the view is a [[DeletionVectors]] table, so a
  * maintenance batch is one appended sequence directory plus one sidecar
  * write — NO existing view file is opened, let alone rewritten
  * (spec-pinned byte-identical).
  *
  * The subtle case is an update that RE-POINTS the join key at a dim row
  * that doesn't exist (or stops matching): the new image drops out of the
  * inner re-join, so there is no replacement row — but the OLD view row
  * must still die. That is why the sidecar mask covers every non-delete
  * CDC key ([[DeletionVectors.appendBatch]]'s maskKeys superset), not
  * just the keys that produced replacement rows.
  *
  * Dim-side changes are out of scope by design: dims are broadcast-scale,
  * so a dim change re-derives the view rows of the affected dim keys at
  * refresh cadence (delta-keyed fact probe — the partition/bloom-prunable
  * lookup the layout module exists for), not batch cadence.
  */
object JoinMv {

  /** Materialize the view: `fact ⋈ dim` on `joinKey` as sequence 0 of a
    * deletion-vector table at `dir`.
    */
  def init(fact: DataFrame, dim: DataFrame, joinKey: String,
      dir: String): Unit =
    DeletionVectors.initTable(fact.join(dim, Seq(joinKey)), dir)

  /** Apply a fact-side CDC batch to the view. `delta` carries fact-row
    * images with `opCol`: 'd' rows are old images leaving the fact,
    * anything else is a new image entering it (an update is its d+i
    * pair). One delta-sized join against the dim + one
    * [[DeletionVectors.appendBatch]]; every CDC'd key's old view version
    * is masked, new images that still match the dim land as replacement
    * rows. Returns (replacement rows written, keys masked).
    */
  def applyCdc(spark: SparkSession, dir: String, delta: DataFrame,
      dim: DataFrame, factKey: String, joinKey: String,
      opCol: String = "op"): (Long, Long) = {
    val ins = delta.filter(col(opCol) =!= "d").drop(opCol)
    // every CDC'd key — including pure deletes and re-pointed updates
    // whose new image won't re-join — gets its old version masked
    val maskKeys = delta.select(col(factKey)).distinct()
      .localCheckpoint() // count + sidecar write from one materialization
    val joined = ins.join(dim, Seq(joinKey))
      .localCheckpoint() // count + data write from one materialization
    DeletionVectors.appendBatch(spark, dir, joined, maskKeys, factKey)
    (joined.count(), maskKeys.count())
  }

  /** Current view state — deletes and superseded versions subtracted at
    * read time ([[DeletionVectors.read]]).
    */
  def read(spark: SparkSession, dir: String, factKey: String): DataFrame =
    DeletionVectors.read(spark, dir, factKey)
}
