package graft.prep

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-reproducible pseudo-random draws for sampling decisions that
  * must survive reruns, engine swaps, and audits: the draw is a pure
  * function of the ROW ID (md5 → first 8 hex chars → uniform in [0,1)),
  * not of partitioning, task order, or a seeded RNG stream. The same row
  * gets the same verdict on any engine — `rand()`-based sampling can't
  * replay and shifts under repartitioning.
  *
  * The 32-bit prefix divided by 2^32 is exact in doubles, so comparisons
  * against a weight computed from exact integer statistics reproduce
  * bit-for-bit (DuckDB: CAST('0x'||substr(md5(id),1,8) AS BIGINT)).
  */
object DeterministicSampling {

  /** Uniform [0,1) draw from the md5 of the id's decimal string. */
  def uniformDraw(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10)
      .cast("long").cast("double") / 4294967296.0

  /** Bernoulli keep with per-row probability min(weight, 1). */
  def weightedKeep(id: Column, weight: Column): Column =
    uniformDraw(id) < least(weight, lit(1.0))
}
