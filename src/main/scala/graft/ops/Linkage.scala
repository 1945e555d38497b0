package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-source record linkage — the "same entity, two systems" join that
  * exact keys can't express (CRM vs billing, crawl vs feed): block on a
  * cheap deterministic key so candidate generation is an EQUI join, then
  * verify candidates with exact edit distance. The classic
  * blocking-then-verification decomposition (Fellegi–Sunter style
  * pipelines; same shape as [[graft.dedup.Dedup.editDistancePairs]] but
  * across two tables instead of within one).
  *
  * Scale shape: one shuffle per side on the block key; block sizes are
  * bounded by key selectivity (prefix blocks on high-entropy strings stay
  * small as data grows — cardinality scales with the data); the verify
  * stage is Spark's codegen'd `levenshtein` on co-partitioned rows. Never
  * all-pairs: a record meets only its block, so cost is
  * sum(|A_blk|·|B_blk|), not |A|·|B|.
  */
object Linkage {

  /** Blocked fuzzy join: candidates from equal block keys (default: the
    * 4-char prefix — swap in any deterministic text-derived key the
    * expected noise can't touch), kept when edit distance <= `maxDist`.
    * Returns (a_id, b_id, dist).
    */
  def fuzzyJoin(a: DataFrame, b: DataFrame,
      aId: String, bId: String, aText: String, bText: String,
      blockKey: Column => Column = substring(_, 1, 4),
      maxDist: Int = 2): DataFrame = {
    val an = a.select(col(aId).as("a_id"), col(aText).as("__a_txt"),
      blockKey(col(aText)).as("__blk"))
    val bn = b.select(col(bId).as("b_id"), col(bText).as("__b_txt"),
      blockKey(col(bText)).as("__blk"))
    an.join(bn, "__blk")
      .withColumn("dist", levenshtein(col("__a_txt"), col("__b_txt")))
      .filter(col("dist") <= maxDist)
      .select(col("a_id"), col("b_id"), col("dist").cast("long").as("dist"))
  }
}
