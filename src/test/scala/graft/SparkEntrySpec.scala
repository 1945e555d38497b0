package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver's t1 smoke contract: entry() returns rows; every query name
  * with an oracle actually exists in the query map; column aliasing between
  * Spark results and oracle SQL is the driver's hash key — enforce the
  * oracle-keys ⊆ query-keys invariant here so a typo can't silently drop a
  * correctness check.
  */
class SparkEntrySpec extends AnyFunSuite with SparkSpec {

  test("entry() runs on sf0.001 with rows > 0") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query; no duplicate names across catalogs") {
    val qKeys = SparkEntry.queries.keySet
    val oKeys = SparkEntry.oracleSql.keySet
    assert((oKeys -- qKeys).isEmpty, s"orphan oracles: ${oKeys -- qKeys}")
    val all = Seq(
      ops.RelationalQueries.queries.keys, text.TextQueries.queries.keys,
      dedup.DedupQueries.queries.keys, ops.TscQueries.queries.keys,
      layout.LayoutQueries.queries.keys, quality.QualityQueries.queries.keys)
      .flatten.toSeq
    assert(all.size === all.distinct.size, "duplicate query names across catalogs")
  }

  test("the merged catalog equals the sum of its parts (no shadowed keys)") {
    // the dup-name test above predates half the catalogs; this one can't
    // go stale: if ANY constituent map shares a key with another, the ++
    // merge silently drops one — caught here as a size mismatch. (Round
    // 15 shipped a q_weighted_sample in ScaleQueries that shadowed
    // DedupQueries' — the merged catalog stayed flat and only the floor
    // ratchet noticed.)
    val parts = Seq(
      ops.RelationalQueries.queries, text.TextQueries.queries,
      text.UrlQueries.queries, dedup.DedupQueries.queries,
      ops.TscQueries.queries, layout.LayoutQueries.queries,
      layout.Partitioning.queries, quality.QualityQueries.queries,
      graph.GraphQueries.queries, ops.ScaleQueries.queries)
    val keys = parts.flatMap(_.keys)
    val dups = keys.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"shadowed catalog keys: ${dups.mkString(", ")}")
    assert(SparkEntry.queries.size === keys.size)
  }

  test("catalog size: at least 283 queries, at least 283 oracled") {
    // floor, not exact count — catches an accidentally dropped catalog
    // merge (or a silently shrinking query set, the round-11 failure mode)
    // without needing an edit per added query
    assert(SparkEntry.queries.size >= 283, SparkEntry.queries.size.toString)
    assert(SparkEntry.oracleSql.size >= 283, SparkEntry.oracleSql.size.toString)
  }
}
