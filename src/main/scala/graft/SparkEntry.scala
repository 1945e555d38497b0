package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates the per-domain catalogs; every entry with exact
  * deterministic semantics has a DuckDB oracle in `oracleSql` (same column
  * names, exact-arithmetic parity). Entries without an oracle are seeded
  * LSH/sampling operators whose outputs are deterministic but depend on
  * JVM-side hashing (xxhash64) with no DuckDB equivalent — the driver runs
  * its rows-only check, and ScalaTest covers their invariants.
  */
object SparkEntry {

  /** Flagship query on sf=0.001; driver smoke-checks rows>0.
    * TPC-H Q3-style join + agg + top-k (see RelationalQueries.q3_top_orders).
    */
  def entry(spark: SparkSession): DataFrame =
    ops.RelationalQueries.queries("q3_top_orders")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.RelationalQueries.queries ++
      text.TextQueries.queries ++
      text.UrlQueries.queries ++
      dedup.DedupQueries.queries ++
      ops.TscQueries.queries ++
      layout.LayoutQueries.queries ++
      layout.Partitioning.queries ++
      quality.QualityQueries.queries ++
      graph.GraphQueries.queries ++
      ops.ScaleQueries.queries

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get the driver's rows-only check.
    */
  def oracleSql: Map[String, String] =
    ops.RelationalQueries.oracles ++
      text.TextQueries.oracles ++
      text.UrlQueries.oracles ++
      dedup.DedupQueries.oracles ++
      ops.TscQueries.oracles ++
      layout.LayoutQueries.oracles ++
      layout.Partitioning.oracles ++
      quality.QualityQueries.oracles ++
      graph.GraphQueries.oracles ++
      ops.ScaleQueries.oracles
}
