package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-source BFS / unweighted shortest paths — the graph-traversal
  * primitive beside [[PageRank]] (influence), triangles (structure), and
  * the dedup clusters' hash-min components (connectivity): distance-to-
  * nearest-seed labels drive crawl-frontier scheduling, link-spam radius
  * checks, and citation-depth features.
  *
  * Scale shape: label propagation over the full label frame — per
  * iteration ONE equi join (labels ⋈ edges on src) + ONE min aggregate
  * keyed on node, both shuffling node-scale frames on their natural keys.
  * K iterations = exact distances ≤ K (the caller bounds the radius, the
  * standard cluster formulation). Lineage discipline is [[PageRank]]'s:
  * loop-invariant edges pinned once, the label frame cut with a blocking
  * localCheckpoint every [[PageRank.CheckpointEvery]]-th span so shallow
  * runs pay one materialization while the unrolled-plan depth stays
  * bounded; superseded checkpoint blocks freed eagerly. A delta-frontier
  * variant (join only newly-labeled nodes) saves work on high-diameter
  * graphs but changes no values — the full-frame form keeps the oracle
  * replay trivial.
  *
  * Determinism: distances are exact integers (min over unions is order-
  * independent), so the K-iteration run unrolls to SQL CTEs verbatim —
  * q_bfs_dist is bit-for-bit oracled. Unreached nodes carry no row
  * (absent ≠ dist 0; the oracle's aggregate drops them identically).
  */
object Bfs {

  /** Distances ≤ `iterations` hops from the seed set (`seedPred` over the
    * node column) along directed edges. Returns (node, dist).
    */
  def distancesFp(edges0: DataFrame, srcCol: String, dstCol: String,
      seedPred: Column => Column, iterations: Int = 4,
      eager: Boolean = true): DataFrame = {
    def pin(df: DataFrame): DataFrame = if (eager) df.persist() else df
    val edges = pin(edges0
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .distinct())
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct()
    var dist = nodes.filter(seedPred(col("node")))
      .select(col("node"), lit(0L).as("dist"))
    var prevCp: DataFrame = null
    for (i <- 1 to iterations) {
      val relaxed = edges.join(dist, col("src") === col("node"))
        .select(col("dst").as("node"), (col("dist") + 1L).as("dist"))
      val next = dist.union(relaxed)
        .groupBy(col("node")).agg(min(col("dist")).as("dist"))
      if (eager && (i % 3 == 0 || i == iterations)) {
        dist = next.localCheckpoint(true)
        if (prevCp != null) PageRank.freeCheckpoint(prevCp)
        prevCp = dist
      } else dist = next
    }
    if (eager) edges.unpersist(blocking = false)
    dist
  }
}
