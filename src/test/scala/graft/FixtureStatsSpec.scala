package graft

import org.scalatest.funsuite.AnyFunSuite

/** FixtureStats is the round-over-round workload-shape pin (FIXTURES.md):
  * its JSON must stay parseable by the flat-map reader and internally
  * consistent with the tables it summarizes — a silent field rename or a
  * broken pair-graph computation would quietly blind the next round's
  * uptick adjudication.
  */
class FixtureStatsSpec extends AnyFunSuite with SparkSpec {

  test("statsJson is flat-parseable and self-consistent at sf0.001") {
    val d = "/root/testdata/sf0.001"
    val json = FixtureStats.statsJson(spark, d)
    // the same no-dependency parser the bench drift gate uses
    val top = BenchDrift.parseNumMap(json)
    assert(top("documents") === graft.ops.Tables.documents(spark, d).count())
    assert(top("lineitem") === graft.ops.Tables.lineitem(spark, d).count())
    assert(top("embeddings") === graft.ops.Tables.embeddings(spark, d).count())
    assert(top("embedding_dim") > 0)
    val pg = BenchDrift.parseNumMap(BenchDrift.extractObj(json, "pair_graph"))
    // structural invariants of any pair graph: each edge joins two
    // vertices, components partition the paired vertex set, the hash-min
    // loop converged in >= 1 round on a non-empty graph
    assert(pg("vertices") <= 2 * pg("edges"))
    assert(pg("components") <= pg("vertices"))
    assert(pg("max_component") <= pg("vertices"))
    if (pg("edges") > 0) assert(pg("rounds") >= 1)
  }
}
