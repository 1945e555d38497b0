package graft.quality

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The composed selection funnel (q_select_pipeline): the per-stage
  * VALUES are covered by the end-to-end DuckDB oracle at three SFs;
  * this spec pins what the oracle compare cannot phrase — the
  * structural contract of the final selection, determinism across
  * invocations (the whole funnel re-derives from seeds and frozen
  * constants, nothing cached), and that the serving stage actually
  * uses the TRAINED weights (a filter that keeps the whole corpus has
  * silently degenerated train -> serve into a pass-through).
  */
class SelectPipelineSpec extends AnyFunSuite with SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("structural contract: per-cell Gonzalez ranks 1..n within the " +
      "budget, rank-1 anchors at distance 0, ids live in the embedding " +
      "spine; deterministic end to end") {
    val res = QualityQueries.selectPipeline(spark, d).collect()
    assert(res.nonEmpty, "the funnel must select something at sf0.001")
    res.groupBy(_.getLong(0)).foreach { case (cell, rows) =>
      val ranks = rows.map(_.getLong(1)).sorted.toSeq
      assert(ranks == (1L to rows.length).toSeq,
        s"cell $cell ranks not contiguous: $ranks")
      assert(rows.length <= 2, // pipeKPerCell
        s"cell $cell exceeds the per-cell budget: ${rows.length}")
      val anchor = rows.find(_.getLong(1) == 1L).get
      assert(anchor.getDouble(3) == 0.0,
        s"cell $cell anchor must sit at distance 0: $anchor")
    }
    val ids = res.map(_.getLong(2)).toSet
    val spine = graft.ops.Tables.embeddings(spark, d)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(ids.subsetOf(spine), "selected ids must come from the spine")
    val again = QualityQueries.selectPipeline(spark, d).collect()
    assert(res.map(_.toSeq).toSet == again.map(_.toSeq).toSet,
      "the funnel must be deterministic across invocations")
  }

  test("the mixing tail (q_select_funnel) admits a non-empty PROPER " +
      "subset of the diversified survivors, deterministically, with " +
      "every admitted draw strictly under its source's rate") {
    val surv = QualityQueries.selectPipeline(spark, d)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    val admitted = QualityQueries.selectFunnel(spark, d).collect()
    assert(admitted.nonEmpty, "mixing must admit something")
    val ids = admitted.map(_.getLong(0)).toSet
    assert(ids.subsetOf(surv), "admission must draw from the survivors")
    assert(ids.size < surv.size,
      s"mixing must subsample: admitted ${ids.size} of ${surv.size}")
    admitted.foreach { r =>
      assert(r.getDouble(2) <= r.getDouble(3),
        s"admitted row must satisfy u < rate (round-6 published): $r")
    }
    val again = QualityQueries.selectFunnel(spark, d).collect()
    assert(admitted.map(_.toSeq).toSet == again.map(_.toSeq).toSet,
      "the funnel tail must be deterministic across invocations")
  }

  test("the serve stage uses the trained weights: the trained filter " +
      "keeps a non-trivial PROPER subset of the corpus") {
    val docs = graft.ops.Tables.documents(spark, d)
      .filter(col("text").isNotNull).count()
    val kept = QualityQueries.selectPipelineKeptCount(spark, d)
    assert(kept > 0L, "trained filter must keep something")
    assert(kept < docs,
      s"trained filter must cut something: kept $kept of $docs")
  }
}
