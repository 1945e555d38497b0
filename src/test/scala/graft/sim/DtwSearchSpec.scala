package graft.sim

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The pruned DTW search's one law is exactness (pinned in-plan by the
  * catalog report's brute twin and re-checked here on shaped data); its
  * one LEVER is the LB gate, which must be seen pruning — on smooth
  * trajectories, where the envelope is tight — not just configured.
  */
class DtwSearchSpec extends AnyFunSuite with SparkSpec {

  /** 120 sinusoid trajectories of length 64: 3 frequency families ×
    * phases, plus planted near-copies of trajectory 0 (ids 1000+) —
    * shaped series with meaningful nearest neighbors.
    */
  private lazy val shaped = {
    import spark.implicits._
    val base = for {
      f <- Seq(1, 3, 7); p <- 0 until 40
    } yield ((f * 100 + p).toLong,
      (0 until 64).map(i =>
        math.sin(2 * math.Pi * f * (i + p * 0.8) / 64.0)).toArray.toSeq)
    val copies = (0 until 4).map { j =>
      ((1000 + j).toLong,
        (0 until 64).map(i =>
          math.sin(2 * math.Pi * 1 * i / 64.0) + 0.01 * j).toArray.toSeq)
    }
    (base ++ copies).toDF("vec_id", "embedding")
  }

  test("exact on shaped data: every rank matches the brute twin") {
    val rep = DtwSearch.topKReport(shaped, "vec_id", "embedding",
      qid => qid === 100L, k = 5, band = 6).collect()
    assert(rep.length === 5)
    assert(rep.forall(_.getLong(3) === 1L))
  }

  test("planted near-copies are the query's nearest neighbors") {
    import spark.implicits._
    // query = trajectory (f=1, p=0); its planted near-copies must fill
    // the top ranks (the brute twin guarantees pruned == brute, so this
    // checks the SEARCH, not just the plumbing)
    val pruned = DtwSearch.topKReport(shaped, "vec_id", "embedding",
      qid => qid === 100L, k = 4, band = 6)
    assert(pruned.filter(col("is_match") === 1L).count() === 4)
    // recompute the winner ids via the public report path's brute twin
    // equivalence: run with k=4 and check the admitted set includes the
    // copies by asserting brute-minimum distances directly
    val d = shaped.filter($"vec_id" === 100L).select("embedding")
      .as[Seq[Double]].head.toArray
    // top-3 only: DTW is phase-invariant within the band, so the p=1
    // sibling (warped back onto the query almost for free) legitimately
    // outranks the farthest vertical-offset copy — the planted structure
    // is the three nearest copies, not all four
    val dists = shaped.filter($"vec_id" =!= 100L)
      .as[(Long, Seq[Double])].collect()
      .map { case (id, v) =>
        (id, graft.dist.Distances.dtw(d, v.toArray, 6)) }
      .sortBy { case (id, dd) => (dd, id) }.take(3).map(_._1).toSet
    assert(dists === Set(1000L, 1001L, 1002L))
  }

  test("the LB gate prunes on shaped trajectories") {
    val adm = DtwSearch.admittedCounts(shaped, "vec_id", "embedding",
      qid => qid === 100L, k = 5, band = 6).collect()(0)
    val admitted = adm.getLong(1); val n = adm.getLong(2)
    assert(admitted < n / 2,
      s"LB gate admitted $admitted of $n — no real pruning")
  }
}
