package graft.dist

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

/** Kernel fixtures from the reference's dummy_partition
  * (code/src/distance_measures.py:91-110) + distance axioms checked over
  * seeded random series (deterministic, no framework dependency).
  */
class DistancesSpec extends AnyFunSuite {
  import Distances._

  private val ts1 = Array(1.0, 2.0, 3.0, 4.0)
  private val ex1a = Array(1.0, 2.0, 2.0, 3.0)
  private val ex1b = Array(2.0, 3.0, 4.0, 5.0)
  private val ts2 = Array(5.0, 4.0, 3.0, 2.0)
  private val ex2a = Array(5.0, 5.0, 4.0, 3.0)
  private val ex2b = Array(3.0, 3.0, 2.0, 1.0)

  test("manhattan matches reference dummy_partition values") {
    assert(Manhattan(ts1, ex1a) === 2.0)
    assert(Manhattan(ts1, ex1b) === 4.0)
    assert(Manhattan(ts2, ex2a) === 3.0)
    assert(Manhattan(ts2, ex2b) === 5.0)
  }

  test("euclidean matches hand-computed values") {
    assert(math.abs(Euclidean(ts1, ex1a) - math.sqrt(2.0)) < 1e-12)
    assert(math.abs(Euclidean(ts1, ex1b) - 2.0) < 1e-12)
    assert(math.abs(Euclidean(ts2, ex2a) - math.sqrt(3.0)) < 1e-12)
    assert(math.abs(Euclidean(ts2, ex2b) - math.sqrt(7.0)) < 1e-12)
  }

  test("cosine is 0 for parallel, 1 for orthogonal / zero vectors") {
    assert(math.abs(Cosine(Array(1.0, 2.0), Array(2.0, 4.0))) < 1e-12)
    assert(math.abs(Cosine(Array(1.0, 0.0), Array(0.0, 1.0)) - 1.0) < 1e-12)
    assert(Cosine(Array(0.0, 0.0), Array(1.0, 1.0)) === 1.0)
  }

  test("dtw of identical series is 0; shifted constant is sqrt-sum-of-squares") {
    assert(dtw(Array(1.0, 2.0, 3.0), Array(1.0, 2.0, 3.0)) === 0.0)
    // all-diagonal path, cost 1 per step
    assert(math.abs(dtw(Array(0.0, 0.0, 0.0), Array(1.0, 1.0, 1.0)) - math.sqrt(3.0)) < 1e-12)
  }

  test("dtw warps: shifted spike aligns to zero cost") {
    val a = Array(0.0, 1.0, 0.0, 0.0, 0.0)
    val b = Array(0.0, 0.0, 1.0, 0.0, 0.0)
    assert(dtw(a, b) === 0.0) // perfect warp alignment
    assert(Euclidean(a, b) > 0.0)
  }

  test("dtw handles unequal lengths; guards return +inf") {
    assert(dtw(Array(1.0, 2.0), Array(1.0, 1.5, 2.0)).isFinite)
    assert(Euclidean(Array(1.0), Array(1.0, 2.0)).isPosInfinity)
    assert(Euclidean(null, Array(1.0)).isPosInfinity)
    assert(dtw(null, Array(1.0)).isPosInfinity)
    assert(dtw(Array.emptyDoubleArray, Array(1.0)).isPosInfinity)
  }

  private def randomSeries(rng: Random, n: Int): Array[Double] =
    Array.fill(n)(rng.nextDouble() * 200 - 100)

  test("wdtw/lcss/erp/twe/msm hand checks") {
    // identical series cost 0 under every edit/warp measure
    val s = Array(0.1, 0.5, 0.9, 0.3)
    assert(wdtw(s, s, 0.05) === 0.0)
    assert(lcss(s, s, 0.01) === 0.0)
    assert(erp(s, s, 0.0) === 0.0)
    assert(twe(s, s, 0.005, 1.0) === 0.0)
    assert(msm(s, s, 0.5) === 0.0)
    // lcss: within-epsilon series match fully -> distance 0
    assert(lcss(Array(0.0, 0.5), Array(0.04, 0.54), epsilon = 0.05) === 0.0)
    // lcss: nothing matches -> distance 1
    assert(lcss(Array(0.0, 0.0), Array(1.0, 1.0), epsilon = 0.1) === 1.0)
    // erp with g=0: deleting against zero costs |x|; ([1],[ ]) impossible so
    // compare ([1,2],[1]) = cost of deleting the 2 against g=0
    assert(erp(Array(1.0, 2.0), Array(1.0), 0.0) === 2.0)
    // msm: single move costs |x-y|
    assert(msm(Array(1.0), Array(3.0), 0.5) === 2.0)
    // erp is a metric: triangle inequality on seeded trials
    val rng = new Random(5)
    (1 to 100).foreach { _ =>
      val n = 2 + rng.nextInt(10)
      val x = randomSeries(rng, n); val y = randomSeries(rng, n); val z = randomSeries(rng, n)
      assert(erp(x, z, 0.0) <= erp(x, y, 0.0) + erp(y, z, 0.0) + 1e-9)
      assert(msm(x, z, 0.5) <= msm(x, y, 0.5) + msm(y, z, 0.5) + 1e-9)
    }
  }

  test("property: symmetry and identity for all measures (200 seeded trials)") {
    val rng = new Random(7)
    val measures = Seq(Euclidean, SquaredEuclidean, Manhattan, Cosine, DtwFull,
      DtwWindow(0.1), Ddtw(-1), Wdtw(0.05), Wddtw(0.05), Lcss(0.05), Erp(0.0),
      Twe(0.005, 1.0), Msm(0.5))
    (1 to 200).foreach { _ =>
      val n = 2 + rng.nextInt(24)
      val a = randomSeries(rng, n)
      val b = randomSeries(rng, n)
      measures.foreach { m =>
        assert(math.abs(m(a, b) - m(b, a)) < 1e-9, s"${m.name} not symmetric")
        assert(m(a, a) < 1e-9, s"${m.name} identity violated")
      }
    }
  }

  test("property: dtw <= euclidean on equal lengths; windowed dtw >= full dtw") {
    val rng = new Random(11)
    (1 to 200).foreach { _ =>
      val n = 2 + rng.nextInt(24)
      val a = randomSeries(rng, n)
      val b = randomSeries(rng, n)
      assert(dtw(a, b) <= Euclidean(a, b) + 1e-9)
      assert(dtw(a, b, window = 1) >= dtw(a, b) - 1e-9)
    }
  }

  test("property: triangle-ish sanity — metric measures satisfy triangle inequality") {
    val rng = new Random(13)
    (1 to 200).foreach { _ =>
      val n = 2 + rng.nextInt(16)
      val a = randomSeries(rng, n)
      val b = randomSeries(rng, n)
      val c = randomSeries(rng, n)
      assert(Euclidean(a, c) <= Euclidean(a, b) + Euclidean(b, c) + 1e-9)
      assert(Manhattan(a, c) <= Manhattan(a, b) + Manhattan(b, c) + 1e-9)
    }
  }

  test("nearestIndex picks the argmin with earliest-wins ties") {
    val ex = IndexedSeq(Array(0.0, 0.0), Array(1.0, 1.0), Array(0.0, 0.0))
    assert(nearestIndex(Euclidean, Array(0.1, 0.1), ex) === 0)
    assert(nearestIndex(Euclidean, Array(1.0, 1.0), ex) === 1)
    assert(nearestIndex(Euclidean, Array(5.0, 5.0), IndexedSeq.empty) === -1)
  }
}
