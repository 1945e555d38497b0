package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.dist.Distances
import graft.multimodal.VideoCodecs
import graft.sim.Knn

/** Property-based checks over the pure-JVM kernels (no SparkSession per
  * case, so hundreds of generated cases run in milliseconds). These pin
  * ALGEBRAIC contracts the example-based specs can't sweep: metric
  * symmetry and identity across the whole measure pool, container
  * round-trips for arbitrary payload bytes, and trainer output invariants
  * for arbitrary sample geometry.
  */
class PropertySpec extends AnyFunSuite {

  // raw ScalaCheck runner (the scalatest bridge artifact is not in the
  // offline cache): a thrown assertion falsifies the property and the
  // failing case is reported through the result status
  private def check(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(100), prop)
    assert(res.passed, res.status.toString)
  }

  private val series: Gen[Array[Double]] =
    Gen.choose(1, 48).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-100.0, 100.0)).map(_.toArray))

  test("every distance measure in the pool is symmetric with d(a,a)=0") {
    // lcss is a similarity-derived DISTANCE in [0,1]; all pool measures
    // promise symmetry and self-distance 0 — the tree's branch routing
    // depends on both
    val pool = Seq(Distances.Euclidean, Distances.Manhattan,
      Distances.DtwFull, Distances.Ddtw(-1), Distances.Wdtw(0.05),
      Distances.Wddtw(0.05), Distances.Lcss(0.05), Distances.Erp(0.0),
      Distances.Twe(0.005, 1.0), Distances.Msm(0.5))
    check(Prop.forAll(series, series) { (a, b) =>
      pool.foreach { m =>
        val ab = m(a, b); val ba = m(b, a)
        // exact-equality first: the length-mismatch guard returns +Inf on
        // BOTH orders (symmetric by design), and Inf-Inf is NaN in the
        // tolerance form
        assert(ab == ba ||
          math.abs(ab - ba) <= 1e-9 * math.max(1.0, math.abs(ab)),
          s"${m.name} asymmetric: $ab vs $ba")
        // self-distance is 0 — except where the input maps into the
        // degenerate-input guard (+Inf): derivative measures need >= 3
        // points, and empty/shrunken arrays guard on every measure
        val aa = m(a, a)
        assert(math.abs(aa) <= 1e-12 || aa.isPosInfinity,
          s"${m.name} self-distance != 0: $aa")
      }
      true
    })
  }

  test("banded DTW lower-bounds to full DTW as the band widens") {
    // window = -1 is full DTW; any finite band RESTRICTS paths, so banded
    // cost is >= full cost, and band >= max(|a|,|b|) equals full exactly
    check(Prop.forAll(series, series) { (a, b) =>
      val full = Distances.dtw(a, b)
      val banded = Distances.dtw(a, b, window = 2)
      assert(banded >= full - 1e-9, s"band found a cheaper path: $banded < $full")
      val wide = Distances.dtw(a, b, window = math.max(a.length, b.length))
      assert(math.abs(wide - full) <= 1e-9)
      true
    })
  }

  test("mpng demux inverts mux for arbitrary frame payloads, never throws on garbage") {
    val frame = Gen.choose(0, 256).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray))
    val frames = Gen.choose(0, 16).flatMap(n => Gen.listOfN(n, frame))
    check(Prop.forAll(frames) { fs =>
      val back = VideoCodecs.demux(VideoCodecs.mpngOf(fs))
      assert(back.length === fs.length)
      back.zip(fs).foreach { case (g, e) =>
        assert(java.util.Arrays.equals(g, e))
      }
      true
    })
    val garbage = Gen.choose(0, 512).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray))
    check(Prop.forAll(garbage) { p =>
      VideoCodecs.demux(p) // degrade, never throw
      VideoCodecs.sampleFrames(p, 3)
      true
    })
  }

  test("kmeans trainer: centroid count, finiteness, and dimension invariants") {
    val samples = for {
      dim <- Gen.chooseNum(1, 8)
      n <- Gen.chooseNum(1, 40)
      rows <- Gen.listOfN(n,
        Gen.listOfN(dim, Gen.chooseNum(-10.0, 10.0)).map(_.toArray))
    } yield rows.toArray
    check(Prop.forAll(samples, Gen.chooseNum(1, 8)) { (s, k) =>
      val cents = Knn.kmeansCentroids(s, k, iters = 3, seed = 7L)
      assert(cents.length === math.min(k, s.length))
      cents.foreach { c =>
        assert(c.length === s.head.length)
        assert(c.forall(x => !x.isNaN && !x.isInfinite))
      }
      true
    })
  }
}
