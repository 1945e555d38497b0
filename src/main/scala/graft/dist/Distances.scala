package graft.dist

/** Time-series distance kernels (reference: code/src/distance_measures.py:16-88,
  * code/src/global_model_manager.py:60-85).
  *
  * Pure JVM code — these run inside `mapPartitions`/UDF closures on
  * executors, so they are written as tight, allocation-free loops over
  * `Array[Double]` (no boxing, no Breeze). Each kernel is a
  * [[DistanceMeasure]] so the tree learner's measure pool stays pluggable
  * (SURVEY §2.8: aeon's 11-measure pool; we ship the core five and the
  * interface for the rest).
  */
trait DistanceMeasure extends Serializable {
  def name: String
  def apply(a: Array[Double], b: Array[Double]): Double
}

object Distances {

  /** D5 — guard semantics of the reference's fast_euclidean
    * (global_model_manager.py:60-85): null / empty / length-mismatch
    * → +Infinity instead of throwing.
    */
  @inline private def guarded(a: Array[Double], b: Array[Double])(f: => Double): Double =
    if (a == null || b == null || a.length == 0 || a.length != b.length)
      Double.PositiveInfinity
    else f

  /** D2/D5 — Euclidean (L2). */
  object Euclidean extends DistanceMeasure {
    val name = "euclidean"
    def apply(a: Array[Double], b: Array[Double]): Double = guarded(a, b) {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      math.sqrt(s)
    }
  }

  /** Squared L2 — same argmin as Euclidean, cheaper for nearest-exemplar. */
  object SquaredEuclidean extends DistanceMeasure {
    val name = "squared_euclidean"
    def apply(a: Array[Double], b: Array[Double]): Double = guarded(a, b) {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
  }

  /** D3 — Manhattan (L1) (distance_measures.py:54-70). */
  object Manhattan extends DistanceMeasure {
    val name = "manhattan"
    def apply(a: Array[Double], b: Array[Double]): Double = guarded(a, b) {
      var s = 0.0; var i = 0
      while (i < a.length) { s += math.abs(a(i) - b(i)); i += 1 }
      s
    }
  }

  /** D4 — cosine distance = 1 − cosine similarity (distance_measures.py:72-88).
    * Zero-norm input → distance 1.0 (orthogonal-by-convention, matches
    * sklearn's cosine_distances on zero vectors).
    */
  object Cosine extends DistanceMeasure {
    val name = "cosine"
    def apply(a: Array[Double], b: Array[Double]): Double = guarded(a, b) {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      val denom = math.sqrt(na) * math.sqrt(nb)
      if (denom == 0.0) 1.0 else 1.0 - dot / denom
    }
  }

  /** D1 — DTW with squared local cost and sqrt at the end, matching
    * `dtaidistance.dtw.distance` (distance_measures.py:16-33). `window` is
    * the Sakoe-Chiba band half-width; `window < 0` means unconstrained.
    * O(n·m) time, O(m) space (two rolling rows). Unequal lengths allowed
    * (null/empty still guarded to +Infinity).
    */
  def dtw(a: Array[Double], b: Array[Double], window: Int = -1): Double = {
    if (a == null || b == null || a.length == 0 || b.length == 0)
      return Double.PositiveInfinity
    val n = a.length; val m = b.length
    val w =
      if (window < 0) math.max(n, m)
      else math.max(window, math.abs(n - m)) // band must reach the corner
    val inf = Double.PositiveInfinity
    var prev = Array.fill(m + 1)(inf)
    var curr = Array.fill(m + 1)(inf)
    prev(0) = 0.0
    var i = 1
    while (i <= n) {
      java.util.Arrays.fill(curr, inf)
      val jLo = math.max(1, i - w)
      val jHi = math.min(m, i + w)
      var j = jLo
      while (j <= jHi) {
        val d = a(i - 1) - b(j - 1)
        val cost = d * d
        val best = math.min(prev(j), math.min(prev(j - 1), curr(j - 1)))
        curr(j) = cost + best
        j += 1
      }
      val t = prev; prev = curr; curr = t
      i += 1
    }
    math.sqrt(prev(m))
  }

  /** Full (unconstrained) DTW as a pool measure. */
  object DtwFull extends DistanceMeasure {
    val name = "dtw_full"
    def apply(a: Array[Double], b: Array[Double]): Double = dtw(a, b)
  }

  /** Windowed DTW: band half-width = fraction × series length. */
  final case class DtwWindow(fraction: Double) extends DistanceMeasure {
    val name = s"dtw_window_$fraction"
    def apply(a: Array[Double], b: Array[Double]): Double =
      dtw(a, b, math.max(1, (math.max(a.length, b.length) * fraction).toInt))
  }

  /** First-difference transform used by derivative DTW. */
  def derivative(a: Array[Double]): Array[Double] = {
    if (a == null || a.length < 2) return Array.emptyDoubleArray
    val out = new Array[Double](a.length - 1)
    var i = 1
    while (i < a.length) { out(i - 1) = a(i) - a(i - 1); i += 1 }
    out
  }

  /** Derivative DTW (pool measure from the Proximity Forest paper). */
  final case class Ddtw(fraction: Double = -1) extends DistanceMeasure {
    val name = if (fraction < 0) "ddtw_full" else s"ddtw_window_$fraction"
    def apply(a: Array[Double], b: Array[Double]): Double = {
      val da = derivative(a); val db = derivative(b)
      if (fraction < 0) dtw(da, db)
      else dtw(da, db, math.max(1, (math.max(da.length, db.length) * fraction).toInt))
    }
  }

  /** Measures by stable name — the serialized-model vocabulary. */
  val byName: Map[String, DistanceMeasure] = {
    val fixed: Seq[DistanceMeasure] = Seq(
      Euclidean, SquaredEuclidean, Manhattan, Cosine, DtwFull,
      DtwWindow(0.1), Ddtw(-1), Ddtw(0.1))
    fixed.map(m => m.name -> m).toMap
  }

  /** Default measure pool for ProximityTree candidate splits
    * (euclid + dtw first, per SURVEY §2.8 guidance; pool is pluggable).
    */
  val defaultPool: IndexedSeq[DistanceMeasure] =
    IndexedSeq(Euclidean, DtwFull, DtwWindow(0.1), Manhattan, Cosine)

  /** Index of the nearest exemplar under `measure`; ties break to the
    * earliest exemplar (stable, matching a sequential argmin loop).
    * Returns -1 for an empty exemplar set.
    */
  def nearestIndex(
      measure: DistanceMeasure,
      ts: Array[Double],
      exemplars: IndexedSeq[Array[Double]]): Int = {
    var best = -1; var bestD = Double.PositiveInfinity
    var i = 0
    while (i < exemplars.length) {
      val d = measure(ts, exemplars(i))
      if (d < bestD) { bestD = d; best = i }
      i += 1
    }
    best
  }
}
