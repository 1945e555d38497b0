package graft.layout

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The Hilbert curve's defining properties at a fully-enumerable order,
  * plus the codegen path: bijectivity, UNIT-STEP continuity (the
  * property Morton lacks — and the reason Hilbert segments have tighter
  * bounding boxes), xy2d/d2xy inversion, and a measured locality win
  * over the Morton order on equal-size curve segments.
  */
class HilbertSpec extends AnyFunSuite with SparkSpec {

  private val Order = 6 // 64x64 grid: 4096 cells, fully enumerable
  private val N = 1L << Order

  test("xy2d is a bijection onto 0..n^2-1 and d2xy inverts it") {
    val ds = for (x <- 0L until N; y <- 0L until N)
      yield HilbertKernels.xy2d(Order, x, y)
    assert(ds.toSet === (0L until N * N).toSet)
    for (d <- 0L until N * N) {
      val (x, y) = HilbertKernels.d2xy(Order, d)
      assert(HilbertKernels.xy2d(Order, x, y) === d)
    }
  }

  test("unit-step continuity: consecutive curve positions are grid-adjacent") {
    var prev = HilbertKernels.d2xy(Order, 0L)
    for (d <- 1L until N * N) {
      val cur = HilbertKernels.d2xy(Order, d)
      val manhattan = math.abs(cur._1 - prev._1) + math.abs(cur._2 - prev._2)
      assert(manhattan === 1L, s"jump at d=$d: $prev -> $cur")
      prev = cur
    }
  }

  test("tighter segment boxes than Morton: mean bounding-box area is smaller") {
    // split the full curve into equal segments under each ordering and
    // compare mean bounding-box area — the per-file footer stats a scan
    // planner prunes with. Segment size deliberately NOT a power of 4:
    // at 4^k-aligned cuts both curves tile perfectly and tie; real file
    // sizes never align, and off-alignment is where Morton's
    // power-of-two jumps blow the box up while Hilbert's unit steps
    // keep it tight.
    def meanBoxArea(key: (Long, Long) => Long): Double = {
      val cells = for (x <- 0L until N; y <- 0L until N) yield (key(x, y), x, y)
      val groups = cells.sortBy(_._1).grouped(100).toSeq
      groups.map { seg =>
        val xs = seg.map(_._2); val ys = seg.map(_._3)
        ((xs.max - xs.min + 1) * (ys.max - ys.min + 1)).toDouble
      }.sum / groups.size
    }
    val hilbert = meanBoxArea(HilbertKernels.xy2d(Order, _, _))
    val morton = meanBoxArea((x, y) =>
      ZOrder.spreadBitsLong(x) | (ZOrder.spreadBitsLong(y) << 1))
    assert(hilbert < morton,
      s"Hilbert boxes ($hilbert) not tighter than Morton ($morton)")
  }

  test("column expression matches the kernel through codegen") {
    import spark.implicits._
    val df = Seq((0L, 0L), (5L, 9L), (65535L, 65535L), (12345L, 54321L))
      .toDF("x", "y")
      .select(Hilbert.hkey(org.apache.spark.sql.functions.col("x"),
        org.apache.spark.sql.functions.col("y")).as("h"))
    val got = df.collect().map(_.getLong(0))
    val want = Seq((0L, 0L), (5L, 9L), (65535L, 65535L), (12345L, 54321L))
      .map { case (x, y) => HilbertKernels.xy2d(Hilbert.Order, x, y) }
    assert(got.toSeq === want)
  }
}
