package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** aHash64 contracts beyond what the oracled catalog queries pin: poison
  * rows, degenerate images, re-encode invariance, and locality (small
  * visual edits → small Hamming distance).
  */
class AHashSpec extends AnyFunSuite {

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("undecodable / empty payloads hash to 0 (poison-row contract)") {
    assert(ImageCodecs.aHash64(null) === 0L)
    assert(ImageCodecs.aHash64(Array.emptyByteArray) === 0L)
    assert(ImageCodecs.aHash64("not a png".getBytes) === 0L)
  }

  test("solid image hashes to 0: no cell exceeds the mean") {
    assert(ImageCodecs.aHash64(ImageCodecs.solidPng(16, 16, 200, 10, 30)) === 0L)
  }

  test("left-bright two-stripe image sets exactly the left half-bytes") {
    val png = ImageCodecs.stripePng(16, 16, Seq((255, 255, 255), (0, 0, 0)))
    assert(ImageCodecs.aHash64(png) === 0xF0F0F0F0F0F0F0F0L)
  }

  test("re-encode at the same size is hash-invariant; resize is near-invariant") {
    val png = ImageCodecs.stripePng(16, 16,
      Seq((250, 40, 10), (10, 200, 60), (30, 30, 30), (200, 200, 0)))
    val h0 = ImageCodecs.aHash64(png)
    assert(h0 !== 0L)
    // lossless round-trip: identical pixels, identical hash
    assert(ImageCodecs.aHash64(ImageCodecs.resize(png, 16, 16)) === h0)
    // 2x upscale of a stripe image: same stripes, hash within a small
    // Hamming band (bilinear edges may flip boundary cells only)
    val up = ImageCodecs.aHash64(ImageCodecs.resize(png, 32, 32))
    assert(hamming(h0, up) <= 16, s"upscale moved hash too far: ${hamming(h0, up)}")
  }

  test("stacked fixture: shared top half collides on top bands, rotations land at Hamming 16/32") {
    // the q_media_phash_near fixture contract: a plain stripe image's hash
    // is one byte repeated (all four 16-bit bands equal — banded near-dup
    // candidates structurally impossible), so the near-dup query uses a
    // stacked fixture whose halves vary independently. Pin the properties
    // the query's non-vacuity rests on: same-top images share the two top
    // bands exactly, adjacent palette rotations sit at Hamming 16 (kept)
    // and opposite rotations at 32 (filtered).
    val top = Seq((250, 40, 10), (10, 200, 60), (30, 30, 30), (200, 200, 0))
    val pal = Array((200, 200, 200), (200, 200, 200), (10, 10, 10), (10, 10, 10))
    def h(rot: Int) = ImageCodecs.aHash64(ImageCodecs.stackedStripePng(16, 16,
      top, (0 until 4).map(j => pal((j + rot) % 4))))
    val hashes = (0 until 4).map(h)
    assert(hashes.distinct.size === 4)
    def band(x: Long, b: Int): Long = (x >> (b * 16)) & 0xffffL
    for (r <- 1 until 4; b <- 2 to 3)
      assert(band(hashes(0), b) === band(hashes(r), b),
        s"top band $b diverged for rotation $r")
    assert(hamming(hashes(0), hashes(1)) === 16)
    assert(hamming(hashes(1), hashes(2)) === 16)
    assert(hamming(hashes(0), hashes(2)) === 32)
  }

  test("distinct stripe patterns land far apart") {
    val a = ImageCodecs.aHash64(ImageCodecs.stripePng(16, 16,
      Seq((255, 255, 255), (0, 0, 0), (255, 255, 255), (0, 0, 0))))
    val b = ImageCodecs.aHash64(ImageCodecs.stripePng(16, 16,
      Seq((0, 0, 0), (255, 255, 255), (0, 0, 0), (255, 255, 255))))
    assert(hamming(a, b) === 64)
  }
}
