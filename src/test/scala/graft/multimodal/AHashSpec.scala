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

  test("distinct stripe patterns land far apart") {
    val a = ImageCodecs.aHash64(ImageCodecs.stripePng(16, 16,
      Seq((255, 255, 255), (0, 0, 0), (255, 255, 255), (0, 0, 0))))
    val b = ImageCodecs.aHash64(ImageCodecs.stripePng(16, 16,
      Seq((0, 0, 0), (255, 255, 255), (0, 0, 0), (255, 255, 255))))
    assert(hamming(a, b) === 64)
  }
}
