package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class ChunkingSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def chunksOf(text: String, window: Int, stride: Int) =
    Chunking.chunkDocuments(Seq((1L, text)).toDF("doc_id", "text"),
        "doc_id", "text", window, stride)
      .as[(Long, Long, String, Long)].collect()
      .map(r => (r._2, r._3, r._4)).toList

  test("overlapping windows cover the stream; the final chunk may be short") {
    assert(chunksOf("a b c d e", window = 3, stride = 2) === List(
      (0L, "a b c", 3L), (1L, "c d e", 3L), (2L, "e", 1L)))
  }

  test("a document shorter than the window is one whole chunk") {
    assert(chunksOf("a b", window = 64, stride = 32) === List((0L, "a b", 2L)))
  }

  test("token-less documents produce no chunks") {
    assert(chunksOf("   ", window = 4, stride = 2) === Nil)
  }

  test("stride == window tiles without overlap") {
    assert(chunksOf("a b c d", window = 2, stride = 2) === List(
      (0L, "a b", 2L), (1L, "c d", 2L)))
  }
}
