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

  test("the closed-form chunk count (n-1)/stride + 1 matches the operator") {
    // q_corpus_build accounts chunks with this formula instead of
    // exploding them — the two must agree for every document length
    val docs = (1 to 150).map(n => (n.toLong, (1 to n).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val actual = Chunking.chunkDocuments(docs, "doc_id", "text", 64, 32)
      .groupBy("doc_id").count()
      .as[(Long, Long)].collect().toMap
    (1 to 150).foreach { n =>
      assert(actual(n.toLong) === ((n - 1) / 32 + 1).toLong, s"len $n")
    }
  }
}
