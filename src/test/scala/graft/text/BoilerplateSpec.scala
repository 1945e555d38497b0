package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Semantics of corpus-level boilerplate removal that the DuckDB oracle
  * (q_text_boilerplate) exercises only at corpus statistics: per-document
  * drop/keep behavior, ordered reassembly, and the sub-n-token edge.
  */
class BoilerplateSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "spam spam x1 y1"),
    (2L, "spam spam x2 y2"),
    (3L, "spam spam x3 y3"),
    (4L, "spam spam"),                // nothing but boilerplate
    (5L, "solo"),                     // fewer tokens than n: no grams
    (6L, "zeta alpha mike bravo")     // unique content, order matters
  ).toDF("doc_id", "text")

  private lazy val cleaned =
    Boilerplate.removeBoilerplate(docs, "doc_id", "text", n = 2, maxDocFreq = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap

  test("frequent grams drop only their covered positions") {
    // "spam spam" has df 3 > cap 2; every other bigram is unique
    assert(cleaned(1L) === (("x1 y1", 2L, 2L)))
    assert(cleaned(2L) === (("x2 y2", 2L, 2L)))
    assert(cleaned(3L) === (("x3 y3", 2L, 2L)))
  }

  test("a document that is pure boilerplate survives as an empty row, not a dropped row") {
    assert(cleaned(4L) === (("", 0L, 2L)))
  }

  test("documents shorter than the gram size pass through untouched") {
    assert(cleaned(5L) === (("solo", 1L, 0L)))
  }

  test("reassembly preserves token order, not sort order") {
    assert(cleaned(6L) === (("zeta alpha mike bravo", 4L, 0L)))
  }
}
