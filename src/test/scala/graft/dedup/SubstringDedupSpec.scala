package graft.dedup

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Planted-span semantics for exact substring dedup (Lee et al. 2022) —
  * the DuckDB oracle (q_dedup_substring) checks value parity on the
  * synthetic corpus; this pins the intended behavior on documents whose
  * span structure is known by construction. minLen = 4 here so the
  * plants stay readable; the production knob is orthogonal.
  */
class SubstringDedupSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // "alpha beta gamma delta" is the 4-token span shared by docs 1/2/3;
  // doc 1 (lowest id) is canonical and keeps it. Doc 4 shares a LONGER
  // 5-token run with doc 5 ("one two three four five") — two overlapping
  // 4-windows whose coverage must merge into one 5-token excision.
  private lazy val docs = Seq(
    (1L, "alpha beta gamma delta tail1 tail2"),
    (2L, "head2 alpha beta gamma delta tail3"),
    (3L, "ALPHA Beta GAMMA delta"), // case-insensitive match, whole doc
    (4L, "one two three four five end4"),
    (5L, "start5 one two three four five"),
    (6L, "six seven eight nine"),   // unique content, untouched
    (7L, "tiny doc"),               // shorter than minLen: no windows
    (8L, null.asInstanceOf[String]) // null text: empty row, not a crash
  ).toDF("doc_id", "text")

  private lazy val out = Dedup.substringDedup(docs, "doc_id", "text", minLen = 4)
    .as[(Long, Long, Long, String)].collect()
    .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("every input document gets exactly one output row") {
    assert(out.size === 8)
  }

  test("the lowest-id occurrence is canonical and keeps its span") {
    assert(out(1L) === ((6L, 0L, "alpha beta gamma delta tail1 tail2")))
  }

  test("non-canonical occurrences are excised, surrounding text survives") {
    assert(out(2L) === ((6L, 4L, "head2 tail3")))
  }

  test("span matching is case-insensitive but the rebuild keeps original casing") {
    assert(out(3L) === ((4L, 4L, "")))
  }

  test("overlapping duplicated windows merge into one contiguous excision") {
    // docs 4/5 share a 5-token run = two 4-windows; doc 4 is canonical,
    // doc 5 must lose exactly the 5 covered tokens, not 4 or 8
    assert(out(4L) === ((6L, 0L, "one two three four five end4")))
    assert(out(5L) === ((6L, 5L, "start5")))
  }

  test("unique and sub-minLen documents pass through untouched") {
    assert(out(6L) === ((4L, 0L, "six seven eight nine")))
    assert(out(7L) === ((2L, 0L, "tiny doc")))
  }

  test("null text degrades to an empty row instead of poisoning the plan") {
    assert(out(8L) === ((0L, 0L, "")))
  }

  test("within-document repetition alone is NOT excised (cross-doc scope)") {
    val selfRep = Seq(
      (1L, "w x y z w x y z"),      // 4-gram repeats within ONE doc only
      (2L, "totally different words here")
    ).toDF("doc_id", "text")
    val r = Dedup.substringDedup(selfRep, "doc_id", "text", minLen = 4)
      .as[(Long, Long, Long, String)].collect().map(x => x._1 -> x._3).toMap
    assert(r(1L) === 0L, "self-repetition is the repetition scorer's job")
  }
}
