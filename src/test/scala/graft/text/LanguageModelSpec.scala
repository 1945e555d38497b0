package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class LanguageModelSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "a b a b"),
    (2L, "a b"),
    (3L, "z q"),
    (4L, "solo")
  ).toDF("doc_id", "text")

  private lazy val scores = LanguageModel
    .bigramLogProbScores(docs, "doc_id", "text", k = 0.5)
    .as[(Long, Long, Double)].collect()
    .map(r => r._1 -> ((r._2, r._3))).toMap

  test("bigram log-probs match the closed-form values on a hand corpus") {
    // corpus bigrams (with multiplicity): doc1 {a b, b a, a b}, doc2 {a b},
    // doc3 {z q} -> c(a b)=3, c(b a)=1, c(z q)=1; prefix totals c(a.)=3,
    // c(b.)=1, c(z.)=1; vocab {a,b,z,q,solo} -> V=5
    val V = 5.0
    def p(cbg: Double, cw1: Double) = (cbg + 0.5) / (cw1 + 0.5 * V)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val pab = math.log(p(3, 3)); val pba = math.log(p(1, 1))
    val pzq = math.log(p(1, 1))
    assert(scores(1L) === ((3L, r6((pab + pba + pab) / 3.0))))
    assert(scores(2L) === ((1L, r6(pab))))
    assert(scores(3L) === ((1L, r6(pzq))))
  }

  test("docs without bigrams score zero with zero count") {
    assert(scores(4L) === ((0L, 0.0)))
  }

  test("the common phrase outscores the rare one") {
    // "a b" (seen 3x after prefix "a") is more probable than "z q"
    // (singleton): the filter signal a curation pipeline thresholds on
    assert(scores(2L)._2 > scores(3L)._2)
  }
}
