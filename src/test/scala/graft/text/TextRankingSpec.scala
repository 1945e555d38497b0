package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class TextRankingSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "spark join"),
    (2L, "spark spark window"),
    (3L, "other words entirely")
  ).toDF("doc_id", "text")

  private lazy val scores = TextRanking.bm25(docs, "doc_id", "text",
      terms = Seq("spark"), k1 = 1.2, b = 0.75)
    .as[(Long, Double)].collect().toMap

  test("bm25 matches the closed-form value on a hand-checkable corpus") {
    // N=3, avgdl=(2+3+3)/3=8/3, df(spark)=2 -> idf = ln(1 + 1.5/2.5)
    val idf = math.log(1.0 + (3.0 - 2.0 + 0.5) / (2.0 + 0.5))
    // (1.2 + 1.0), not the literal 2.2 — the two differ in binary and the
    // operator computes k1 + 1.0 at runtime
    def expected(tf: Double, dl: Double): Double =
      BigDecimal(idf * tf * (1.2 + 1.0) /
          (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / (8.0 / 3.0))))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(scores(1L) === expected(1.0, 2.0))
    assert(scores(2L) === expected(2.0, 3.0))
  }

  test("documents without any query term score zero; repetition outranks single hit") {
    assert(scores(3L) === 0.0)
    assert(scores(2L) > scores(1L))
  }

  test("the term-relation variant reproduces the scalar scores exactly") {
    val rel = TextRanking.bm25Relation(docs, "doc_id", "text",
        terms = Seq("spark", "join").toDF("term"), termCol = "term",
        k1 = 1.2, b = 0.75)
      .as[(Long, Double)].collect().toMap
    val scalar = TextRanking.bm25(docs, "doc_id", "text",
        terms = Seq("spark", "join"), k1 = 1.2, b = 0.75)
      .as[(Long, Double)].collect().toMap
    assert(rel === scalar)
    assert(rel(3L) === 0.0, "no-match doc restored with score 0 via the spine join")
  }

  test("duplicate terms in the relation do not double-score") {
    val rel = TextRanking.bm25Relation(docs, "doc_id", "text",
        terms = Seq("spark", "spark").toDF("term"), termCol = "term",
        k1 = 1.2, b = 0.75)
      .as[(Long, Double)].collect().toMap
    assert(rel(1L) === scores(1L), "distinct() dedups the term relation")
  }
}
