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

  test("frozen-stats serving face: known bigrams score with the frozen " +
      "model, out-of-model bigrams are excluded, all-unseen docs " +
      "surface (0, 0.0) through the spine join") {
    val (lm, vocab) = LanguageModel.trainCounts(docs, "text")
    // in-corpus equivalence: the composition IS bigramLogProbScores
    val served = LanguageModel.scoreWith(docs, "doc_id", "text",
      lm.localCheckpoint(), vocab.localCheckpoint(), k = 0.5)
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(served === scores, "frozen == in-corpus on the training docs")
    // held-out docs: "a b" known, "b x"/"x y" unseen -> scored on the 1
    // known bigram only; an all-unseen doc keeps its spine row at 0
    val held = Seq((10L, "a b x y"), (11L, "q r")).toDF("doc_id", "text")
    val h = LanguageModel.scoreWith(held, "doc_id", "text", lm, vocab,
      k = 0.5).as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(h(10L)._1 === 1L, s"only the known bigram scores: ${h(10L)}")
    assert(h(11L) === ((0L, 0.0)), "all-unseen doc surfaces (0, 0.0)")
  }

  test("frozen-stats serving is stream == batch under any trigger " +
      "chopping (per-doc scoring against broadcast model state)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val (lm0, vocab0) = LanguageModel.trainCounts(docs, "text")
    val lm = lm0.localCheckpoint(); val vocab = vocab0.localCheckpoint()
    val held = Seq((10L, "a b x y"), (11L, "q r"), (12L, "a b a b z q"),
      (13L, "b a"), (14L, "")).toDF("doc_id", "text")
    val batch = LanguageModel.scoreWith(held, "doc_id", "text", lm, vocab,
      k = 0.5).collect().map(_.toSeq).toSet
    val rows = held.as[(Long, String)].collect()
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val sink = new java.util.concurrent.ConcurrentLinkedQueue[Seq[Any]]()
    val q = stream.toDF().toDF("doc_id", "text").writeStream
      .outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        LanguageModel.scoreWith(b, "doc_id", "text", lm, vocab, k = 0.5)
          .collect().foreach(r => sink.add(r.toSeq))
        ()
      }.start()
    try {
      stream.addData(rows.take(2): _*)
      q.processAllAvailable()
      stream.addData(rows.slice(2, 3): _*)
      q.processAllAvailable()
      stream.addData(rows.drop(3): _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(sink.toArray.map(_.asInstanceOf[Seq[Any]]).toSet === batch,
      "streamed serving must equal the batch twin exactly")
  }
}
