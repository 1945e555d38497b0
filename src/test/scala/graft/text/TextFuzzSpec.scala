package graft.text

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Poison-row fuzzing for the text-analysis expressions — the same
  * degrade-never-throw contract as the codecs: at 100 TB the corpus WILL
  * contain nulls, empty strings, lone surrogates, control characters,
  * zero-width runs, and megabyte tokens, and one throwing row fails its
  * whole task. Seeded, so failures reproduce.
  */
class TextFuzzSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val rnd = new Random(20260812L)

  private def hostileStrings: Seq[String] = {
    val curated = Seq(
      null,
      "",
      " ",
      "\t\n\r",
      "\u0000\u0001\u0007\u001b",        // control chars
      "\uD800",                          // lone high surrogate
      "\uDC00",                          // lone low surrogate
      "\ufeff\u200b\u200d",               // BOM + zero-width runs
      "a" * 100000,                      // one megatoken
      ("word " * 5000).trim,             // many tokens
      "🦀🦀🦀 🧪 ✨",                      // astral-plane emoji
      "İstanbul ß ﬀ",                    // locale-sensitive case folds
      "価格は¥1,000です。改行\nなし",       // CJK, no ASCII spaces
      "a\u0301e\u0301",                    // combining accents
      ".,!?;:.,!?;:")                    // punctuation only
    val randoms = (1 to 200).map { _ =>
      val len = rnd.nextInt(64)
      new String(Array.fill(len)(rnd.nextInt(0xFFFF).toChar))
    }
    curated ++ randoms
  }

  test("every text expression evaluates over hostile input without throwing") {
    val df = hostileStrings.toDF("text")
    val out = df.select(
      TextFunctions.tokenCount(col("text")).as("n_tok"),
      TextFunctions.bpeIshTokenCount(col("text")).as("n_bpe"),
      TextFunctions.punctRatio(col("text")).as("punct"),
      TextFunctions.stopwordRatio(col("text"), Seq("the", "a")).as("stop"),
      TextFunctions.meanTokenLength(col("text")).as("mtl"),
      TextFunctions.qualityScore(col("text"), Seq("the", "a")).as("q"),
      TextFunctions.repetitionRatio(col("text")).as("rep"),
      TextFunctions.topBigramFraction(col("text")).as("bigram"),
      TextFunctions.fingerprint(col("text")).as("fp"),
      TextFunctions.langId(col("text")).as("lang"),
      TextFunctions.rollingHash(col("text")).as("rh"))
      .collect()
    assert(out.length === hostileStrings.length)
    // ratio-valued outputs stay in [0, 1] (or null) even on garbage
    out.foreach { r =>
      Seq("punct", "stop", "rep", "bigram").foreach { c =>
        val i = r.fieldIndex(c)
        if (!r.isNullAt(i)) {
          val v = r.getDouble(i)
          assert(!v.isNaN && v >= 0.0 && v <= 1.0, s"$c out of range: $v")
        }
      }
    }
  }

  test("boilerplate removal, chunking, and bm25 survive hostile input") {
    val df = hostileStrings.toDF("text")
      .withColumn("doc_id", monotonically_increasing_id())
    val cleaned = Boilerplate.removeBoilerplate(df, "doc_id", "text",
        n = 2, maxDocFreq = 3).collect()
    assert(cleaned.length === hostileStrings.length,
      "every doc keeps a row, even null/empty/garbage")
    cleaned.foreach { r =>
      val (nKept, nDropped) = (r.getLong(2), r.getLong(3))
      assert(nKept >= 0 && nDropped >= 0, s"negative counts: $r")
    }
    val chunks = Chunking.chunkDocuments(df, "doc_id", "text",
        window = 8, stride = 4).collect()
    chunks.foreach { r =>
      assert(r.getLong(3) >= 1 && r.getLong(3) <= 8,
        s"chunk size out of [1, window]: $r")
    }
    val scores = TextRanking.bm25(df, "doc_id", "text",
        terms = Seq("word", "the")).collect()
    assert(scores.length === hostileStrings.length)
    scores.foreach { r =>
      assert(!r.isNullAt(1) && !r.getDouble(1).isNaN, s"NaN bm25: $r")
    }
    val relScores = TextRanking.bm25Relation(df, "doc_id", "text",
        terms = Seq("word", "the").toDF("term")).collect()
    assert(relScores.length === hostileStrings.length)
    relScores.foreach { r =>
      assert(!r.isNullAt(1) && !r.getDouble(1).isNaN, s"NaN bm25_rel: $r")
    }
    val lm = LanguageModel.bigramLogProbScores(df, "doc_id", "text").collect()
    assert(lm.length === hostileStrings.length,
      "every doc keeps an LM row, even null/empty/single-token")
    lm.foreach { r =>
      assert(!r.isNullAt(2) && !r.getDouble(2).isNaN, s"NaN lm score: $r")
      // smoothed probabilities are < 1, so every real score is negative;
      // gram-less docs are exactly 0
      assert(r.getDouble(2) <= 0.0, s"positive log-prob: $r")
    }
  }

  test("dedup signature kernels survive hostile input") {
    val df = hostileStrings.toDF("text")
      .withColumn("doc_id", monotonically_increasing_id())
    import graft.dedup.Dedup
    val coeffs = Dedup.minhashCoefficients(8, seed = 7L)
    val out = df.select(col("doc_id"),
      Dedup.wordShingles(col("text"), 2).as("sh"))
      .select(col("doc_id"),
        Dedup.minhashSignature(col("sh"), coeffs).as("sig"),
        size(col("sh")).as("n_sh"))
      .collect()
    assert(out.length === hostileStrings.length)
    // signature width is fixed regardless of input pathology
    out.foreach(r => assert(r.getSeq[Long](1).length === 8))
  }
}
