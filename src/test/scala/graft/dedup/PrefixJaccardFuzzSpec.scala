package graft.dedup

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Randomized adversarial check of the prefix-filter candidate lemma:
  * tiny vocabularies (every shingle hot — frequency order buys nothing),
  * heavy duplication, empty/short docs, random thresholds. Any candidate
  * the prefix path misses is a silent false NEGATIVE the fixed-corpus
  * spec could only catch at its one threshold — this sweeps the
  * (corpus, threshold) space. Seeded, so failures reproduce.
  */
class PrefixJaccardFuzzSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val rnd = new Random(20260815L)

  private def brute(df: org.apache.spark.sql.DataFrame, pct: Int) = {
    val post = df.select(col("doc_id").as("id"),
      explode(Dedup.wordShingles(col("text"), 2)).as("s"))
    val sz = post.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    post.select(col("id").as("id_a"), col("s"))
      .join(post.select(col("id").as("id_b"), col("s")), Seq("s"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("inter"))
      .join(sz.select(col("id").as("id_a"), col("sz").as("sz_a")), Seq("id_a"))
      .join(sz.select(col("id").as("id_b"), col("sz").as("sz_b")), Seq("id_b"))
      .filter(col("inter") * 100 >=
        (col("sz_a") + col("sz_b") - col("inter")) * pct)
      .select(col("id_a"), col("id_b"))
  }

  test("random hot-vocab corpora: prefix path == brute force at any t") {
    for (round <- 1 to 5) {
      val vocab = 3 + rnd.nextInt(8)            // 3-10 words: all shingles hot
      val nDocs = 30 + rnd.nextInt(40)
      val docs = (0 until nDocs).map { i =>
        val len = rnd.nextInt(12)               // includes 0/1-token docs
        val words = Seq.fill(len)(s"w${rnd.nextInt(vocab)}")
        // occasional near-identical copies of an earlier doc
        val text =
          if (i > 0 && rnd.nextInt(4) == 0) null.asInstanceOf[String]
          else words.mkString(" ")
        (i.toLong, text)
      }.toDF("doc_id", "text")
        // null text rows: operator must drop them, not throw
      val pct = Seq(20, 35, 50, 70, 90)(rnd.nextInt(5))
      val fast = Dedup.prefixJaccardPairs(docs, "doc_id", "text",
        n = 2, thresholdPct = pct)
        .select(col("id_a"), col("id_b"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val slow = brute(docs, pct)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(fast === slow, s"round $round vocab $vocab pct $pct")
    }
  }

  test("identical-doc corpus at t=100: all pairs, none lost") {
    val docs = (1L to 40L).map(i => (i, "a b c a b")).toDF("doc_id", "text")
    val n = Dedup.prefixJaccardPairs(docs, "doc_id", "text",
      n = 2, thresholdPct = 100).count()
    assert(n === 40L * 39 / 2)
  }
}
