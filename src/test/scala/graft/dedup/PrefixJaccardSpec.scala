package graft.dedup

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The prefix-filtered Jaccard join is claimed EXACT (lossless candidate
  * generation) — so its one law is equality with the brute-force
  * all-shared-shingle-pairs computation, plus the boundary behavior that
  * makes "exact" meaningful: pairs AT the threshold are kept, pairs one
  * shingle short are dropped, and a pair whose only shared shingles are
  * the corpus-hottest ones is still found (the case the df-capped
  * [[Dedup.jaccardPairs]] deliberately gives up).
  */
class PrefixJaccardSpec extends AnyFunSuite with SparkSpec {

  private val d = "/root/testdata/sf0.001"

  /** Brute force: every pair sharing >=1 bigram, exact integer accept. */
  private def brute(df: org.apache.spark.sql.DataFrame, pct: Int) = {
    val post = df
      .select(col("doc_id").as("id"),
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
      .select(col("id_a"), col("id_b"),
        round(col("inter").cast("double") /
          (col("sz_a") + col("sz_b") - col("inter")), 6).as("jaccard"))
  }

  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("equals brute force on the corpus (no df cap, no blocking)") {
    val docs = graft.ops.Tables.documents(spark, d)
    val fast = asSet(Dedup.prefixJaccardPairs(docs, "doc_id", "text",
      n = 2, thresholdPct = 10))
    val slow = asSet(brute(docs, 10))
    assert(fast === slow)
    assert(fast.nonEmpty, "vacuous fixture: no pair at threshold 0.10")
  }

  test("threshold boundary: J == t kept, one percent above dropped") {
    import spark.implicits._
    // a: tokens w0..w7 -> 7 bigrams w0w1..w6w7; b: w3..w10 -> 7 bigrams
    // w3w4..w9w10; shared w3w4..w6w7 = 4 -> union 10, J = 0.4 EXACTLY
    val a = (0 to 7).map(i => s"w$i").mkString(" ")
    val b = (3 to 10).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    def at(pct: Int) = Dedup.prefixJaccardPairs(docs, "doc_id", "text",
      n = 2, thresholdPct = pct).count()
    assert(at(40) === 1L) // exactly at threshold: kept (>= is inclusive)
    assert(at(41) === 0L) // one percent above: dropped
  }

  test("pair whose shared shingles are the corpus-hottest is still found") {
    import spark.implicits._
    // 100 filler docs all contain "hot a"/"a hot"-style bigrams making
    // "hot hot" the most frequent shingle; docs 1000/1001 are identical
    // and share ONLY hot shingles. A df-capped path (cap < 102) drops
    // every posting of theirs; the prefix path must still emit the pair.
    val hotText = "hot hot hot hot"
    val filler = (1L to 100L).map(i => (i, hotText))
    val docs = (filler :+ ((1000L, hotText)) :+ ((1001L, hotText)))
      .toDF("doc_id", "text")
    val out = Dedup.prefixJaccardPairs(docs, "doc_id", "text",
      n = 2, thresholdPct = 90)
    // every pair of the 102 identical docs qualifies (J = 1.0)
    assert(out.count() === 102L * 101L / 2)
    val capped = Dedup.jaccardPairs(docs, "doc_id", "text",
      blockCols = Nil, n = 2, threshold = 0.9, maxDocFreq = 50).count()
    assert(capped === 0L, "df-capped path should lose these (the contrast)")
  }
}
