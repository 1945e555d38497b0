package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Greedy-merge determinism and encode semantics for the BPE tokenizer —
  * the DuckDB oracle (q_text_bpe) checks cross-engine value parity on the
  * corpus; this pins the trainer's tie-breaking, the encode edge cases,
  * and the frozen table's provenance.
  */
class BpeSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("training is deterministic: same corpus in, same merges out") {
    val corpus = Seq(("lower", 10L), ("lowest", 6L), ("newer", 8L),
      ("newest", 5L), ("wider", 3L))
    val a = Bpe.trainMerges(corpus, 12)
    val b = Bpe.trainMerges(corpus, 12)
    assert(a === b)
    assert(a.length === 12)
  }

  test("input order cannot change the result (counts decide, then pair order)") {
    val corpus = Seq(("ab", 5L), ("cd", 5L), ("ef", 3L))
    val merges = Bpe.trainMerges(corpus, 1)
    val shuffled = Bpe.trainMerges(corpus.reverse, 1)
    // (a,b) and (c,d) tie at 5; the lexicographically smaller pair wins
    assert(merges === Seq(("a", "b")))
    assert(shuffled === merges)
  }

  test("frequency weighting picks the heavier pair, not the more frequent word-count") {
    // pair (a,b) appears once in a weight-10 word; (x,y) once in each of
    // three weight-1 words
    val corpus = Seq(("ab", 10L), ("xy", 1L), ("xyz", 1L), ("wxy", 1L))
    assert(Bpe.trainMerges(corpus, 1) === Seq(("a", "b")))
  }

  test("training exhausts gracefully when no pairs remain") {
    val corpus = Seq(("ab", 2L))
    val merges = Bpe.trainMerges(corpus, 10)
    assert(merges === Seq(("a", "b")), "one merge possible, then exhausted")
  }

  test("encode applies merges in training order, left-to-right, non-overlapping") {
    // merge (a,a) over "aaa": leftmost pair first -> [aa, a]
    assert(Bpe.tokenizeWord("aaa", Seq(("a", "a"))).toSeq === Seq("aa", "a"))
    // merge chain builds multi-char symbols only at true boundaries:
    // (l,o)->lo, then (lo,w)->low; "slow" -> [s, low]
    assert(Bpe.tokenizeWord("slow", Seq(("l", "o"), ("lo", "w"))).toSeq
      === Seq("s", "low"))
    // a later merge must NOT match inside an earlier multi-char symbol:
    // after (a,l)->al, pair (l,o) has no bare l left in "alo"
    assert(Bpe.tokenizeWord("alo", Seq(("a", "l"), ("l", "o"))).toSeq
      === Seq("al", "o"))
  }

  test("token concatenation round-trips the word for every frozen-vocab word") {
    val words = Seq("join", "hash", "customer", "window", "vector", "zzz", "q")
    words.foreach { w =>
      val toks = Bpe.tokenizeWord(w, BpeMerges.values.toSeq)
      assert(toks.mkString === w, s"round-trip broke for '$w'")
      assert(toks.forall(_.nonEmpty))
    }
  }

  test("the frozen merge table reproduces from its documented recipe (drift pin)") {
    // retrain on the sf0.01 vocabulary exactly as GenBpeMerges does; a
    // mismatch means someone edited BpeMerges.scala by hand or the
    // trainer's tie-breaking changed without regenerating
    val docs = graft.ops.Tables.documents(spark, "/root/testdata/sf0.01")
    val vocab = docs
      .select(explode(filter(split(lower(coalesce(col("text"), lit(""))),
        "\\s+"), t => t =!= "")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
      .orderBy(col("f").desc, col("w").asc)
      .limit(graft.GenBpeMerges.VocabCap)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val retrained = Bpe.trainMerges(vocab, graft.GenBpeMerges.NumMerges)
    assert(retrained === BpeMerges.values.toSeq)
  }

  test("tokenize projection: null text, empty text, unseen words") {
    val df = Seq((1L, "slow join"), (2L, null.asInstanceOf[String]),
      (3L, ""), (4L, "JOIN"), (5L, "qqq")).toDF("id", "text")
    val out = df.select(col("id"), Bpe.tokenize(col("text")).as("t"))
      .as[(Long, Seq[String])].collect().toMap
    assert(out(1L).mkString === "slowjoin", "concatenation round-trips")
    assert(out(2L) === Seq.empty, "null text -> empty token array")
    assert(out(3L) === Seq.empty)
    // case-insensitive: JOIN tokenizes like join (fully merged in the
    // frozen table)
    assert(out(4L) === Seq("join"))
    // unseen word still tokenizes (partial merges or raw chars)
    assert(out(5L).mkString === "qqq")
  }
}
