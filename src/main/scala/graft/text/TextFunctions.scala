package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale training-data pipelines:
  * tokenization, quality scoring, language-ID, fingerprinting.
  *
  * Everything here is built from `org.apache.spark.sql.functions._`
  * (codegen'd, no UDFs), so the operators pipeline inside whole-stage
  * codegen and scale linearly with the scan — the shape you want when the
  * `documents` table is 100 TB.
  */
object TextFunctions {

  /** Whitespace tokens with empties removed (leading/trailing whitespace
    * yields empty strings from split; filter keeps exact counts portable). */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= lit(""))

  def lowerTokens(text: Column): Column = tokens(lower(text))

  /** Null-safe lowercase tokens: NULL text behaves as an empty document
    * (zero tokens), not NULL. ONE definition shared by every operator
    * whose DuckDB twin tokenizes with `toksSql` (chunking, BM25, the
    * bigram LM, vocab stats) — the Spark side and the SQL side must
    * lowercase and filter identically or the oracles silently diverge on
    * the first mixed-case corpus.
    */
  def safeLowerTokens(text: Column): Column =
    coalesce(lowerTokens(text), array())

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish pre-tokenization count: alphanumeric runs count as words and
    * every other non-space char counts as its own token (the pre-token split
    * a byte-pair tokenizer applies before merges). RE2-safe regex, portable
    * across engines. */
  def bpeIshTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-zA-Z0-9]+|[^a-zA-Z0-9\\s]"), lit(0)))
      .cast("long")

  /** Punctuation density: punctuation chars / total chars. */
  def punctRatio(text: Column): Column =
    when(length(text) > 0,
      length(regexp_replace(text, "[^.!?,;:]", "")).cast("double") / length(text))
      .otherwise(lit(0.0))

  /** Fraction of tokens that are in `stopwords` (duplicates counted). */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val toks = lowerTokens(text)
    val sw = typedlit(stopwords)
    when(size(toks) > 0,
      size(filter(toks, t => array_contains(sw, t))).cast("double") / size(toks))
      .otherwise(lit(0.0))
  }

  /** Mean token length in characters. */
  def meanTokenLength(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) > 0,
      aggregate(toks, lit(0L), (acc, t) => acc + length(t).cast("long"))
        .cast("double") / size(toks))
      .otherwise(lit(0.0))
  }

  /** Composite quality score in [0,1]: rewards mid-length docs, penalizes
    * punctuation soup and stopword-free (likely non-linguistic) text.
    * Deterministic arithmetic over the component signals.
    */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = {
    val nTok = tokenCount(text)
    val lengthOk = when(nTok >= 10 && nTok <= 10000, lit(1.0))
      .when(nTok > 0, lit(0.5)).otherwise(lit(0.0))
    val punctOk = when(punctRatio(text) < 0.2, lit(1.0)).otherwise(lit(0.3))
    val swr = stopwordRatio(text, stopwords)
    val swOk = when(swr > 0.03 && swr < 0.6, lit(1.0)).otherwise(lit(0.4))
    round((lengthOk + punctOk + swOk) / 3.0, 6)
  }

  /** Token repetition ratio in [0,1): 1 − distinct tokens / tokens
    * (lowercased). The Gopher-style repetition signal (Rae et al. 2021,
    * §A1.1 quality filters): boilerplate and spam repeat; prose doesn't.
    * Pure Catalyst collection functions — no UDF, linear in tokens.
    */
  def repetitionRatio(text: Column): Column = {
    val toks = lowerTokens(text)
    when(size(toks) > 0,
      round(lit(1.0) - size(array_distinct(toks)).cast("double") / size(toks), 6))
      .otherwise(lit(0.0))
  }

  /** Fraction of tokens covered by occurrences of the single most frequent
    * word bigram: 2 × max bigram count / token count (0 when < 2 tokens) —
    * the second Gopher repetition axis ("fraction of characters in the most
    * common n-gram"), counted in tokens so any SQL engine reproduces it
    * exactly; capped at 1.0 because overlapping occurrences double-count
    * shared tokens ("go go go go" has 3 overlapping "go go"s over 4
    * tokens). Per-row frequency counting is a primitive-loop UDF: the HOF
    * equivalent evaluates interpreted per element and would be O(n²) per
    * row (see the dedup shingle lesson).
    */
  def topBigramFraction(text: Column): Column = {
    val maxBigram = udf((toks: Seq[String]) => {
      if (toks == null || toks.length < 2) 0L
      else {
        val counts = new java.util.HashMap[String, Long]()
        var best = 0L
        var i = 0
        while (i < toks.length - 1) {
          val bg = toks(i) + " " + toks(i + 1)
          val c = counts.merge(bg, 1L, (a, b) => a + b)
          if (c > best) best = c
          i += 1
        }
        best
      }
    })
    val toks = lowerTokens(text)
    when(size(toks) >= 2,
      round(least(lit(1.0), lit(2.0) * maxBigram(toks).cast("double") / size(toks)), 6))
      .otherwise(lit(0.0))
  }

  /** Canonical-form document fingerprint: md5 of whitespace-normalized,
    * lowercased text. Stable across engines; the exact-dedup key. */
  def fingerprint(text: Column): Column =
    md5(lower(regexp_replace(trim(text), "\\s+", " ")))

  /** Language-ID stopword tables (tiny, deterministic heuristic). */
  val langStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "was"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"),
    "es" -> Seq("el", "los", "y", "es", "un", "una", "en", "por", "para", "las"))

  /** N-gram-free stopword-hit language ID: argmax of per-language stopword
    * hit counts with fixed priority order (en > de > fr > es), 'und'
    * (undetermined) when nothing hits.
    */
  def langId(text: Column): Column = {
    val toks = lowerTokens(text)
    val hits = langStopwords.map { case (lang, words) =>
      lang -> size(filter(toks, t => array_contains(typedlit(words), t)))
    }.toMap
    val (en, de, fr, es) = (hits("en"), hits("de"), hits("fr"), hits("es"))
    when(en >= de && en >= fr && en >= es && en > 0, "en")
      .when(de >= fr && de >= es && de > 0, "de")
      .when(fr >= es && fr > 0, "fr")
      .when(es > 0, "es")
      .otherwise("und")
  }

  /** Rolling polynomial hash (Rabin-Karp style) over the canonicalized
    * character stream: h = fold((acc * 131 + codepoint(c)) mod 2^31-1) —
    * order-sensitive (unlike the md5 fingerprint it changes when text
    * reorders) and expressible with exact integer arithmetic in any engine.
    * Stays within BIGINT: acc < 2^31, so acc*131 + c < 2^39.
    */
  def rollingHash(text: Column): Column = {
    val p = lit(2147483647L) // 2^31 - 1
    val canonical = lower(regexp_replace(trim(text), "\\s+", " "))
    // '.' matches every char here: canonicalization removed all newlines
    val chars = regexp_extract_all(canonical, lit("."), lit(0))
    aggregate(chars, lit(0L),
      (acc, c) => pmod(acc * lit(131L) + ascii(c).cast("long"), p))
  }
}
