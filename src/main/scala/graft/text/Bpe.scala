package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer with driver-trained, frozen merges —
  * the subword token accounting production data budgets use (whitespace
  * counts over-weight agglutinative text and under-weight code).
  *
  * Train/apply split mirrors the quantizer doctrine
  * ([[graft.sim.Knn.trainSphericalKmeans]], SemanticCentroids): merges are
  * learned ONCE offline on a bounded vocabulary (graft.GenBpeMerges →
  * [[BpeMerges]], shortest literal freeze), then tokenization is a pure
  * per-row projection — no training inside any query plan, so the 100 TB
  * path is one scan with a broadcast-sized merge table riding in the
  * closure. The DuckDB oracle replays the SAME frozen merges, so
  * tokenization hash-matches cross-engine.
  *
  * Simplifications vs GPT-2-style BPE, chosen for cross-engine
  * determinism (all documented, none load-bearing for budget accounting):
  * pre-tokens are lowercased whitespace words (the [[TextFunctions]]
  * doctrine — no byte fallback, no end-of-word marker), and encoding
  * applies merges IN TRAINING ORDER with left-to-right non-overlapping
  * replacement, the Sennrich re-apply formulation.
  *
  * Parity by construction: both engines tokenize a word by running the
  * IDENTICAL string-replace chain over a delimiter-wrapped form —
  * "cat" → "<c><a><t>", each merge (a,b) is `replace("<a><b>" →
  * "<ab>")`. Java's String.replace and DuckDB's replace() both scan
  * left-to-right and restart AFTER the replacement, so overlap handling
  * ("<a><a><a>" + merge(a,a) → "<aa><a>") agrees bit-for-bit. The
  * wrapper makes a merge match exactly a symbol boundary — a bare
  * space-joined form would let merge (l,lo) match inside symbol pair
  * (al,lo). Delimiters are safe because [[BpeMerges]] generation
  * requires every symbol to be strictly alphanumeric.
  */
object Bpe {

  /** Train `numMerges` merges over a (word → frequency) vocabulary.
    *
    * Deterministic: each step merges the pair with the highest
    * frequency-weighted count, ties broken by lexicographically smallest
    * (left, right). Callers bound the vocabulary (top-V words), NOT the
    * corpus — at 100 TB the word-frequency aggregate is one shuffle and
    * the driver only ever sees V rows (the same bounded-stats boundary as
    * every trainer in this repo).
    */
  def trainMerges(
      wordFreqs: Seq[(String, Long)],
      numMerges: Int): Seq[(String, String)] = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    val words = scala.collection.mutable.LinkedHashMap(
      wordFreqs.map { case (w, f) => w -> w.map(_.toString).toVector }: _*)
    val freq = wordFreqs.toMap
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var step = 0
    var exhausted = false
    while (step < numMerges && !exhausted) {
      val counts = scala.collection.mutable.HashMap
        .empty[(String, String), Long]
      words.foreach { case (w, syms) =>
        val f = freq(w)
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts.update(p, counts.getOrElse(p, 0L) + f)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val bestCount = counts.valuesIterator.max
        val best = counts.collect { case (p, c) if c == bestCount => p }
          .minBy(identity)
        out += best
        val (a, b) = best
        words.mapValuesInPlace { (_, syms) =>
          val nb = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              nb += (a + b); i += 2
            } else { nb += syms(i); i += 1 }
          }
          nb.result()
        }
        step += 1
      }
    }
    out.toSeq
  }

  /** Tokenize one word by the wrapped replace chain (see object doc).
    * Exposed for the determinism spec; [[tokenize]] wraps it in a UDF.
    */
  private[text] def tokenizeWord(
      word: String,
      merges: Seq[(String, String)]): Array[String] = {
    if (word.isEmpty) return Array.empty
    val wrapped = word.map(c => s"<$c>").mkString
    val merged = merges.foldLeft(wrapped) { case (s, (a, b)) =>
      s.replace(s"<$a><$b>", s"<$a$b>")
    }
    merged.substring(1, merged.length - 1).split("><")
  }

  // per-executor memo: the token stream re-visits the same words
  // constantly (Zipf), and the replace chain is ~|merges| allocations per
  // word. ConcurrentHashMap because one UDF instance serves all task
  // threads; the size cap keeps an adversarial unique-word corpus from
  // growing the map without bound.
  private val memo =
    new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()
  private val MemoCap = 100000

  /** BPE token array of a document under the frozen [[BpeMerges]] table:
    * lowercased whitespace words, each expanded to its merge-chain
    * symbols, concatenated in document order. NULL text → empty array.
    */
  def tokenize(text: Column): Column = {
    val merges = BpeMerges.values.toSeq
    val f = udf((t: String) => {
      if (t == null) Array.empty[String]
      else {
        val words = t.toLowerCase.split("\\s+").filter(_.nonEmpty)
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        words.foreach { w =>
          var toks = memo.get(w)
          if (toks == null) {
            toks = tokenizeWord(w, merges)
            if (memo.size < MemoCap) memo.put(w, toks)
          }
          out ++= toks
        }
        out.toArray
      }
    })
    f(text)
  }

  /** [[tokenize]] under an EXPLICIT merge table (the frozen-table path
    * keeps its global memo; this one memoizes per call, because a memo
    * shared across different merge tables would serve stale splits).
    * The train→apply composition: pass [[trainMerges]]' output to
    * tokenize the same corpus the merges were learned from.
    */
  def tokenizeWith(text: Column,
      merges: Seq[(String, String)]): Column = {
    val local =
      new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()
    val f = udf((t: String) => {
      if (t == null) Array.empty[String]
      else {
        val words = t.toLowerCase.split("\\s+").filter(_.nonEmpty)
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        words.foreach { w =>
          var toks = local.get(w)
          if (toks == null) {
            toks = tokenizeWord(w, merges)
            if (local.size < MemoCap) local.put(w, toks)
          }
          out ++= toks
        }
        out.toArray
      }
    })
    f(text)
  }

  /** DuckDB expression string: the wrapped replace chain over `wordExpr`,
    * interpolated from the SAME frozen table as [[tokenize]] — the
    * shared-constant doctrine (a regenerated merge table cannot
    * desynchronize the twins). Result is the '<sym>…' wrapped form;
    * callers count tokens as `len(x) - len(replace(x,'<',''))` or unwrap
    * with `replace(replace(replace(x,'><',' '),'<',''),'>','')`.
    */
  def bpeWordSqlExpr(wordExpr: String): String = {
    val base = s"regexp_replace($wordExpr, '(.)', '<\\1>', 'g')"
    BpeMerges.values.foldLeft(base) { case (acc, (a, b)) =>
      s"replace($acc, '<$a><$b>', '<$a$b>')"
    }
  }
}
