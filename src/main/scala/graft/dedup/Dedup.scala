package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextFunctions

/** Deduplication operators for large-scale corpus curation:
  * exact (fingerprint group-by), n-gram Jaccard, MinHash+LSH, SimHash.
  *
  * Scale design: exact dedup is one hash-aggregate on the fingerprint.
  * Pairwise similarity never goes all-pairs — candidates come either from
  * cheap blocking keys (small groups) or from LSH band buckets, so the join
  * fan-out stays near-linear in corpus size at 100 TB. Signatures are pure
  * Catalyst expressions (xxhash64-based), no UDFs.
  */
object Dedup {

  /** Exact-duplicate groups keyed by canonical md5 fingerprint:
    * (fp, keep_id = min id, dup_cnt). One shuffle on a 32-char key.
    */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(TextFunctions.fingerprint(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_cnt"))

  /** Keep one row per distinct canonical text (the min-id winner). */
  def dropExactDuplicates(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keep = exactGroups(df, idCol, textCol).select(col("keep_id").as(idCol))
    df.join(keep, Seq(idCol), "left_semi")
  }

  /** Incremental-ingest dedup: admit only batch docs whose canonical
    * fingerprint is NOT already in the corpus, then dedup within the batch
    * (min-id winner) — the nightly-delta shape: the corpus side reduces to
    * its DISTINCT 32-char fingerprints (never its text), so the anti join
    * broadcasts when the corpus fingerprint set fits and shuffles on `fp`
    * otherwise; the batch is scanned once. Returns (fp, keep_id, dup_cnt)
    * like [[exactGroups]], restricted to genuinely-new content.
    */
  def incrementalDedup(
      corpus: DataFrame, batch: DataFrame,
      idCol: String, textCol: String): DataFrame =
    batch
      .select(col(idCol), TextFunctions.fingerprint(col(textCol)).as("fp"))
      .join(
        corpus.select(TextFunctions.fingerprint(col(textCol)).as("fp")).distinct(),
        Seq("fp"), "left_anti")
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_cnt"))

  /** Distinct word n-gram shingles of the lowercased token stream.
    * Implemented as a primitive UDF: the equivalent Catalyst higher-order
    * expression evaluates interpreted AND gets inlined multiple times when
    * the optimizer pushes a derived filter below an exchange — measured ms
    * per row vs µs here. Semantics identical: whitespace split, empties
    * dropped, first-occurrence-order distinct.
    */
  def wordShingles(text: Column, n: Int): Column = {
    val shinglesUdf = udf((t: String) => {
      if (t == null) Array.empty[String]
      else {
        val toks = t.toLowerCase.split("\\s+").filter(_.nonEmpty)
        if (toks.length < n) Array.empty[String]
        else {
          val seen = new java.util.LinkedHashSet[String]()
          var i = 0
          while (i <= toks.length - n) {
            val sb = new StringBuilder(toks(i))
            var j = 1
            while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
            seen.add(sb.toString)
            i += 1
          }
          val out = new Array[String](seen.size)
          seen.toArray(out)
          out
        }
      }
    })
    shinglesUdf(text)
  }

  /** Jaccard similarity of two pre-distinct shingle arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = (size(a) + size(b)).cast("double") - inter
    when(union > 0, inter / union).otherwise(lit(0.0))
  }

  /** Jaccard as a primitive UDF (hash-set membership) — same value as
    * [[jaccard]] on pre-distinct arrays, ~an order of magnitude faster per
    * pair than the interpreted array_intersect expression.
    */
  private[dedup] val jaccardUdf = udf((a: Seq[String], b: Seq[String]) => {
    val sa = a.toSet
    var inter = 0
    b.foreach(x => if (sa.contains(x)) inter += 1)
    val union = a.length + b.length - inter
    if (union > 0) inter.toDouble / union else 0.0
  })

  /** N-gram Jaccard near-duplicate pairs via an inverted-index join:
    * explode distinct shingles to postings, equi-join postings on
    * (blockCols, shingle), count co-occurrences per (id_a < id_b) pair, and
    * compute Jaccard from exact integer set sizes:
    * |A∩B| / (|A| + |B| − |A∩B|).
    *
    * Scale shape: pairs that share NO shingle are never materialized — the
    * join fans out only through shared-shingle buckets, so cost tracks the
    * true candidate volume instead of |block|². (A naive
    * all-pairs-in-block cross join was 90 s at sf0.1; this is ~2 s with
    * bit-identical output, since the same integer sizes feed the same
    * division.)
    *
    * Hot-shingle guard: a shingle present in d documents fans the self-join
    * out to d·(d−1)/2 candidate rows, so ONE corpus stopword-shingle
    * ("of the", a boilerplate header) goes quadratic at 100 TB while
    * carrying ~zero similarity signal. Postings whose document frequency
    * exceeds `maxDocFreq` are dropped BEFORE the self-join and set sizes
    * are recomputed over the retained universe, so the output is the exact
    * Jaccard over the df-filtered shingle space — identical to the
    * unfiltered output whenever no shingle crosses the cap (any corpus
    * sample with fewer docs than the cap trivially qualifies). Candidate
    * volume is thus bounded by maxDocFreq²/2 per shingle regardless of
    * corpus size; for estimator-based discovery use [[minhashPairs]].
    */
  def jaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      blockCols: Seq[String],
      n: Int,
      threshold: Double,
      maxDocFreq: Int = 1000): DataFrame =
    coPairs(df, idCol, textCol, blockCols, n, maxDocFreq)
      .select(col("id_a"), col("id_b"),
        round(col("inter").cast("double") /
          (col("sz_a") + col("sz_b") - col("inter")), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)

  /** Top-k most-similar documents PER DOCUMENT by exact n-gram Jaccard —
    * the retrieval-shaped face of [[jaccardPairs]]: thresholds answer
    * "which pairs are duplicates"; top-k answers "what is most like THIS
    * doc" (near-dup triage, eval-set nearest-source attribution, template
    * mining). Candidates come from the identical lang-blocked, df-capped
    * postings join; every candidate pair is scored exactly, then each
    * direction keeps its k best under the total order (jaccard desc,
    * neighbor_id asc — ties deterministic). A doc with no
    * retained-shingle co-candidate emits no row (absent ≠ sim 0, the
    * BFS-unreached doctrine). The returned frame is backed by the
    * checkpointed pair-scale RDD — callers looping over many corpora
    * should [[releasePlan]] the result after consuming (the
    * [[connectedComponents]] contract).
    *
    * Scale shape: the pair frame is materialized ONCE (localCheckpoint —
    * the [[connectedComponents]] doctrine: a symmetrizing union would
    * otherwise re-execute the whole upstream pair detection per branch;
    * exchange reuse does NOT span the union's re-planned subtrees, plan-
    * verified). The checkpointed frame is pair-scale — candidate volume
    * bounded by the same df cap as every postings join here — and the
    * top-k window partitions by doc_id (keyed, never global).
    */
  def jaccardTopK(
      df: DataFrame,
      idCol: String,
      textCol: String,
      blockCols: Seq[String],
      n: Int,
      k: Int,
      maxDocFreq: Int = 1000): DataFrame = {
    val p = coPairs(df, idCol, textCol, blockCols, n, maxDocFreq)
      .select(col("id_a"), col("id_b"),
        round(col("inter").cast("double") /
          (col("sz_a") + col("sz_b") - col("inter")), 6).as("jaccard"))
      .localCheckpoint(true)
    val sym = p.select(col("id_a").as("doc_id"),
        col("id_b").as("neighbor_id"), col("jaccard"))
      .unionByName(p.select(col("id_b").as("doc_id"),
        col("id_a").as("neighbor_id"), col("jaccard")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(desc("jaccard"), asc("neighbor_id"))
    sym.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Asymmetric containment pairs over the same inverted-index candidates:
    * |A∩B| / min(|A|, |B|) — the quote/subset detector Jaccard is blind
    * to (a 50-shingle doc fully embedded in a 5000-shingle doc scores
    * jaccard 0.01 but containment 1.0; an LLM corpus full of article+
    * quote pairs needs exactly this). Same blocking, df cap, and exact
    * integer sizes as [[jaccardPairs]]; `contained_id` names the
    * smaller-set side — the row a subset-dedup policy drops.
    */
  def containmentPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      blockCols: Seq[String],
      n: Int,
      threshold: Double,
      maxDocFreq: Int = 1000): DataFrame =
    coPairs(df, idCol, textCol, blockCols, n, maxDocFreq)
      .select(col("id_a"), col("id_b"),
        round(col("inter").cast("double") /
          least(col("sz_a"), col("sz_b")), 6).as("containment"),
        when(col("sz_a") <= col("sz_b"), col("id_a")).otherwise(col("id_b"))
          .as("contained_id"))
      .filter(col("containment") >= threshold)

  /** EXACT threshold-Jaccard pair join by prefix filtering (the
    * AllPairs/ppjoin candidate strategy, Bayardo et al. 2007 / Xiao et
    * al. 2008) — the lossless complement to [[jaccardPairs]]'s df cap:
    * instead of DROPPING hot shingles (which perturbs the score the
    * moment any shingle crosses the cap), each doc indexes only its
    * prefix — the (sz − ⌈t·sz⌉ + 1) RAREST shingles under a global
    * frequency-ascending order. Prefix-filtering principle: any pair
    * with |A∩B| ≥ max(⌈t·|A|⌉, ⌈t·|B|⌉) shares its globally-smallest
    * common shingle in BOTH prefixes (if A's prefix missed every common
    * element, all ⌈t·|A|⌉+ of them would sit in A's last ⌈t·|A|⌉−1
    * positions — impossible), and J ≥ t implies that overlap bound, so
    * candidate generation has NO false negatives and verification makes
    * the result exact.
    *
    * Scale shape: the ordering pass is one shingle-keyed df aggregate
    * joined back to the postings, the per-doc prefix is an aggregate
    * (sort_array over collect_list — never a window), and the candidate
    * self-join keys on prefix shingles, which the frequency-ascending
    * order makes the RAREST ones — that is the whole lever: fan-out per
    * join key is small by construction, without discarding information.
    * Verification joins candidates (pair-scale) back to the full
    * postings on (id, shingle). Every shuffle is keyed; nothing
    * collects. (A corpus of near-identical docs still goes quadratic —
    * but there the OUTPUT is quadratic; that is inherent to exact
    * all-pairs, not to this plan.)
    *
    * `thresholdPct` is an integer percent so ⌈t·sz⌉ = (pct·sz + 99) div
    * 100 and the acceptance test inter·100 ≥ pct·(szA + szB − inter)
    * stay in exact integer arithmetic on both engines — the returned
    * `jaccard` double is reporting, never a comparison operand.
    */
  def prefixJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      thresholdPct: Int): DataFrame = {
    require(thresholdPct > 0 && thresholdPct <= 100,
      s"thresholdPct in (0, 100], got $thresholdPct")
    val base = graft.prep.Preprocessing.spread(df)
      .select(col(idCol).as("id"), wordShingles(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)
    // 8-byte hashed shingle keys, the coPairs doctrine (collision p
    // ~ |vocab|^2/2^64 — negligible); wordShingles already de-dups per
    // doc, so postings are (id, shk)-distinct by construction
    val post = base.select(col("id"), explode(col("sh")).as("s"))
      .select(col("id"), xxhash64(col("s")).as("shk"))
    val dfCnt = post.groupBy(col("shk")).agg(count(lit(1)).as("df_cnt"))
    // global total order: frequency-ascending, shk tiebreak (unique) —
    // the order that concentrates prefixes on rare shingles
    // sz long from birth: pct·sz and sz·100 below would ANSI-throw on an
    // int overflow at a degenerate ~2^31/100-shingle document — absurd
    // for prose, not for the adversarial inputs a 100 TB crawl contains
    val ordered = post.join(dfCnt, Seq("shk"))
      .groupBy(col("id"))
      .agg(sort_array(collect_list(struct(col("df_cnt"), col("shk"))))
        .as("arr"))
      .select(col("id"), size(col("arr")).cast("long").as("sz"),
        col("arr.shk").as("toks"))
    val prefix = ordered.select(col("id"), col("sz"),
      explode(slice(col("toks"), lit(1),
        (col("sz") - expr(s"(${thresholdPct}L * sz + 99L) div 100L") + lit(1L))
          .cast("int"))).as("shk"))
    val cand = prefix.select(col("id").as("id_a"), col("sz").as("sz_a"),
        col("shk"))
      .join(prefix.select(col("id").as("id_b"), col("sz").as("sz_b"),
        col("shk")), Seq("shk"))
      .filter(col("id_a") < col("id_b"))
      // length filter: J ≥ t forces min(sz)·100 ≥ t%·max(sz)
      .filter(least(col("sz_a"), col("sz_b")) * 100 >=
        greatest(col("sz_a"), col("sz_b")) * thresholdPct)
      .select(col("id_a"), col("id_b"), col("sz_a"), col("sz_b"))
      .distinct()
    val inter = cand
      .join(post.select(col("id").as("id_a"), col("shk")), Seq("id_a"))
      .join(post.select(col("id").as("id_b"), col("shk")),
        Seq("id_b", "shk"))
      .groupBy(col("id_a"), col("id_b"), col("sz_a"), col("sz_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .filter(col("inter") * 100 >=
        (col("sz_a") + col("sz_b") - col("inter")) * thresholdPct)
      .select(col("id_a"), col("id_b"),
        round(col("inter").cast("double") /
          (col("sz_a") + col("sz_b") - col("inter")), 6).as("jaccard"))
  }

  /** Shared candidate stage for [[jaccardPairs]] / [[containmentPairs]]:
    * (id_a, id_b, sz_a, sz_b, inter) over shared-shingle candidates only
    * — see the scale/hot-shingle notes on [[jaccardPairs]].
    */
  private def coPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      blockCols: Seq[String],
      n: Int,
      maxDocFreq: Int): DataFrame = {
    require(maxDocFreq > 1, s"maxDocFreq must exceed 1, got $maxDocFreq")
    val base = graft.prep.Preprocessing.spread(df)
      .select(col(idCol) +: wordShingles(col(textCol), n).as("shingles") +:
        blockCols.map(col): _*)
      .filter(size(col("shingles")) > 0)
    // join key = 64-bit hash of (blockCols, shingle): an 8-byte fixed key
    // shuffles far cheaper than the string itself. (Collision risk merges
    // two shingles with p ~ |vocab|^2 / 2^64 — negligible.)
    val keyExpr = xxhash64(concat_ws("", blockCols.map(col) :+ col("sh"): _*))
    val allPostings = base.select(
        col(idCol) +: explode(col("shingles")).as("sh") +:
          blockCols.map(col): _*)
      .withColumn("shk", keyExpr)
      .select(col(idCol), col("shk"))
    // hot set = keys over the cap (tiny by definition); the df-aggregate
    // and the anti-join shuffle on the same shk key as the self-join below,
    // so the exchange is reused rather than re-shingling the corpus
    val hotKeys = allPostings.groupBy(col("shk"))
      .agg(count(lit(1)).as("df_cnt"))
      .filter(col("df_cnt") > maxDocFreq)
      .select(col("shk"))
    val kept = allPostings.join(hotKeys, Seq("shk"), "left_anti")
    // sizes over the RETAINED universe keep |A∩B| / |A∪B| internally
    // consistent after the cap (docs whose shingles were all hot drop out).
    // Shape notes from measurement (sf0.1): groupBy+join beats a
    // window-by-id for the size attach (2.4 s vs 5.9 s warm — WindowExec's
    // per-partition sort costs more than the extra hash aggregate), and df
    // counting must stay a groupBy regardless — a window keyed on the
    // SHINGLE would funnel a corpus-hot shingle into a single task.
    //
    // r21 (§2.3 shuffle fewer bytes): sizes attach AFTER the pair
    // aggregate, not before. The old shape joined (id, sz) onto every
    // POSTING row, so sz rode the self-join exchange (~20% of its bytes)
    // and sz_a/sz_b sat in the pair groupBy key — hashed per candidate
    // row of the df²-bounded join fan-out. Post-aggregate, sizes join at
    // PAIR scale (distinct co-occurring pairs, orders of magnitude fewer
    // rows than candidates), and the doc-cardinality sizes frame rides a
    // planner-chosen broadcast. Same integers, same output columns.
    val sizes = kept.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
    kept.as("a").join(kept.as("b"),
        col("a.shk") === col("b.shk") && col(s"a.$idCol") < col(s"b.$idCol"))
      .groupBy(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.select(col(idCol).as("id_a"), col("sz").as("sz_a")),
        Seq("id_a"))
      .join(sizes.select(col(idCol).as("id_b"), col("sz").as("sz_b")),
        Seq("id_b"))
      .select(col("id_a"), col("id_b"), col("sz_a"), col("sz_b"),
        col("inter"))
  }

  // 2^31 - 1 (Mersenne). Hash values are masked to 31 bits so that
  // a * h + b < 2^62 — no long overflow under ANSI arithmetic.
  private val minhashPrime = 2147483647L

  /** Seeded (a, b) coefficient pairs for the k MinHash functions. */
  def minhashCoefficients(numHashes: Int, seed: Long): Seq[(Long, Long)] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(numHashes)((math.abs(rng.nextLong()) % (minhashPrime - 1) + 1,
      math.abs(rng.nextLong()) % minhashPrime))
  }

  /** 64-bit string hash for signature kernels (two 32-bit murmur passes).
    * JVM-side and allocation-free — the signature loops run inside UDFs
    * because Catalyst higher-order functions evaluate interpreted per
    * element (no codegen), which measured ~10x slower at sf0.1.
    */
  @inline private def hash64(s: String): Long = {
    import scala.util.hashing.MurmurHash3
    (MurmurHash3.stringHash(s, 0x9747b28c).toLong << 32) |
      (MurmurHash3.stringHash(s, 0x85ebca6b).toLong & 0xffffffffL)
  }

  /** MinHash signature as an array<long> column: element i is
    * min over shingles of ((a_i * h(shingle) + b_i) mod p), computed by a
    * primitive-loop UDF (k × |shingles| multiply-mods per row, no shuffle).
    */
  def minhashSignature(shingles: Column, coeffs: Seq[(Long, Long)]): Column = {
    val as = coeffs.map(_._1).toArray
    val bs = coeffs.map(_._2).toArray
    val p = minhashPrime
    val sigUdf = udf((sh: Seq[String]) => {
      val k = as.length
      val sig = Array.fill(k)(Long.MaxValue)
      sh.foreach { s =>
        val h = hash64(s) & 0x7FFFFFFFL
        var i = 0
        while (i < k) {
          val v = (as(i) * h + bs(i)) % p
          if (v < sig(i)) sig(i) = v
          i += 1
        }
      }
      sig
    })
    sigUdf(shingles)
  }

  /** FNV-style fold of each band's signature slice into one 64-bit band
    * key — shared by the inline pair-discovery paths and the persistent
    * [[LshIndex]] postings (bit-identical band keys across build, append,
    * and probe are what make the index appendable against frozen
    * parameters).
    */
  private[dedup] def bandHashUdf(bands: Int, r: Int) =
    udf((sig: Seq[Long]) =>
      (0 until bands).map { bi =>
        var h = 1125899906842597L
        var i = bi * r
        while (i < (bi + 1) * r) { h = h * 31 + sig(i); i += 1 }
        h
      })

  /** MinHash + LSH near-duplicate pairs:
    * shingle -> k-hash signature -> band buckets -> bucket equi-join for
    * candidates -> similarity estimated FROM the signatures (fraction of
    * matching components — the unbiased MinHash estimator of Jaccard).
    * After the signatures are built the shingle sets are never touched
    * again: every shuffle moves only ids + fixed-width signature arrays.
    * Candidate volume is controlled by (bands, rowsPerBand); exact-verify
    * variants should feed [[jaccardPairs]] with the candidate set instead.
    */
  def minhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 2,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.5,
      seed: Long = 42L): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val coeffs = minhashCoefficients(numHashes, seed)

    val sigs = graft.prep.Preprocessing.spread(df)
      .select(col(idCol),
        wordShingles(col(textCol), shingleN).as("shingles"))
      .filter(size(col("shingles")) > 0)
      .withColumn("sig", minhashSignature(col("shingles"), coeffs))

    val bandUdf = udf((sig: Seq[Long]) =>
      (0 until bands).map { bi =>
        var h = 1125899906842597L // FNV-ish running fold over the band slice
        var i = bi * r
        while (i < (bi + 1) * r) { h = h * 31 + sig(i); i += 1 }
        h
      })
    val banded = sigs.select(col(idCol), col("shingles"),
      posexplode(bandUdf(col("sig"))).as(Seq("band_idx", "band_hash")))

    // candidate discovery on NARROW rows (ids + band key only — dragging
    // the shingle arrays through the join/distinct shuffles dominated cost)
    val left = banded.select(col("band_idx"), col("band_hash"),
      col(idCol).as("id_a"))
    val right = banded.select(col("band_idx"), col("band_hash"),
      col(idCol).as("id_b"))
    val candidates = left.join(right, Seq("band_idx", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct() // a pair colliding in m bands estimates once, not m times

    // estimate J from matching signature components (ids + longs only)
    val matchFrac = udf((a: Seq[Long], b: Seq[Long]) => {
      var m = 0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { if (a(i) == b(i)) m += 1; i += 1 }
      if (n == 0) 0.0 else m.toDouble / n
    })
    val sigOnly = sigs.select(col(idCol), col("sig"))
    candidates
      .join(sigOnly.select(col(idCol).as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(sigOnly.select(col(idCol).as("id_b"), col("sig").as("sig_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        round(matchFrac(col("sig_a"), col("sig_b")), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Exact-verified MinHash+LSH pairs: band buckets produce the candidate
    * set (same narrow-row discovery as [[minhashPairs]]), then each
    * candidate pair is verified with the EXACT Jaccard of the true shingle
    * sets — so the output is precise (no estimator noise) while the
    * all-pairs explosion is still avoided. The shingle arrays are only
    * joined back for the candidate pairs (near-linear volume), never
    * shuffled through the bucket join.
    */
  def minhashPairsExact(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 2,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.5,
      seed: Long = 42L): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val coeffs = minhashCoefficients(numHashes, seed)

    val base = graft.prep.Preprocessing.spread(df)
      .select(col(idCol), wordShingles(col(textCol), shingleN).as("shingles"))
      .filter(size(col("shingles")) > 0)
    val sigs = base.withColumn("sig", minhashSignature(col("shingles"), coeffs))

    val bandUdf = udf((sig: Seq[Long]) =>
      (0 until bands).map { bi =>
        var h = 1125899906842597L
        var i = bi * r
        while (i < (bi + 1) * r) { h = h * 31 + sig(i); i += 1 }
        h
      })
    val banded = sigs.select(col(idCol),
      posexplode(bandUdf(col("sig"))).as(Seq("band_idx", "band_hash")))
    val left = banded.select(col("band_idx"), col("band_hash"), col(idCol).as("id_a"))
    val right = banded.select(col("band_idx"), col("band_hash"), col(idCol).as("id_b"))
    val candidates = left.join(right, Seq("band_idx", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()

    val shOnly = base.select(col(idCol), col("shingles"))
    candidates
      .join(shOnly.select(col(idCol).as("id_a"), col("shingles").as("sh_a")), "id_a")
      .join(shOnly.select(col(idCol).as("id_b"), col("shingles").as("sh_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        round(jaccardUdf(col("sh_a"), col("sh_b")), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** MD5-derived 64-bit token hash (first 8 digest bytes, big-endian) —
    * slower than [[hash64]] but reproducible in any engine with md5()
    * (DuckDB: hex-nibble arithmetic over substr(md5(t))), which makes the
    * whole SimHash pipeline externally verifiable. The digest instance is
    * thread-local: this runs per token per row, and
    * MessageDigest.getInstance in that loop is an allocation + provider
    * lookup per call (MessageDigest.reset() via digest() makes reuse safe).
    */
  private val md5Local =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  @inline private def md5Hash64(t: String): Long = {
    val d = md5Local.get()
      .digest(t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h
  }

  /** 64-bit SimHash of the token stream as a pure expression:
    * bit k of the hash is the sign of sum over tokens of
    * (bit k of hash(token) ? +1 : -1). `tokenHasher` picks the per-token
    * hash: "murmur" (fast, default) or "md5" (engine-portable — use when
    * the result must be reproducible outside the JVM).
    */
  def simhash64(text: Column, tokenHasher: String = "murmur"): Column = {
    val useMd5 = tokenHasher match {
      case "murmur" => false
      case "md5" => true
      case other => throw new IllegalArgumentException(s"unknown hasher $other")
    }
    val shUdf = udf((toks: Seq[String]) => {
      val counts = new Array[Int](64)
      toks.foreach { t =>
        val h = if (useMd5) md5Hash64(t) else hash64(t)
        var k = 0
        while (k < 64) {
          if (((h >>> k) & 1L) == 1L) counts(k) += 1 else counts(k) -= 1
          k += 1
        }
      }
      var out = 0L
      var k = 0
      while (k < 64) { if (counts(k) >= 0) out |= (1L << k); k += 1 }
      out
    })
    shUdf(TextFunctions.lowerTokens(text))
  }

  /** Hamming distance between two 64-bit hashes (bit_count of xor). */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-duplicate pairs: block on `maxHamming + 1` equal-width
    * slices of the hash — by pigeonhole, a pair within Hamming distance
    * `maxHamming` must agree on at least one slice — then verify
    * Hamming <= maxHamming exactly.
    */
  def simhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3,
      tokenHasher: String = "murmur"): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 32,
      s"maxHamming must be in [0, 32) for 64-bit block recall, got $maxHamming")
    val nBlocks = maxHamming + 1
    val width = (64 + nBlocks - 1) / nBlocks // ceil; high slice may be shorter
    val mask = if (width >= 64) -1L else (1L << width) - 1L
    val hashed = graft.prep.Preprocessing.spread(df)
      .select(col(idCol), simhash64(col(textCol), tokenHasher).as("sh"))
    val banded = hashed.select(col(idCol), col("sh"),
      posexplode(array((0 until nBlocks).map(q =>
        shiftright(col("sh"), q * width).bitwiseAND(lit(mask))): _*))
        .as(Seq("q_idx", "q_val")))
    val left = banded.select(col("q_idx"), col("q_val"),
      col(idCol).as("id_a"), col("sh").as("sh_a"))
    val right = banded.select(col("q_idx"), col("q_val"),
      col(idCol).as("id_b"), col("sh").as("sh_b"))
    left.join(right, Seq("q_idx", "q_val"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        hamming64(col("sh_a"), col("sh_b")).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Connected components over a near-duplicate pair graph — the clustering
    * step of a production dedup pipeline: pair detectors (jaccard/minhash/
    * simhash/cosine) name DUPLICATION between two docs; components name the
    * KEEP/DROP decision (keep the min id per cluster, transitively —
    * A≈B≈C collapses to one survivor even when A and C were never compared).
    *
    * Hash-min label propagation: label(v) starts as min(v, neighbors);
    * each round every vertex adopts the minimum label in its neighborhood;
    * fixpoint = component-min everywhere. Converges in O(component
    * diameter) rounds — near-dup clusters are dups of a common source, so
    * real diameters are tiny (2-4) and convergence exits early, so the
    * generous `maxRounds` default costs nothing in the common case while
    * bounding the pathological chain (the sf0.1 corpus already shows a
    * diameter-17 chain at threshold 0.1, 18 rounds — the default holds 2.5x
    * headroom over the worst graph seen); exhausting it without convergence
    * throws (strict default) rather than returning a wrong labeling.
    * (Measured, not assumed: a pointer-jumping variant — adopt the label's
    * label each round — cut rounds 18 → 11 on the sf0.1 diameter-17 chain
    * but RAISED wall 6.3 → 8.0 s: the extra vertex-set self-join per round
    * outweighs the saved rounds, so plain propagation stays for the
    * distributed path.)
    *
    * TWO-TIER (round 16): the loop is scheduler-latency-bound — rounds ×
    * per-job fixed cost, ~0.2 s/round on a graph of a few THOUSAND edges —
    * because a post-blocking pair graph is orders of magnitude smaller
    * than its corpus (sf0.1: 5,000 docs → 2,990 pairs; a df-capped /
    * prefix-filtered detector keeps that ratio at any corpus size). So a
    * graph whose EDGE COUNT (already counted for partition sizing) fits
    * `driverEdgeCap` is solved exactly on the driver — one collect of
    * (long, long) pairs, union-find with path compression, one small
    * labels frame back — microseconds of CPU replacing diameter × job
    * latency. Larger graphs take the distributed loop unchanged: the cap
    * (250k pairs ≈ 4 MB of raw longs, ~25 MB as the collected boxed
    * Tuple2 rows plus transients — sized for DEFAULT driver heaps, not
    * this box's 16g) bounds driver memory the same way the
    * repo's other driver collects are k-/dim-/query-bounded, and the
    * labeling is identical either way (component minimum; spec-pinned
    * equal on both paths).
    *
    * Scale shape (distributed path): every round is one equi-join + one
    * min-aggregate on narrow (long, long) rows; the vertex set is only
    * docs with >= 1 candidate pair (orders of magnitude below corpus size
    * at production thresholds); localCheckpoint per round cuts the
    * iterative lineage so round N's plan does not replay rounds 1..N-1.
    */
  /** The DECLARATIVE shape of one [[connectedComponents]] propagation
    * round over the full pair-detection subtree, with no checkpoint, no
    * count, no action — the plan the catalog lint screens. The runtime
    * loop's per-round plan is exactly this round applied to checkpointed
    * inputs (same joins, same aggregates); only the stage-boundary
    * materializations differ, and those affect replay cost, never join
    * strategy. Output schema matches the runtime result so downstream
    * consumers (q_dedup_keep's anti-join) lint against the real thing.
    */
  private[graft] def componentsRoundPlan(
      pairs: DataFrame,
      aCol: String,
      bCol: String): DataFrame = {
    val p0 = pairs
      .select(col(aCol).cast("long").as("pa"), col(bCol).cast("long").as("pb"))
    val edges = p0.select(col("pa").as("src"), col("pb").as("dst"))
      .union(p0.select(col("pb").as("src"), col("pa").as("dst")))
    val labels = edges.groupBy(col("src"))
      .agg(min(col("dst")).as("mn"))
      .select(col("src").as("v"), least(col("src"), col("mn")).as("label"))
    val prop = edges.join(labels, col("dst") === col("v"))
      .groupBy(col("src").as("pv"))
      .agg(min(col("label")).as("nbr_min"))
    labels.join(prop, col("v") === col("pv"))
      .select(col("v").as("member_id"),
        least(col("label"), col("nbr_min")).as("cluster_id"))
  }

  def connectedComponents(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      maxRounds: Int = 48,
      strict: Boolean = true,
      driverEdgeCap: Long = 250000L): DataFrame =
    connectedComponentsStats(pairs, aCol, bCol, maxRounds, strict,
      driverEdgeCap)._1

  /** [[connectedComponents]] plus the run's shape: (labels, rounds to
    * convergence, pair count). Rounds ≈ max component diameter — the
    * O(diameter) cost driver of the hash-min loop, which is why
    * [[graft.FixtureStats]] pins it per fixture generation (it passes
    * driverEdgeCap = 0 to force the loop, since the driver shortcut runs
    * zero rounds): a testdata regen that grows the pair graph's diameter
    * is a WORKLOAD change and must be visible as one, not read as an
    * engine regression (round-15 verdict, "flat-box uptick").
    */
  def connectedComponentsStats(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      maxRounds: Int = 48,
      strict: Boolean = true,
      driverEdgeCap: Long = 250000L): (DataFrame, Int, Long) = {
    // materialize the (possibly expensive) pair plan ONCE before the
    // symmetrizing union — both union branches would otherwise re-execute
    // the full upstream pair detection
    val p0 = pairs
      .select(col(aCol).cast("long").as("pa"), col(bCol).cast("long").as("pb"))
      .localCheckpoint(true)
    // run the iteration at GRAPH-proportional parallelism, not corpus
    // parallelism: post-blocking pair graphs are orders of magnitude
    // smaller than their corpus, and per-round task overhead × rounds
    // dominates when thousands of rows ride the corpus partition count.
    // ~100k edges per partition, capped at the cluster's parallelism.
    val nEdges = 2 * p0.count()
    if (driverEdgeCap > 0 && nEdges / 2 <= driverEdgeCap) {
      val out = driverComponents(p0)
      freeCheckpoint(p0)
      return (out, 0, nEdges / 2)
    }
    val parts = math.max(1, math.min(
      p0.sparkSession.sparkContext.defaultParallelism,
      (nEdges / 100000L).toInt + 1))
    val edges = p0.select(col("pa").as("src"), col("pb").as("dst"))
      .union(p0.select(col("pb").as("src"), col("pa").as("dst")))
      .repartition(parts)
      .localCheckpoint(true) // reused every round
    freeCheckpoint(p0) // edges hold the data now
    var labels = edges.groupBy(col("src"))
      .agg(min(col("dst")).as("mn"))
      .select(col("src").as("v"), least(col("src"), col("mn")).as("label"))
      .localCheckpoint(true)
    var prevCp = labels
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      // smallest label in each vertex's neighborhood (via its in-edges:
      // symmetric graph, so in == out)
      val prop = edges.join(labels, col("dst") === col("v"))
        .groupBy(col("src").as("pv"))
        .agg(min(col("label")).as("nbr_min"))
      // symmetrized edges give every vertex an out-edge -> inner join total.
      // LAZY checkpoint: the convergence aggregate below is the action that
      // materializes it — one job per round instead of an eager-checkpoint
      // job plus the count (the loop is scheduler-latency-bound: rounds ×
      // per-job fixed cost dominates on any graph that fits the cap)
      val updated = labels.join(prop, col("v") === col("pv"))
        .select(col("v"), least(col("label"), col("nbr_min")).as("label"),
          (col("nbr_min") < col("label")).cast("long").as("chg"))
        .localCheckpoint(false)
      val changed = updated.agg(coalesce(sum(col("chg")), lit(0L))).head().getLong(0)
      // each round's checkpoint supersedes the previous one; without the
      // explicit free, every round (and every call in a long session)
      // leaves a vertex-set copy in the block manager until GC notices —
      // measured 2x slowdown across a 93-query bench session
      freeCheckpoint(prevCp)
      prevCp = updated
      labels = updated.select(col("v"), col("label"))
      converged = changed == 0
      round += 1
    }
    freeCheckpoint(edges)
    org.slf4j.LoggerFactory.getLogger(getClass)
      .info(s"connectedComponents: ${nEdges / 2} pairs, $parts partitions, " +
        s"converged=$converged after $round rounds")
    // a capped, non-converged labeling is NOT component minima — silently
    // returning it would let duplicates survive a keep/drop decision with
    // no signal. strict (default) refuses; non-strict callers get a loud
    // warning and the best-effort labels.
    if (!converged) {
      val msg = s"connectedComponents did not converge within $maxRounds " +
        "rounds: a component's diameter exceeds the cap and labels are NOT " +
        "component minima. Raise maxRounds (rounds needed = max component " +
        "diameter) or pass strict = false for best-effort labels."
      if (strict) throw new IllegalStateException(msg)
      else org.slf4j.LoggerFactory.getLogger(getClass).warn(msg)
    }
    // the final round's checkpoint backs the returned frame and stays
    // cached (one narrow vertex-set copy) until the caller is done with it
    // — loops over many graphs should releasePlan(result) after consuming
    (labels.select(col("v").as("member_id"), col("label").as("cluster_id")),
      round, nEdges / 2)
  }

  /** Quality-aware survivorship over near-dup clusters: keep the BEST
    * member of each cluster under (score desc, id asc) — the production
    * keep rule when duplicates differ in quality (the cleaner, longer
    * fetch of an article should survive over a truncated earlier crawl;
    * the min-id rule behind q_dedup_keep is right only when members are
    * interchangeable). Docs with no pair keep themselves. The selection
    * is ONE aggregate: max over struct(score, −id, id) per cluster — the
    * [[graft.ops.Survivorship]] golden-record shape applied to dedup —
    * so the decision never shuffles more than (clusters × 1) rows after
    * the join. Returns one `keep_id` row per surviving doc.
    */
  def keepBest(docs: DataFrame, idCol: String, score: Column,
      clusters: DataFrame): DataFrame = {
    val scored = docs.select(col(idCol).cast("long").as("__id"),
      score.as("__score"))
    val best = clusters
      .join(scored, col("member_id") === col("__id"))
      .groupBy(col("cluster_id"))
      .agg(max(struct(col("__score"), (-col("__id")).as("__negid"),
        col("__id"))).as("b"))
      .select(col("b.__id").as("keep_id"))
    val unpaired = scored
      .join(clusters, col("__id") === col("member_id"), "left_anti")
      .select(col("__id").as("keep_id"))
    best.unionByName(unpaired)
  }

  /** Exact components for a driver-sized pair graph: one collect, classic
    * union-find (union by size, path compression — O(E α(V))), labels =
    * component MINIMUM id, identical to the distributed loop's fixpoint.
    */
  private def driverComponents(p0: DataFrame): DataFrame = {
    val spark = p0.sparkSession
    import spark.implicits._
    val es = p0.select(col("pa"), col("pb")).as[(Long, Long)].collect()
    val idx = scala.collection.mutable.LongMap.empty[Int]
    def id(x: Long): Int = idx.getOrElseUpdate(x, idx.size)
    es.foreach { case (a, b) => id(a); id(b); () }
    val n = idx.size
    val parent = Array.tabulate(n)(identity)
    val size = Array.fill(n)(1)
    def find(x0: Int): Int = {
      var x = x0
      while (parent(x) != x) { parent(x) = parent(parent(x)); x = parent(x) }
      x
    }
    es.foreach { case (a, b) =>
      val ra = find(idx(a)); val rb = find(idx(b))
      if (ra != rb) {
        if (size(ra) >= size(rb)) { parent(rb) = ra; size(ra) += size(rb) }
        else { parent(ra) = rb; size(rb) += size(ra) }
      }
    }
    // component label = MIN vertex id in the set (the distributed loop's
    // fixpoint), not the union-find root (which is order-dependent)
    val minOfRoot = new Array[Long](n)
    java.util.Arrays.fill(minOfRoot, Long.MaxValue)
    val vids = new Array[Long](n)
    idx.foreach { case (vid, i) =>
      vids(i) = vid
      val r = find(i)
      if (vid < minOfRoot(r)) minOfRoot(r) = vid
    }
    val rows = (0 until n).map(i => (vids(i), minOfRoot(find(i))))
    spark.createDataset(rows).toDF("member_id", "cluster_id")
  }

  /** Bloom-filter benchmark-decontamination probe: build ONE Bloom filter
    * over the eval set's distinct word n-grams on the driver (the eval set
    * is benchmark-sized — thousands of documents — so this is a small
    * aggregation), broadcast it, and flag each training document whose
    * gram array hits the filter.
    *
    * Scale contrast with the exact semi-join (q_contamination): the
    * semi-join shuffles the ENTIRE train corpus's exploded grams on the
    * gram key — at 100 TB that shuffle dominates the job. The bloom probe
    * never shuffles the train side at all: it is a pure projection over
    * the scan (gram array → boolean), so decontamination rides along with
    * any other pass over the corpus. The price is one-sided error: no
    * false negatives ever (a contaminated doc ALWAYS flags), but false
    * positives at ~1−(1−fpp)^grams_per_doc. Production two-phase: bloom
    * prefilter, then the exact join on the (tiny) flagged survivor set.
    *
    * Returns (idCol, bloom_hit: boolean), one row per train document.
    */
  def bloomContaminationFlags(
      train: DataFrame,
      bench: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 5,
      fpp: Double = 1e-4,
      expectedGrams: Long = 1L << 20,
      prebuilt: Option[org.apache.spark.util.sketch.BloomFilter] = None): DataFrame = {
    val benchGrams = bench
      .select(explode(wordShingles(col(textCol), n)).as("g")).distinct()
    // driver-side action: one pass over the (small) bench gram set. The
    // sketch merges per-partition, so building distributes; only the final
    // ~kB..MB bit array lands on the driver. `prebuilt` (lint only)
    // injects a filter so the probe PLAN constructs without this action —
    // bloom contents never change plan shape.
    val bloom = prebuilt.getOrElse(
      benchGrams.stat.bloomFilter("g", expectedGrams, fpp))
    val bc = train.sparkSession.sparkContext.broadcast(bloom)
    val hit = udf((gs: Seq[String]) =>
      gs != null && gs.exists(g => bc.value.mightContainString(g)))
    train.select(col(idCol), hit(wordShingles(col(textCol), n)).as("bloom_hit"))
  }

  /** Corpus version diff — the data-versioning step between two corpus
    * builds: classify every document id as added (absent before), removed
    * (absent now), changed (canonical fingerprint differs), or unchanged.
    * Production pipelines diff corpus versions to bound re-processing
    * (re-embed/re-dedup only added+changed) and to audit what a filter
    * change actually did.
    *
    * Scale shape: one fingerprint projection per side (the same canonical
    * md5 as [[exactGroups]] — whitespace/case-insensitive), then a single
    * full-outer equi-join on the id. Nothing quadratic, no skew (ids are
    * unique), each side scanned once.
    */
  def corpusDiff(
      oldDf: DataFrame,
      newDf: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    // presence is tested on an explicit marker, NOT on fingerprint
    // nullness: a NULL text fingerprints to NULL, which would misread a
    // present-but-null row as an absent one (a null-text doc in v1 only
    // would classify "added" instead of "removed"). The eqNullSafe compare
    // then treats two NULL texts as unchanged.
    def fp(df: DataFrame, name: String, here: String) = df.select(col(idCol),
      graft.text.TextFunctions.fingerprint(col(textCol)).as(name),
      lit(true).as(here))
    fp(oldDf, "__fp_old", "__in_old")
      .join(fp(newDf, "__fp_new", "__in_new"), Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__in_old").isNull, lit("added"))
          .when(col("__in_new").isNull, lit("removed"))
          .when(!(col("__fp_old") <=> col("__fp_new")), lit("changed"))
          .otherwise(lit("unchanged")).as("change_type"))
  }

  /** Exact substring (duplicated-span) dedup — Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better": excise
    * every ≥`minLen`-token span that also appears verbatim in ANOTHER
    * document, keeping the copy in the lowest doc id. Document-level dedup
    * (exact/MinHash/SimHash/SemDeDup) misses exactly this: boilerplate
    * paragraphs, license headers, and quoted passages embedded in
    * otherwise-unique documents.
    *
    * Variant notes vs the paper: their single-string suffix array treats
    * the corpus as one byte stream and excises every occurrence; a suffix
    * array does not shard, so the distributed shape is gram-anchored —
    * every `minLen`-token window keyed by md5, duplicated keys become
    * seeds, covered positions are excised. We (a) scope duplication
    * CROSS-document (within-doc repetition is priced by the repetition
    * scorer instead), and (b) keep the lowest-doc-id occurrence so one
    * copy of the content survives the corpus. Both choices are
    * deterministic and replayed verbatim by the DuckDB oracle.
    *
    * Scale shape (nothing quadratic at any step): the window relation is
    * one row per token position — ~`n_tokens` rows keyed by a 32-char md5,
    * NOT by the span text, so shuffle width is constant per row. Seeds
    * come from ONE two-phase hash aggregate on that key (count-distinct
    * docs + min doc — partial aggs absorb hot boilerplate keys; a span in
    * a million docs is still one seed row and a linear fan-back, never a
    * pair join). Coverage is seeds⋈windows on the key (equi-join, each
    * window matches at most one seed row), exploded to at most
    * `minLen × dup_windows` (doc, pos) rows and distinct'd — overlapping
    * spans merge here for free. The rebuild is a left-anti join on
    * (doc, pos) plus one groupBy(doc) — both partition on the doc id.
    * Window construction costs O(minLen) bytes per position (the slice
    * feeding md5); that is the classic space-time trade the MapReduce
    * formulation makes vs the paper's suffix array.
    *
    * Output: (doc_id, n_tokens, n_removed, clean_text) — one row per input
    * document. Documents whose every token was excised (or whose text is
    * NULL/empty) still get a row with clean_text = '' via the id spine:
    * a groupBy over kept tokens alone would silently drop them (the
    * meanPool vanishing-group lesson).
    *
    * Text canonicalization: spans MATCH case-insensitively (the
    * [[wordShingles]] doctrine) but the rebuilt text keeps the original
    * casing; positions align because both token streams split on the same
    * `\s+`. Inter-token whitespace is normalized to single spaces by the
    * rebuild.
    */
  def substringDedup(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minLen: Int): DataFrame = {
    require(minLen >= 2, s"minLen must be >= 2, got $minLen")
    val L = minLen
    val base = docs.select(col(idCol),
        filter(split(coalesce(col(textCol), lit("")), "\\s+"),
          t => t =!= "").as("__raw"))
      .withColumn("__low", transform(col("__raw"), t => lower(t)))
      .withColumn("__n", size(col("__raw")))
    // one row per L-token window: (doc, pos, md5-of-span). sequence() is
    // only generated for docs long enough to hold a window (sequence(0, x)
    // with x < 0 would count DOWN and fabricate negative positions)
    val windows = base.filter(col("__n") >= L)
      .select(col(idCol), explode(transform(
        sequence(lit(0), col("__n") - L),
        i => struct(i.as("pos"),
          md5(concat_ws(" ", slice(col("__low"), i + 1, lit(L))))
            .as("k")))).as("w"))
      .select(col(idCol), col("w.pos").as("pos"), col("w.k").as("k"))
    val seeds = windows.groupBy(col("k"))
      .agg(countDistinct(col(idCol)).as("__nd"), min(col(idCol)).as("__canon"))
      .filter(col("__nd") >= 2)
      .select(col("k"), col("__canon"))
    val covered = windows.join(seeds, "k")
      .filter(col(idCol) =!= col("__canon"))
      .select(col(idCol), explode(sequence(col("pos"), col("pos") + L - 1))
        .as("__p"))
      .distinct()
    val toks = base.select(col(idCol), posexplode(col("__raw")))
      .toDF(idCol, "__p", "__tok")
    val rebuilt = toks.join(covered, Seq(idCol, "__p"), "left_anti")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("__kept"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("__p"), col("__tok")))),
          s => s.getField("__tok"))).as("__clean"))
    base.select(col(idCol), col("__n"))
      .join(rebuilt, Seq(idCol), "left_outer")
      .select(col(idCol),
        col("__n").cast("long").as("n_tokens"),
        (col("__n") - coalesce(col("__kept"), lit(0L))).cast("long")
          .as("n_removed"),
        coalesce(col("__clean"), lit("")).as("clean_text"))
  }

  /** Edit-distance-verified near-dup pairs — the "verify candidates with
    * an exact string metric" stage real curation pipelines bolt onto any
    * blocking scheme: docs block on an exact normalized PREFIX (equi
    * join, never all-pairs — a pair of OCR/crawl variants of one page
    * almost always agrees on its opening characters), then each
    * candidate pair verifies with Levenshtein over a bounded prefix
    * (`comparePrefix` caps the O(len²) DP per pair; full-text edit
    * distance at document length is neither needed nor affordable).
    * Normalization strips to printable ASCII so the metric counts the
    * same units in any engine (codepoint-vs-byte ambiguity dies at the
    * door). Output (id_a < id_b, dist) — dedup policy is the caller's.
    */
  def editDistancePairs(docs: DataFrame, idCol: String, textCol: String,
      blockPrefix: Int = 16, comparePrefix: Int = 64,
      maxDist: Int = 8): DataFrame = {
    require(blockPrefix > 0 && comparePrefix >= blockPrefix,
      s"need 0 < blockPrefix <= comparePrefix: $blockPrefix/$comparePrefix")
    val norm = regexp_replace(lower(col(textCol)), "[^\\x20-\\x7e]", "")
    val t = docs.select(col(idCol).as("id"), norm.as("_t"))
      .select(col("id"),
        substring(col("_t"), 1, blockPrefix).as("blk"),
        substring(col("_t"), 1, comparePrefix).as("cmp"))
    val a = t.select(col("blk"), col("id").as("id_a"), col("cmp").as("cmp_a"))
    val b = t.select(col("blk"), col("id").as("id_b"), col("cmp").as("cmp_b"))
    a.join(b, Seq("blk"))
      .filter(col("id_a") < col("id_b"))
      // banded DP: O(maxDist * len) per pair instead of O(len^2), with
      // early exit — returns -1 past the threshold, which the filter
      // drops; the kept distances are identical to the unbanded metric
      .withColumn("dist", levenshtein(col("cmp_a"), col("cmp_b"), maxDist))
      .filter(col("dist") >= 0 && col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist").cast("long").as("dist"))
  }

  /** Drop the cached blocks behind a `localCheckpoint(true)`d frame — e.g.
    * a consumed [[connectedComponents]] result — without waiting for the
    * GC-driven ContextCleaner.
    */
  def releasePlan(df: DataFrame): Unit = freeCheckpoint(df)

  /** Drop the cached blocks behind a `localCheckpoint(true)`d frame once a
    * successor checkpoint has materialized (the ContextCleaner only frees
    * them on GC, far too late for an iterative loop).
    */
  private def freeCheckpoint(df: DataFrame): Unit =
    df.queryExecution.logical.collectFirst {
      case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd
    }.foreach(_.unpersist(blocking = false))
}
