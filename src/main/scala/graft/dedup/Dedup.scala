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

  /** Distinct word n-gram shingles of the lowercased token stream. */
  def wordShingles(text: Column, n: Int): Column = {
    val toks = TextFunctions.lowerTokens(text)
    val grams = transform(sequence(lit(0), size(toks) - n),
      i => concat_ws(" ", slice(toks, i + 1, lit(n))))
    array_distinct(when(size(toks) >= n, grams).otherwise(array()))
  }

  /** Jaccard similarity of two pre-distinct shingle arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = (size(a) + size(b)).cast("double") - inter
    when(union > 0, inter / union).otherwise(lit(0.0))
  }

  /** N-gram Jaccard near-duplicate pairs within blocking groups:
    * pairs (id_a < id_b) sharing all `blockCols`, with Jaccard >= threshold.
    * Blocking bounds the self-join fan-out; for unblocked discovery at scale
    * use [[minhashPairs]] instead.
    */
  def jaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      blockCols: Seq[String],
      n: Int,
      threshold: Double): DataFrame = {
    val base = df.select(
      col(idCol) +: wordShingles(col(textCol), n).as("shingles") +:
        blockCols.map(col): _*)
    val a = base.columns.foldLeft(base)((acc, c) =>
      acc.withColumnRenamed(c, if (blockCols.contains(c)) c else s"${c}_a"))
    val b = base.columns.foldLeft(base)((acc, c) =>
      acc.withColumnRenamed(c, if (blockCols.contains(c)) c else s"${c}_b"))
    a.join(b, blockCols)
      .filter(col(s"${idCol}_a") < col(s"${idCol}_b"))
      .select(col(s"${idCol}_a").as("id_a"), col(s"${idCol}_b").as("id_b"),
        round(jaccard(col("shingles_a"), col("shingles_b")), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
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

  /** MinHash signature as an array<long> column: element i is
    * min over shingles of ((a_i * xxhash64(shingle) + b_i) mod p).
    * Pure Catalyst expressions — evaluated per row with no shuffle.
    */
  def minhashSignature(shingles: Column, coeffs: Seq[(Long, Long)]): Column =
    array(coeffs.map { case (a, b) =>
      array_min(transform(shingles,
        s => pmod(lit(a) * xxhash64(s).bitwiseAND(lit(0x7FFFFFFFL)) + lit(b),
          lit(minhashPrime))))
    }: _*)

  /** MinHash + LSH near-duplicate pairs:
    * shingle -> k-hash signature -> band buckets -> bucket equi-join for
    * candidates -> exact Jaccard verification >= threshold.
    * The only shuffles are the band-bucket join and the final verify join;
    * candidate volume is controlled by (bands, rowsPerBand).
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

    val sigs = df.select(col(idCol),
        wordShingles(col(textCol), shingleN).as("shingles"))
      .filter(size(col("shingles")) > 0)
      .withColumn("sig", minhashSignature(col("shingles"), coeffs))

    val banded = sigs.select(col(idCol), col("shingles"),
      posexplode(array((0 until bands).map(bi =>
        xxhash64(concat_ws(",", slice(col("sig"), bi * r + 1, r)), lit(bi))): _*))
        .as(Seq("band_idx", "band_hash")))

    val left = banded.select(col("band_idx"), col("band_hash"),
      col(idCol).as("id_a"), col("shingles").as("shingles_a"))
    val right = banded.select(col("band_idx"), col("band_hash"),
      col(idCol).as("id_b"), col("shingles").as("shingles_b"))

    left.join(right, Seq("band_idx", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(jaccard(col("shingles_a"), col("shingles_b")), 6).as("jaccard"))
      .distinct()
      .filter(col("jaccard") >= threshold)
  }

  /** 64-bit SimHash of the token stream as a pure expression:
    * bit k of the hash is the sign of sum over tokens of
    * (bit k of xxhash64(token) ? +1 : -1).
    */
  def simhash64(text: Column): Column = {
    val toks = TextFunctions.lowerTokens(text)
    // Single pass over tokens: fold a 64-counter array, +1/-1 per bit of
    // each token hash (getbit takes a Column position — stays codegen'd).
    val counts = aggregate(toks, array_repeat(lit(0L), 64),
      (acc, t) => zip_with(acc,
        transform(sequence(lit(0), lit(63)),
          k => getbit(xxhash64(t), k).cast("long") * 2L - 1L),
        (a, d) => a + d))
    val bits = transform(counts, c => when(c >= 0, lit(1L)).otherwise(lit(0L)))
    val powers = array((0 until 64).map(k => lit(1L << k)): _*)
    aggregate(zip_with(bits, powers, (b, p) => b * p), lit(0L), (a, x) => a + x)
  }

  /** Hamming distance between two 64-bit hashes (bit_count of xor). */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-duplicate pairs: block on 16-bit quarters of the hash
    * (a pair within Hamming distance 3 must agree on at least one quarter),
    * then verify Hamming <= maxHamming.
    */
  def simhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val hashed = df.select(col(idCol), simhash64(col(textCol)).as("sh"))
    val banded = hashed.select(col(idCol), col("sh"),
      posexplode(array((0 until 4).map(q =>
        shiftright(col("sh"), q * 16).bitwiseAND(lit(65535L))): _*))
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
}
