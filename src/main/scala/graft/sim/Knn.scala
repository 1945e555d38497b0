package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import Vectors._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k with the (small) query set broadcast —
  * one pass over the candidate corpus, no shuffle of the big side, window
  * top-k per query. Scale path: sign-random-projection LSH buckets shrink
  * the candidate set per query to one bucket (plus multiprobe neighbors),
  * turning the scan into an equi-join — the IVF-style layout you want when
  * the corpus is billions of vectors.
  */
// Serializable: ivfTopK's cell-assignment UDFs call the object-level
// `unit` helper, so the executor-side closure captures this object.
object Knn extends Serializable {

  /** Rows whose norm is not finite are dropped at prep time — the norm is
    * already computed once per row, so the check is free (see
    * [[Vectors.finiteNorm]] for why the guard exists).
    */
  private def finiteNorm(normCol: String) = Vectors.finiteNorm(col(normCol))

  /** Brute-force cosine top-k. `queries`/`candidates`: (idCol, vecCol).
    * Output: (query_id, neighbor_id, rank, cosine_sim). Self-pairs excluded.
    */
  def bruteForceTopK(
      queries: DataFrame,
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
      toDoubleArray(col(vecCol)).as("qv"))
      .withColumn("qn", norm(col("qv")))
      .filter(finiteNorm("qn"))
    val c = graft.prep.Preprocessing.spread(candidates)
      .select(col(idCol).as("neighbor_id"),
        toDoubleArray(col(vecCol)).as("cv"))
      .withColumn("cn", norm(col("cv")))
      .filter(finiteNorm("cn"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosineFromNorms(col("qv"), col("cv"), col("qn"), col("cn")).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("sim"), asc("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("sim"), 6).as("cosine_sim"))
  }

  /** Hard-negative mining for contrastive / metric training: for each
    * query, the k nearest candidates by cosine whose label DIFFERS from
    * the query's — the negatives that actually move an embedding model
    * (random negatives are trivially far; same-label near neighbors are
    * positives, not negatives). Exactly [[bruteForceTopK]]'s
    * broadcast-queries / scan-candidates-in-place shape with the label
    * inequality fused into the join predicate, so mismatched pairs are
    * dropped BEFORE the dot product, not after ranking — k negatives per
    * query survive no matter how label-skewed the neighborhood is. For
    * the 100 TB path compose with [[ivfTopK]]'s cell probing (mine
    * within probed cells); the per-cell scoring shape is identical.
    */
  def hardNegatives(
      queries: DataFrame,
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String,
      k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
      toDoubleArray(col(vecCol)).as("qv"),
      col(labelCol).as("query_label"))
      .withColumn("qn", norm(col("qv")))
      .filter(finiteNorm("qn"))
    val c = graft.prep.Preprocessing.spread(candidates)
      .select(col(idCol).as("neighbor_id"),
        toDoubleArray(col(vecCol)).as("cv"),
        col(labelCol).as("neighbor_label"))
      .withColumn("cn", norm(col("cv")))
      .filter(finiteNorm("cn"))
    val scored = c.join(broadcast(q),
        col("query_id") =!= col("neighbor_id") &&
          col("query_label") =!= col("neighbor_label"))
      .select(col("query_id"), col("query_label"),
        col("neighbor_id"), col("neighbor_label"),
        cosineFromNorms(col("qv"), col("cv"), col("qn"), col("cn")).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("sim"), asc("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("sim"), 6).as("cosine_sim"),
        col("query_label"), col("neighbor_label"))
  }

  /** Seeded random hyperplanes for sign-random-projection LSH. */
  def randomHyperplanes(numPlanes: Int, dim: Int, seed: Long): Seq[Seq[Double]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(numPlanes)(Seq.fill(dim)(rng.nextGaussian()))
  }

  /** SRP-LSH bucket id: one bit per hyperplane (sign of the projection). */
  def srpBucket(vec: org.apache.spark.sql.Column, planes: Seq[Seq[Double]]) = {
    val bits = planes.map { p =>
      val plane = typedlit(p)
      when(dot(vec, plane) >= 0, lit(1L)).otherwise(lit(0L))
    }
    bits.reduceLeft((acc, b) => acc * 2 + b)
  }

  /** LSH-bucketed ANN top-k: queries only compare against candidates in the
    * same SRP bucket. With `numPlanes` bits the corpus splits into
    * 2^numPlanes buckets, so per-query work drops by that factor at some
    * recall cost.
    *
    * `multiprobe` = number of extra bit-flips probed per query: 1 probes
    * the query's own bucket plus every 1-bit-neighbor bucket (numPlanes+1
    * buckets total) — near-boundary vectors land one sign flip away, so
    * 1-bit probing recovers most of the recall a single bucket loses while
    * still touching only (numPlanes+1)/2^numPlanes of the corpus.
    */
  def lshTopK(
      queries: DataFrame,
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      numPlanes: Int = 4,
      seed: Long = 42L,
      multiprobe: Int = 1): DataFrame = {
    require(multiprobe >= 0 && multiprobe <= 2, "multiprobe of 0..2 bits supported")
    val dim = probeDim(candidates, vecCol)
    val planes = randomHyperplanes(numPlanes, dim, seed)
    val probes: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      home => {
        val flips1 = (0 until numPlanes).map(i => home.bitwiseXOR(lit(1L << i)))
        val flips2 = for {
          i <- 0 until numPlanes; j <- (i + 1) until numPlanes
        } yield home.bitwiseXOR(lit((1L << i) | (1L << j)))
        multiprobe match {
          case 0 => array(home)
          case 1 => array(home +: flips1: _*)
          case _ => array((home +: flips1) ++ flips2: _*)
        }
      }
    val q = queries.select(col(idCol).as("query_id"),
        toDoubleArray(col(vecCol)).as("qv"))
      .withColumn("qn", norm(col("qv")))
      .filter(finiteNorm("qn"))
      .withColumn("bucket", explode(probes(srpBucket(col("qv"), planes))))
    val c = candidates.select(col(idCol).as("neighbor_id"),
        toDoubleArray(col(vecCol)).as("cv"))
      .withColumn("cn", norm(col("cv")))
      .filter(finiteNorm("cn"))
      .withColumn("bucket", srpBucket(col("cv"), planes))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosineFromNorms(col("qv"), col("cv"), col("qn"), col("cn")).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("sim"), asc("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("sim"), 6).as("cosine_sim"))
  }

  /** IVF (inverted-file) ANN: a coarse k-means quantizer learned on a
    * driver-side sample partitions the corpus into `nlist` cells; each
    * query probes its `nprobe` nearest cells only. The classic
    * billion-vector layout: the corpus shuffles ONCE by cell id, and
    * per-query work drops by ~nlist/nprobe. Centroids are tiny and
    * broadcast; training is Lloyd's algorithm on a bounded sample (driver
    * CPU, not a Spark job — the sample is small by construction).
    */
  def kmeansCentroids(
      samples: Array[Array[Double]],
      k: Int,
      iters: Int,
      seed: Long): Array[Array[Double]] = {
    require(samples.nonEmpty && k > 0)
    val rng = new scala.util.Random(seed)
    // a hostile corpus can hand us RAGGED sample lengths (schema says
    // array<float>, nothing enforces a uniform dim). Fold the common
    // prefix, exactly like the search kernels (see cellDistances /
    // DtwExpression): dim is the longest sample, shorter vectors
    // contribute their prefix only — no AIOOBE, deterministic
    val dim = samples.map(_.length).max
    // r21 (VERDICT r20 item 1): ORDER-INVARIANT init. The old init
    // (rng.shuffle over positions) made the centroids a function of the
    // sample's ARRIVAL ORDER, so any upstream repartition (spread(),
    // AQE, a different file split) moved every centroid — the q_knn_wide
    // r20 oracle break. Canonicalizing the sample (lexicographic sort)
    // and seeding with k-means++ (D²-weighted, seeded rng over the
    // canonical order) makes training a pure function of the sample
    // MULTISET; the spread-out init also clears the ANN recall bars
    // with margin instead of depending on a lucky shuffle.
    val canon = {
      import scala.math.Ordering.Implicits._
      samples.sortBy(_.toSeq)
    }
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { val x = a(i) - b(i); d += x * x; i += 1 }
      d
    }
    val kk = math.min(k, canon.length)
    // greedy k-means++ (the scikit-learn default): per step draw
    // 2+log2(k) D²-weighted candidates and keep the one that lowers
    // total inertia most — markedly better cells than single-draw ++
    // for the same seeded determinism (init cost ~L extra distance
    // passes, amortized against `iters` Lloyd passes)
    val nTrials = 2 + (math.log(math.max(2, kk)) / math.log(2)).toInt
    val centers = scala.collection.mutable.ArrayBuffer[Array[Double]]()
    centers += canon(rng.nextInt(canon.length)).clone
    val minD = canon.map(v => d2(v, centers(0)))
    while (centers.length < kk) {
      val total = minD.sum
      var bestCand: Array[Double] = null
      var bestPot = Double.MaxValue
      var t = 0
      while (t < nTrials) {
        val cand =
          if (total <= 0) canon(rng.nextInt(canon.length))
          else {
            var r = rng.nextDouble() * total
            var i = 0
            while (i < canon.length - 1 && r > minD(i)) { r -= minD(i); i += 1 }
            canon(i)
          }
        var pot = 0.0
        var i = 0
        while (i < canon.length) {
          val d = d2(canon(i), cand)
          pot += math.min(d, minD(i))
          i += 1
        }
        if (pot < bestPot) { bestPot = pot; bestCand = cand }
        t += 1
      }
      centers += bestCand.clone
      var i = 0
      while (i < canon.length) {
        val d = d2(canon(i), bestCand)
        if (d < minD(i)) minD(i) = d
        i += 1
      }
    }
    var centroids: Array[Array[Double]] = centers.toArray
    var it = 0
    while (it < iters) {
      val sums = Array.fill(centroids.length)(new Array[Double](dim))
      val counts = new Array[Int](centroids.length)
      samples.foreach { v =>
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < centroids.length) {
          val cv = centroids(c)
          var d = 0.0; var i = 0
          val n = math.min(v.length, cv.length)
          while (i < n) { val x = v(i) - cv(i); d += x * x; i += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        counts(best) += 1
        var i = 0
        val n = math.min(v.length, dim)
        while (i < n) { sums(best)(i) += v(i); i += 1 }
      }
      centroids = centroids.indices.map { c =>
        if (counts(c) == 0) centroids(c)
        else sums(c).map(_ / counts(c))
      }.toArray
      it += 1
    }
    centroids
  }

  private[sim] def unit(v: Array[Double]): Array[Double] = {
    var n = 0.0; var i = 0
    while (i < v.length) { n += v(i) * v(i); i += 1 }
    val s = math.sqrt(n)
    if (s == 0) v else v.map(_ / s)
  }

  /** Offline quantizer training — deterministic corpus sample → spherical
    * Lloyd's — shared by [[ivfTopK]] and the SemDeDup centroid recipe
    * (GenSemanticCentroids freezes its output as literals).
    *
    * Sampling: rank by a seeded random key and take the global lowest
    * `sampleSize` (TakeOrdered — per-partition top-k then driver merge, no
    * shuffle, no full count). A bare limit().collect() would train the
    * centroids on the first file's distribution only. Non-finite vectors
    * are excluded — one NaN sample row would poison every centroid update
    * it touches.
    *
    * Spherical: unit-normalize before Lloyd's so cell geometry agrees with
    * the cosine metric the search ranks by — raw-L2 cells cut across
    * cosine neighborhoods and wreck recall.
    *
    * Degrade-don't-throw: a corpus with ZERO finite-norm vectors (every
    * embedding poisoned) yields an empty sample; this returns an EMPTY
    * centroid array instead of tripping kmeansCentroids' require — callers
    * degrade (empty search result, salt-only split) rather than letting
    * one fully-hostile input kill a corpus-wide job.
    */
  def trainSphericalKmeans(
      df: DataFrame,
      vecCol: String,
      k: Int,
      sampleSize: Int,
      iters: Int,
      seed: Long): Array[Array[Double]] = {
    // misconfiguration fails loudly — ONLY the genuinely-empty finite
    // sample (fully-poisoned corpus) takes the degrade path below
    require(k > 0, s"k must be > 0, got $k")
    require(sampleSize > 0, s"sampleSize must be > 0, got $sampleSize")
    // finite AND strictly positive norm: a zero-norm vector (all zeros, or
    // zero-length) has no direction, so it cannot vote for a SPHERICAL
    // centroid — unit() would pass it through un-normalized and dilute
    // whichever cell it lands in
    //
    // Partition-INVARIANT sample (r21, VERDICT r20 item 1): rank by a
    // seeded hash of the vector VALUE instead of rand(seed). Spark's
    // rand(seed) is per-partition seeded, so any upstream repartition
    // (spread(), AQE, a different file split) redraws the sample and
    // moves every centroid — the q_knn_wide r20 oracle break. The hash
    // depends only on row values: same corpus, same sample, under any
    // partitioning (the Mixing.drawU doctrine, applied to values since
    // this frame carries no id). Ties are value-identical duplicates
    // (harmless to Lloyd's); a second salted hash orders cross-value
    // collisions deterministically. orderBy+limit plans as
    // TakeOrderedAndProject (per-partition top-k, no global sort).
    val sample = df.select(toDoubleArray(col(vecCol)).as("v"))
      .withColumn("_n", norm(col("v")))
      .filter(finiteNorm("_n") && col("_n") > 0)
      .withColumn("_r", xxhash64(lit(seed), col("v")))
      .withColumn("_r2", xxhash64(lit(seed + 1), col("v")))
      .orderBy(col("_r"), col("_r2")).limit(sampleSize)
      .select(col("v")).collect().map(_.getSeq[Double](0).toArray)
    if (sample.isEmpty) Array.empty
    else kmeansCentroids(sample.map(unit), k, iters, seed)
  }

  /** IVF top-k: assign candidates to their nearest centroid cell, probe the
    * `nprobe` nearest cells per query, score within the probed cells only.
    */
  def ivfTopK(
      queries: DataFrame,
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nlist: Int = 16,
      nprobe: Int = 2,
      sampleSize: Int = 2000,
      seed: Long = 42L,
      quantized: Boolean = false,
      dim: Option[Int] = None): DataFrame = {
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe (0 would " +
      "silently return no neighbors for every query)")
    require(!quantized || dim.nonEmpty,
      "quantized IVF needs the embedding dim for the int8 codes")
    val spark = candidates.sparkSession
    val centroids = trainSphericalKmeans(candidates, vecCol, nlist,
      sampleSize, iters = 10, seed = seed)
    if (centroids.isEmpty) {
      // zero finite-norm candidate vectors: the finiteNorm guard below
      // would drop every candidate row anyway, so degrade to an empty
      // result with the output schema instead of crashing in training.
      // neighbor_id comes from CANDIDATES (as in the normal path) so the
      // degraded schema cannot diverge if the two frames' id types differ
      return queries.select(col(idCol).as("query_id"))
        .crossJoin(candidates.select(col(idCol).as("neighbor_id")))
        .select(col("query_id"), col("neighbor_id"),
          lit(0L).as("rank"), lit(0.0).as("cosine_sim")).limit(0)
    }
    val bc = spark.sparkContext.broadcast(centroids)
    val (cellOf, probeCells) = cellUdfs(bc, nprobe)

    // `quantized` = the FAISS IVF+SQ8 stack: candidates ride as int8
    // codes (4x scan cut) and both cell assignment and scoring run on the
    // dequantized reconstruction — exactly what a code-only store can
    // compute at search time. Float path otherwise.
    val base = graft.prep.Preprocessing.spread(candidates)
    val cVec =
      if (!quantized)
        base.select(col(idCol).as("neighbor_id"),
          toDoubleArray(col(vecCol)).as("cv"))
      else {
        val d = dim.get
        val prep = VectorQuant.prepare(base, idCol, vecCol, d)
        val stats = VectorQuant.statsOf(prep, d)
        prep.crossJoin(broadcast(stats))
          .select(col(idCol).as("neighbor_id"),
            VectorQuant.dequantize(
              VectorQuant.codeArray(col("__v"), col("__mn"), col("__mx")),
              col("__mn"), col("__mx")).as("cv"))
      }
    val c = cVec
      .withColumn("cn", norm(col("cv")))
      .filter(finiteNorm("cn"))
      .withColumn("cell", cellOf(col("cv")))
    val q = queries
      .select(col(idCol).as("query_id"), toDoubleArray(col(vecCol)).as("qv"))
      .withColumn("qn", norm(col("qv")))
      .filter(finiteNorm("qn"))
      .withColumn("cell", explode(probeCells(col("qv"))))
    val scored = c.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosineFromNorms(col("qv"), col("cv"), col("qn"), col("cn")).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("sim"), asc("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("sim"), 6).as("cosine_sim"))
  }

  /** Product-quantization codebooks: the corpus sample is unit-normalized
    * (cosine geometry, as [[trainSphericalKmeans]]) and split into `m`
    * contiguous subspaces of dim/m dims; each subspace trains its own
    * `ksub`-centroid plain-L2 k-means over the sample's subvectors
    * ([[kmeansCentroids]], seed offset per subspace). Result is
    * [m][ksub][dim/m]. Same bounded-sample driver boundary and same
    * degrade contract as the spherical trainer: a corpus with zero
    * finite-positive-norm vectors returns an EMPTY array.
    */
  def trainPqCodebooks(
      df: DataFrame,
      vecCol: String,
      dim: Int,
      m: Int,
      ksub: Int,
      sampleSize: Int,
      iters: Int,
      seed: Long): Array[Array[Array[Double]]] = {
    require(m > 0 && dim % m == 0,
      s"dim $dim must split evenly into m=$m subspaces")
    require(ksub > 0, s"ksub must be > 0, got $ksub")
    require(sampleSize > 0, s"sampleSize must be > 0, got $sampleSize")
    val dsub = dim / m
    // same partition-invariant value-hash draw as trainSphericalKmeans
    // (rand(seed) is per-partition seeded — see the comment there)
    val sample = df.select(toDoubleArray(col(vecCol)).as("v"))
      .filter(size(col("v")) === dim)
      .withColumn("_n", norm(col("v")))
      .filter(finiteNorm("_n") && col("_n") > 0)
      .withColumn("_r", xxhash64(lit(seed), col("v")))
      .withColumn("_r2", xxhash64(lit(seed + 1), col("v")))
      .orderBy(col("_r"), col("_r2")).limit(sampleSize)
      .select(col("v")).collect().map(r => unit(r.getSeq[Double](0).toArray))
    if (sample.isEmpty) Array.empty
    else Array.tabulate(m) { s =>
      val subs = sample.map(v => java.util.Arrays.copyOfRange(v, s * dsub, (s + 1) * dsub))
      kmeansCentroids(subs, ksub, iters, seed + s)
    }
  }

  /** PQ-ADC cosine top-k with exact refine — the FAISS
    * IndexPQ+refine shape, the 100 TB tier above SQ8: candidates ride as
    * `m` sub-centroid codes (16 bytes/vector at m=16 vs 64 int8 bytes vs
    * 256 float bytes — a 16× scan cut), the asymmetric first pass ranks
    * the float query against code RECONSTRUCTIONS, and only the
    * per-query `shortlist` survivors fetch their float vectors (one
    * equi-join by id) for exact cosine re-ranking. The refine step is
    * what makes PQ honest on corpora with thin similarity margins:
    * reconstruction error reorders neighbors within the shortlist, and
    * the exact pass restores them — recall is pinned in-plan by
    * q_knn_pq's invariant vs the float brute twin. `shortlist` is a
    * constant (not corpus-proportional), so the refine join touches
    * O(queries × shortlist) float rows no matter how big the corpus.
    *
    * Candidates are unit-normalized before encoding (codebooks live on
    * the unit sphere), so the first-pass cosine uses the reconstruction's
    * own norm; queries stay raw floats both passes.
    *
    * Degrades like [[ivfTopK]]: a fully-poisoned corpus (no trainable
    * sample) returns an empty frame with the normal output schema.
    */
  def pqTopK(
      queries: DataFrame,
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      dim: Int,
      m: Int = 16,
      ksub: Int = 64,
      shortlist: Int = 100,
      sampleSize: Int = 2000,
      seed: Long = 42L): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist must be >= k $k")
    val spark = candidates.sparkSession
    val books = trainPqCodebooks(candidates, vecCol, dim, m, ksub,
      sampleSize, iters = 10, seed = seed)
    if (books.isEmpty) {
      return queries.select(col(idCol).as("query_id"))
        .crossJoin(candidates.select(col(idCol).as("neighbor_id")))
        .select(col("query_id"), col("neighbor_id"),
          lit(0L).as("rank"), lit(0.0).as("cosine_sim")).limit(0)
    }
    val bc = spark.sparkContext.broadcast(books)
    val dsub = dim / m
    // encode: unit-normalize, per subspace argmin L2 to its codebook
    // (ties to the lower code — deterministic)
    val encode = udf((v: Seq[Double]) => {
      val u = unit(v.toArray)
      val bks = bc.value
      Array.tabulate(m) { s =>
        val cb = bks(s)
        var best = 0; var bestD = Double.MaxValue
        var j = 0
        while (j < cb.length) {
          var d = 0.0; var i = 0
          while (i < dsub) {
            val x = u(s * dsub + i) - cb(j)(i); d += x * x; i += 1
          }
          if (d < bestD) { bestD = d; best = j }
          j += 1
        }
        best
      }
    })
    // asymmetric reconstruction: codes -> concatenated sub-centroids
    val reconstruct = udf((codes: Seq[Int]) => {
      val bks = bc.value
      val out = new Array[Double](dim)
      var s = 0
      while (s < m) {
        System.arraycopy(bks(s)(codes(s)), 0, out, s * dsub, dsub)
        s += 1
      }
      out
    })
    val base = graft.prep.Preprocessing.spread(candidates)
      .select(col(idCol).as("neighbor_id"), toDoubleArray(col(vecCol)).as("fv"))
      .filter(size(col("fv")) === dim)
      .withColumn("fn", norm(col("fv")))
      .filter(finiteNorm("fn") && col("fn") > 0)
    // the code relation — at production scale THIS is what you persist;
    // the float column rides here only because the refine join below
    // reads it back from the same frame
    val coded = base.select(col("neighbor_id"),
      reconstruct(encode(col("fv"))).as("cv"))
      .withColumn("cn", norm(col("cv")))
    val q = queries.select(col(idCol).as("query_id"),
        toDoubleArray(col(vecCol)).as("qv"))
      .withColumn("qn", norm(col("qv")))
      .filter(finiteNorm("qn"))
    val wS = Window.partitionBy(col("query_id"))
      .orderBy(desc("psim"), asc("neighbor_id"))
    val short = coded.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("qv"), col("qn"),
        cosineFromNorms(col("qv"), col("cv"), col("qn"), col("cn")).as("psim"))
      .withColumn("srank", row_number().over(wS))
      .filter(col("srank") <= shortlist)
      .select(col("query_id"), col("neighbor_id"), col("qv"), col("qn"))
    // exact refine: fetch the shortlist's float vectors by id and re-rank
    val wK = Window.partitionBy(col("query_id"))
      .orderBy(desc("sim"), asc("neighbor_id"))
    short.join(base, Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosineFromNorms(col("qv"), col("fv"), col("qn"), col("fn")).as("sim"))
      .withColumn("rank", row_number().over(wK).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("sim"), 6).as("cosine_sim"))
  }

  /** Quantized (asymmetric-distance) cosine top-k: candidates are reduced
    * to int8 codes (VectorQuant — 1 byte/dim instead of 4), queries stay
    * float, and scoring runs against the DEQUANTIZED reconstruction
    * mn_d + q_d·scale_d. This is the op that makes 100 TB ANN affordable:
    * the corpus-side scan shrinks 4×, and per-dim reconstruction error
    * ≤ scale/2 perturbs cosine ranks only marginally (recall vs the float
    * path is pinned by `q_knn_quantized`'s in-plan invariant).
    *
    * Plan shape mirrors [[bruteForceTopK]]: one stats aggregate (a single
    * O(dim)-buffer array aggregate, broadcast back), code projection +
    * dequantized scoring in one pass over the candidate scan, small query
    * set broadcast, window top-k per query. At production scale the code
    * array is what you PERSIST (the quantize step runs once at ingest);
    * here the plan derives it inline from the float column.
    */
  def quantizedTopK(
      queries: DataFrame,
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      dim: Int): DataFrame = {
    val cPrep = VectorQuant.prepare(
      graft.prep.Preprocessing.spread(candidates), idCol, vecCol, dim)
    val stats = VectorQuant.statsOf(cPrep, dim)
    // candidate side: codes only — the float vector is dropped before the
    // scoring join (the 4× scan cut); dequantization is a pure projection
    val c = cPrep.crossJoin(broadcast(stats))
      .select(col(idCol).as("neighbor_id"),
        VectorQuant.dequantize(
          VectorQuant.codeArray(col("__v"), col("__mn"), col("__mx")),
          col("__mn"), col("__mx")).as("cv"))
      .withColumn("cn", norm(col("cv")))
      .filter(finiteNorm("cn"))
    val q = queries.select(col(idCol).as("query_id"),
        toDoubleArray(col(vecCol)).as("qv"))
      .withColumn("qn", norm(col("qv")))
      .filter(finiteNorm("qn"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosineFromNorms(col("qv"), col("cv"), col("qn"), col("cn")).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("sim"), asc("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("sim"), 6).as("cosine_sim"))
  }

  /** Binary (sign) quantization ANN with exact refine — the 32×
    * memory tier below SQ8: each candidate rides as `numBits` sign bits of
    * seeded random projections, packed into ⌈numBits/64⌉ longs (32 bytes at
    * 256 bits vs 256 float bytes for dim 64 — and the cut GROWS with dim,
    * since the code width is dim-independent). The first pass ranks by
    * Hamming distance (XOR + popcount — the cheapest distance a CPU can
    * compute, and the scan is pure longs, no floats touched); only the
    * per-query `shortlist` survivors fetch their float vectors by id for
    * exact cosine re-ranking, exactly [[pqTopK]]'s refine shape.
    *
    * Why it works: for unit vectors, P[sign(r·a) ≠ sign(r·b)] = θ(a,b)/π
    * per Gaussian plane (the SRP collision bound — same math as
    * [[srpBucket]], used here as a DISTANCE instead of a bucket id), so
    * Hamming/numBits is an unbiased angle estimate with std
    * ~sqrt(p(1-p)/numBits); 256 bits resolves angles to a few degrees,
    * and the exact refine restores any order the estimate scrambles
    * inside the shortlist. Recall vs the float brute twin is pinned
    * in-plan by q_knn_binary's invariant.
    *
    * Scale shape: the code relation is NARROW (id, 4 longs) — at
    * production scale THIS is what you persist and scan; the Hamming pass
    * never carries a float vector, the query set broadcasts both passes,
    * and the refine join touches O(queries × shortlist) float rows no
    * matter how big the corpus. `shortlist` is a constant, not
    * corpus-proportional.
    */
  def binaryTopK(
      queries: DataFrame,
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      numBits: Int = 256,
      shortlist: Int = 100,
      seed: Long = 42L): DataFrame = {
    require(numBits > 0, s"numBits must be > 0, got $numBits")
    require(shortlist >= k, s"shortlist $shortlist must be >= k $k")
    val spark = candidates.sparkSession
    // plane width from a global max(size) aggregate (the probeDim
    // doctrine) — the r17 ADVICE hazard was a ragged short or null FIRST
    // row silently truncating every sign code
    val dim = probeDim(candidates, vecCol)
    val planes = randomHyperplanes(numBits, dim, seed)
    val bcPlanes = spark.sparkContext.broadcast(planes.map(_.toArray).toArray)
    val pack = packUdf(bcPlanes, numBits)
    val hamming = hammingUdf
    val base = candPrep(candidates, idCol, vecCol)
    val coded = base.select(col("neighbor_id"), pack(col("fv")).as("cbits"))
    val q = queryPrep(queries, idCol, vecCol)
    val qBits = q.select(col("query_id"), pack(col("qv")).as("qbits"))
    val short = hammingShortlist(
      coded.join(broadcast(qBits), col("query_id") =!= col("neighbor_id"))
        .select(col("query_id"), col("neighbor_id"),
          hamming(col("qbits"), col("cbits")).as("ham")),
      shortlist)
    exactRefine(short, base, q, k)
  }

  /** Embedding width probed as a GLOBAL max(size) aggregate, never a
    * head()-probed first row (r17 ADVICE): a ragged SHORT first row
    * would silently truncate every derived hyperplane — recall degrades
    * with no error — and a null first vector NPEs. max skips nulls; an
    * all-null/empty corpus refuses loudly (there is no ANN question to
    * answer). Cost is one narrow single-column scan, paid once per call
    * before any plane matrix is built. ONE definition for every
    * dim-deriving variant ([[lshTopK]], [[binaryTopK]], [[cosinePairs]]).
    */
  private[sim] def probeDim(df: DataFrame, vecCol: String): Int = {
    val r = df.agg(max(size(col(vecCol)))).head()
    require(!r.isNullAt(0) && r.getInt(0) > 0,
      s"cannot derive embedding dim from '$vecCol': no non-empty vectors")
    r.getInt(0)
  }

  /** Asymmetric-distance binary ANN (r17 verdict task 6) — the SDC→ADC
    * upgrade the PQ path already has, applied to the sign-bit tier: the
    * corpus stays ⌈numBits/64⌉ packed longs (IDENTICAL memory and scan
    * bytes to [[binaryTopK]]), but the QUERY side keeps its floats.
    * Each query precomputes its numBits hyperplane projections once;
    * a candidate then scores Σ_b (2·bit_b − 1)·proj_b — the dot of the
    * float query with the candidate's ±1 sign pattern, i.e.
    * distance-to-code instead of code-to-code. Every bit now carries
    * the query's full projection MAGNITUDE (a plane the query barely
    * clears contributes ~0 instead of a whole Hamming unit), so at the
    * same shortlist recall can only improve — pinned in-plan by
    * q_knn_binary_adc's adc-vs-symmetric invariant and measured in
    * KnnBinarySpec at a starved shortlist.
    *
    * Shortlist ranks score DESC (higher = closer), ties to the lower
    * id; the refine is the ONE shared [[exactRefine]] contract.
    */
  def binaryAdcTopK(
      queries: DataFrame,
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      numBits: Int = 256,
      shortlist: Int = 100,
      seed: Long = 42L): DataFrame = {
    require(numBits > 0, s"numBits must be > 0, got $numBits")
    require(shortlist >= k, s"shortlist $shortlist must be >= k $k")
    val spark = candidates.sparkSession
    val dim = probeDim(candidates, vecCol)
    val bcPlanes = spark.sparkContext.broadcast(
      randomHyperplanes(numBits, dim, seed).map(_.toArray).toArray)
    val pack = packUdf(bcPlanes, numBits)
    val proj = projUdf(bcPlanes)
    val adc = adcUdf(numBits)
    val base = candPrep(candidates, idCol, vecCol)
    val coded = base.select(col("neighbor_id"), pack(col("fv")).as("cbits"))
    val q = queryPrep(queries, idCol, vecCol)
    val qProj = q.select(col("query_id"), proj(col("qv")).as("qproj"))
    val wS = Window.partitionBy(col("query_id"))
      .orderBy(desc("score"), asc("neighbor_id"))
    val short = coded
      .join(broadcast(qProj), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        adc(col("qproj"), col("cbits")).as("score"))
      .withColumn("srank", row_number().over(wS))
      .filter(col("srank") <= shortlist)
      .select(col("query_id"), col("neighbor_id"))
    exactRefine(short, base, q, k)
  }

  /** The query-side hyperplane projections (numBits doubles) — the same
    * per-plane left fold as [[packUdf]] WITHOUT the sign squash; ragged
    * rows fold the common prefix.
    */
  private def projUdf(
      bcPlanes: org.apache.spark.broadcast.Broadcast[Array[Array[Double]]]) =
    udf((v: Seq[Double]) => {
      val arr = v.toArray
      val ps = bcPlanes.value
      val out = new Array[Double](ps.length)
      var b = 0
      while (b < ps.length) {
        val p = ps(b)
        var dot = 0.0; var i = 0
        val n = math.min(p.length, arr.length)
        while (i < n) { dot += p(i) * arr(i); i += 1 }
        out(b) = dot
        b += 1
      }
      out.toSeq
    })

  /** Asymmetric score of a packed sign code against float projections:
    * +proj_b where the bit is set, −proj_b where clear.
    */
  private def adcUdf(numBits: Int) = udf((proj: Seq[Double], bits: Seq[Long]) => {
    var s = 0.0; var b = 0
    val n = math.min(numBits, proj.length)
    while (b < n) {
      val word = bits(b >>> 6)
      s += (if (((word >>> (b & 63)) & 1L) == 1L) proj(b) else -proj(b))
      b += 1
    }
    s
  })

  /** The narrow candidate projection (neighbor_id, fv, fn) every
    * code-then-refine variant scans — one definition, not three.
    */
  private def candPrep(candidates: DataFrame, idCol: String,
      vecCol: String): DataFrame =
    graft.prep.Preprocessing.spread(candidates)
      .select(col(idCol).as("neighbor_id"), toDoubleArray(col(vecCol)).as("fv"))
      .withColumn("fn", norm(col("fv")))
      .filter(finiteNorm("fn"))

  /** The query projection (query_id, qv, qn), norm-guarded. */
  private def queryPrep(queries: DataFrame, idCol: String,
      vecCol: String): DataFrame =
    queries.select(col(idCol).as("query_id"),
        toDoubleArray(col(vecCol)).as("qv"))
      .withColumn("qn", norm(col("qv")))
      .filter(finiteNorm("qn"))

  /** Per-query Hamming top-`shortlist` over (query_id, neighbor_id, ham)
    * — ties to the lower id; shared by [[binaryTopK]] and
    * [[ivfBinaryTopK]].
    */
  private def hammingShortlist(scored: DataFrame, shortlist: Int): DataFrame = {
    val wS = Window.partitionBy(col("query_id"))
      .orderBy(asc("ham"), asc("neighbor_id"))
    scored.withColumn("srank", row_number().over(wS))
      .filter(col("srank") <= shortlist)
      .select(col("query_id"), col("neighbor_id"))
  }

  /** Exact cosine re-rank of a (query_id, neighbor_id) shortlist: floats
    * join back by id — queries broadcast (bounded), candidates equi on
    * neighbor_id (the pqTopK refine shape). ONE definition of the refine
    * contract (tie-break, rounding, output schema) for every binary
    * variant.
    */
  private def exactRefine(short: DataFrame, base: DataFrame, q: DataFrame,
      k: Int): DataFrame = {
    val wK = Window.partitionBy(col("query_id"))
      .orderBy(desc("sim"), asc("neighbor_id"))
    short.join(base, Seq("neighbor_id"))
      .join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosineFromNorms(col("qv"), col("fv"), col("qn"), col("fn")).as("sim"))
      .withColumn("rank", row_number().over(wK).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("sim"), 6).as("cosine_sim"))
  }

  /** Sign-bit packing into ⌈numBits/64⌉ longs; ragged rows fold their
    * common prefix with each plane (the kmeansCentroids doctrine — no
    * AIOOBE, deterministic). >= 0 matches [[srpBucket]] so the two SRP
    * faces agree on the boundary. Shared by [[binaryTopK]] and
    * [[ivfBinaryTopK]].
    */
  private def packUdf(
      bcPlanes: org.apache.spark.broadcast.Broadcast[Array[Array[Double]]],
      numBits: Int) = {
    val nWords = (numBits + 63) / 64
    udf((v: Seq[Double]) => {
      val arr = v.toArray
      val ps = bcPlanes.value
      val out = new Array[Long](nWords)
      var b = 0
      while (b < ps.length) {
        val p = ps(b)
        var dot = 0.0; var i = 0
        val n = math.min(p.length, arr.length)
        while (i < n) { dot += p(i) * arr(i); i += 1 }
        if (dot >= 0) out(b >>> 6) |= (1L << (b & 63))
        b += 1
      }
      out.toSeq
    })
  }

  private def hammingUdf = udf((a: Seq[Long], b: Seq[Long]) => {
    var h = 0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { h += java.lang.Long.bitCount(a(i) ^ b(i)); i += 1 }
    h
  })

  /** Frozen-quantizer cell assignment/probing UDFs — ONE definition
    * shared by [[ivfTopK]] and [[ivfBinaryTopK]] (spherical geometry:
    * unit-normalize, L2 to unit centroids; ragged rows fold the common
    * prefix).
    */
  private def cellUdfs(
      bc: org.apache.spark.broadcast.Broadcast[Array[Array[Double]]],
      nprobe: Int) = {
    def cellDistances(v: Seq[Double]): Array[Double] = {
      val u = unit(v.toArray)
      val cs = bc.value
      val out = new Array[Double](cs.length)
      var c = 0
      while (c < cs.length) {
        var d = 0.0; var i = 0
        while (i < cs(c).length && i < u.length) {
          val x = u(i) - cs(c)(i); d += x * x; i += 1
        }
        out(c) = d
        c += 1
      }
      out
    }
    val cellOf = udf((v: Seq[Double]) => {
      val ds = cellDistances(v)
      var best = 0; var c = 1
      while (c < ds.length) { if (ds(c) < ds(best)) best = c; c += 1 }
      best
    })
    val probeCells = udf((v: Seq[Double]) => {
      val ds = cellDistances(v)
      ds.zipWithIndex.sortBy(_._1).take(nprobe).map(_._2).toSeq
    })
    (cellOf, probeCells)
  }

  /** IVF cells × binary codes × exact refine — the composed
    * billion-scale serving stack: the coarse quantizer bounds per-query
    * work to nprobe/nlist of the corpus (the [[ivfTopK]] layout), the
    * Hamming pass inside the probed cells scans 32-bytes-per-vector sign
    * codes instead of floats (the [[binaryTopK]] tier), and only the
    * constant-size shortlist fetches float vectors by id for exact
    * cosine re-ranking. At production scale the persisted relation is
    * (cell, id, 4 longs) — cell-partitioned code files; the float
    * corpus is touched O(queries × shortlist) rows per batch no matter
    * the corpus size. Same degrade contract as [[ivfTopK]] (empty on a
    * fully-poisoned corpus); recall vs the float brute twin pinned
    * in-plan by q_knn_ivf_binary.
    */
  def ivfBinaryTopK(
      queries: DataFrame,
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nlist: Int = 16,
      nprobe: Int = 2,
      numBits: Int = 256,
      shortlist: Int = 100,
      sampleSize: Int = 2000,
      seed: Long = 42L,
      adc: Boolean = false): DataFrame = {
    require(numBits > 0, s"numBits must be > 0, got $numBits")
    require(shortlist >= k, s"shortlist $shortlist must be >= k $k")
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe (0 would " +
      "silently return no neighbors for every query)")
    val spark = candidates.sparkSession
    val centroids = trainSphericalKmeans(candidates, vecCol, nlist,
      sampleSize, iters = 10, seed = seed)
    if (centroids.isEmpty) {
      return queries.select(col(idCol).as("query_id"))
        .crossJoin(candidates.select(col(idCol).as("neighbor_id")))
        .select(col("query_id"), col("neighbor_id"),
          lit(0L).as("rank"), lit(0.0).as("cosine_sim")).limit(0)
    }
    val bcC = spark.sparkContext.broadcast(centroids)
    val (cellOf, probeCells) = cellUdfs(bcC, nprobe)
    // plane width from the trained centroids (the sample's max length) —
    // no extra corpus job, and robust to a ragged SHORT first row, which
    // a head()-probed dim would let silently truncate every sign code
    val dim = centroids(0).length
    val bcPlanes = spark.sparkContext.broadcast(
      randomHyperplanes(numBits, dim, seed).map(_.toArray).toArray)
    val pack = packUdf(bcPlanes, numBits)
    val hamming = hammingUdf
    val base = candPrep(candidates, idCol, vecCol)
    // the persisted relation at scale: (cell, id, codes) — scanned under
    // the cell equi-join, floats never ride the Hamming pass
    val coded = base.select(col("neighbor_id"),
      cellOf(col("fv")).as("cell"), pack(col("fv")).as("cbits"))
    val q = queryPrep(queries, idCol, vecCol)
    // `adc` upgrades the in-cell ranking to the asymmetric estimator
    // ([[binaryAdcTopK]]): the probe set carries float projections
    // instead of packed bits — same 32-byte corpus codes scanned, same
    // probed cells, strictly more query-side information per bit
    val short =
      if (adc) {
        val proj = projUdf(bcPlanes)
        val qProbe = q.select(col("query_id"), proj(col("qv")).as("qproj"),
          explode(probeCells(col("qv"))).as("cell"))
        val wS = Window.partitionBy(col("query_id"))
          .orderBy(desc("score"), asc("neighbor_id"))
        coded.join(broadcast(qProbe), Seq("cell"))
          .filter(col("query_id") =!= col("neighbor_id"))
          .select(col("query_id"), col("neighbor_id"),
            adcUdf(numBits)(col("qproj"), col("cbits")).as("score"))
          .withColumn("srank", row_number().over(wS))
          .filter(col("srank") <= shortlist)
          .select(col("query_id"), col("neighbor_id"))
      } else {
        val qProbe = q.select(col("query_id"), pack(col("qv")).as("qbits"),
          explode(probeCells(col("qv"))).as("cell"))
        hammingShortlist(
          coded.join(broadcast(qProbe), Seq("cell"))
            .filter(col("query_id") =!= col("neighbor_id"))
            .select(col("query_id"), col("neighbor_id"),
              hamming(col("qbits"), col("cbits")).as("ham")),
          shortlist)
      }
    exactRefine(short, base, q, k)
  }

  /** Embedding-cosine near-duplicate pairs (id_a < id_b, sim >= threshold).
    * Exact within blocking: when `numPlanes` > 0, SRP-LSH blocking with an
    * OR-construction over `numTables` independent hash tables — a pair is a
    * candidate if it collides in ANY table, so pair recall is
    * 1 − (1 − p^numPlanes)^numTables for per-plane agreement p (k=2, L=4
    * gives ~0.87 at cos 0.4 where one 3-plane table gives ~0.25). Else full
    * cross-pairs (test scale only).
    *
    * Scale shape: candidates are discovered on NARROW (table|bucket, id)
    * rows — vectors never ride through the bucket join or the cross-table
    * distinct; payloads join back by id once per surviving pair.
    */
  def cosinePairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      numPlanes: Int = 0,
      numTables: Int = 1,
      seed: Long = 42L,
      expectedDim: Option[Int] = None): DataFrame = {
    require(numTables >= 1, "numTables must be >= 1")
    val base = graft.prep.Preprocessing.spread(df)
      .select(col(idCol), toDoubleArray(col(vecCol)).as("v"))
      .withColumn("nrm", norm(col("v")))
      .filter(finiteNorm("nrm"))
    if (numPlanes > 0) {
      // LSH blocking — the scale path
      val dim = probeDim(df, vecCol)
      // a caller pinning hyperplanes externally (e.g. an oracle that inlines
      // them as literals) MUST fail loudly if the data's dim drifts —
      // silently hashing with different planes would only surface as an
      // opaque downstream mismatch
      expectedDim.foreach { e =>
        require(dim == e,
          s"embedding dim $dim != expected $e: hyperplanes derived for dim " +
            s"$e would silently disagree with runtime blocking")
      }
      val tables = randomHyperplanes(numPlanes * numTables, dim, seed)
        .grouped(numPlanes).toSeq
      // one (table, bucket) row per vector per table; join key packs both
      val tb = explode(array(tables.zipWithIndex.map { case (planes, t) =>
        struct(lit(t).as("t"), srpBucket(col("v"), planes).as("b"))
      }: _*))
      val bucketed = base.select(col(idCol), tb.as("tb"))
      val cand = bucketed.select(col("tb"), col(idCol).as("id_a"))
        .join(bucketed.select(col("tb"), col(idCol).as("id_b")), Seq("tb"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"))
        .distinct() // a pair colliding in several tables scores once
      val pa = base.select(col(idCol).as("id_a"), col("v").as("va"),
        col("nrm").as("na"))
      val pb = base.select(col(idCol).as("id_b"), col("v").as("vb"),
        col("nrm").as("nb"))
      cand.join(pa, "id_a").join(pb, "id_b")
        .select(col("id_a"), col("id_b"),
          round(cosineFromNorms(col("va"), col("vb"), col("na"), col("nb")), 6)
            .as("cosine_sim"))
        .filter(col("cosine_sim") >= threshold)
    } else {
      // Exact all-pairs via B x B block-pair replication: row i joins into
      // buckets (blk_i, *) on one side and (*, blk_i) on the other, so pair
      // (i, j) meets exactly once in bucket (blk_i, blk_j) and the work
      // spreads over B^2 tasks — a constant join key would funnel every
      // pair through ONE task. Replication factor B per side.
      val B = 8
      val blkVals = array((0 until B).map(lit): _*)
      val a = base.select(pmod(col(idCol), lit(B)).as("bx"),
          explode(blkVals).as("by"),
          col(idCol).as("id_a"), col("v").as("va"), col("nrm").as("na"))
        .repartition(col("bx"), col("by"))
      val b = base.select(explode(blkVals).as("bx"),
          pmod(col(idCol), lit(B)).as("by"),
          col(idCol).as("id_b"), col("v").as("vb"), col("nrm").as("nb"))
      a.join(b, Seq("bx", "by"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          round(cosineFromNorms(col("va"), col("vb"), col("na"), col("nb")), 6)
            .as("cosine_sim"))
        .filter(col("cosine_sim") >= threshold)
    }
  }
}
