package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.global.GlobalTrainer
import graft.local.LocalTrainer
import graft.tree.{ModelJson, ProximityTree}

/** Time-series-classification queries — the reference's two training
  * strategies (SURVEY §3.2/§3.4) driven end-to-end over the `embeddings`
  * table (64-point series, 10 classes). The trainer queries emit a
  * completeness-invariant row the DuckDB oracle can reproduce (test/pred
  * counts from the data, prediction-domain sanity as a literal): training
  * itself samples exemplars with partition-seeded rand, so its tree shape
  * is not cross-engine reproducible, but "every test row got exactly one
  * in-domain prediction" is. Full value-level prediction determinism is
  * oracled by q_tsc_predict_fixed (frozen model + frozen data -> literal
  * confusion matrix). Accuracy bands on real-signal data live in ScalaTest
  * (SURVEY §7 hard part (c)) — the synthetic embeddings labels are
  * unlearnable noise, so accuracy invariants would be vacuous here.
  */
object TscQueries {

  private val dim = 64
  private val featureCols: Seq[String] = (0 until dim).map(i => s"_f$i")

  /** embeddings → wide (label, _f0.._f63) frame. */
  private def wide(s: SparkSession, d: String): DataFrame = {
    val cols = Seq(col("vec_id"), col("label").cast("int").as("label")) ++
      (0 until dim).map(i => col("embedding").getItem(i).cast("double").as(s"_f$i"))
    Tables.embeddings(s, d).select(cols: _*)
  }

  private def confusion(pred: DataFrame): DataFrame =
    pred.groupBy(col("label"), col("prediction"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("label"), col("prediction"))

  /** Invariant row for a trainer query: every test row predicted exactly
    * once, all predictions inside the training label domain [0, maxLabel].
    */
  private def predictionInvariants(pred: DataFrame, maxLabel: Int): DataFrame =
    pred.agg(
      count(lit(1)).cast("long").as("n_test"),
      count(col("prediction")).cast("long").as("n_pred"),
      (sum(when(col("prediction") >= 0 && col("prediction") <= maxLabel, 0)
        .otherwise(1)) === 0).cast("long").as("pred_in_domain"))

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    baseQueries ++ scaleQuery ++ fixedQuery ++ mediaQuery

  private val baseQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact top-k DTW trajectory search, LB_Keogh-pruned (DtwSearch.scala):
    // the UCR-suite two-phase shape — envelope broadcast, O(L) lower
    // bound per (row, query), exact banded DTW only on seeds + admitted
    // rows. Exactness is measured in-plan rank-by-rank against the brute
    // DTW twin (the q_knn invariant doctrine): is_match must be 1 on
    // every (query, rank) row, and the oracle pins the full expected
    // (qid × rank) grid from the data.
    "q_dtw_topk" -> ((s, d) =>
      graft.sim.DtwSearch.topKReport(Tables.embeddings(s, d),
        "vec_id", "embedding",
        qid => pmod(qid, lit(250L)) === 7L, k = 5, band = 8)),

    // Local strategy: k per-partition trees -> forest vote
    "q_tsc_local_forest" -> ((s, d) => {
      val all = wide(s, d)
      val train = all.filter(col("vec_id") < 400)
      val test = all.filter(col("vec_id") >= 400 && col("vec_id") < 500)
      val forest = LocalTrainer.trainEnsemble(
        s, train.drop("vec_id"), "label", featureCols,
        numPartitions = 4,
        params = ProximityTree.Params(nSplitters = 3, seed = 42,
          poolNames = Seq("euclidean", "manhattan")),
        deterministicKeyCol = None) // train already deterministic subset
      predictionInvariants(
        LocalTrainer.predict(s, forest, test, featureCols), maxLabel = 9)
    }),

    // Global strategy: one distributed level-synchronous tree
    // (spread the single-file scan so level jobs parallelize on every
    // core the cluster has, not a hardcoded count)
    "q_tsc_global_tree" -> ((s, d) => {
      val all = wide(s, d)
      val train = graft.prep.Preprocessing.spread(all.filter(col("vec_id") < 400))
      val test = all.filter(col("vec_id") >= 400 && col("vec_id") < 500)
      val tree = GlobalTrainer.fit(
        s, train, "label", featureCols,
        ProximityTree.Params(nSplitters = 3, maxDepth = 8, seed = 42,
          poolNames = Seq("euclidean", "manhattan")))
      predictionInvariants(
        LocalTrainer.predictTree(s, tree, test, featureCols), maxLabel = 9)
    })
  )

  /** Scaling proof for the distributed trainer: one level-synchronous tree
    * over the FULL lineitem fact table (numeric features, returnflag as
    * label) — 600k rows at sf0.1, millions at sf1. Depth-capped: the point
    * is per-level cost scaling with rows, not model quality on synthetic
    * labels. The level loop's job count is independent of node count, so
    * wall-clock grows ~linearly with data volume. Test subset is a
    * deterministic modulus filter (SQL-reproducible, unlike df.sample whose
    * output depends on partition layout).
    */
  lazy val scaleQuery: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_tsc_global_scale" -> ((s, d) => {
      // spread: the sf0.1 single-file scan is ~3 partitions, which would
      // run the CPU-heavy level loop on 3 of 32 cores; one narrow-row
      // shuffle up front parallelizes every level job
      val li = graft.prep.Preprocessing.spread(Tables.lineitem(s, d).select(
        when(col("l_returnflag") === "A", 0)
          .when(col("l_returnflag") === "N", 1).otherwise(2).as("label"),
        col("l_quantity").as("_f0"), col("l_extendedprice").as("_f1"),
        col("l_discount").as("_f2"), col("l_tax").as("_f3"),
        col("l_orderkey"), col("l_linenumber")))
      val feats = Seq("_f0", "_f1", "_f2", "_f3")
      val tree = GlobalTrainer.fit(
        s, li, "label", feats,
        ProximityTree.Params(nSplitters = 2, maxDepth = 3,
          minSamplesSplit = 1000, seed = 42, poolNames = Seq("euclidean")))
      val test = li.filter(
        pmod(col("l_orderkey") * 7 + col("l_linenumber"), lit(100)) === 0)
      predictionInvariants(
        LocalTrainer.predictTree(s, tree, test, feats), maxLabel = 2)
    }))

  // ---- frozen-model prediction determinism ------------------------------

  /** Deterministic synthetic series: 3 separable class shapes + seeded
    * per-row Gaussian noise (java.util.Random — stable across JVMs).
    */
  def fixtureSeries(seedBase: Long, n: Int): Seq[(Int, Int, Array[Double])] =
    (0 until n).map { id =>
      val label = id % 3
      val rng = new scala.util.Random(seedBase + id)
      val ts = Array.tabulate(16) { i =>
        val base = label match {
          case 0 => math.sin(i / 3.0)
          case 1 => math.cos(i / 2.0)
          case _ => (i % 4) * 0.5 - 1.0
        }
        // noise high enough that some test rows misclassify: the resulting
        // off-diagonal confusion cells fingerprint the exact frozen tree,
        // not just "a model that separates three classes"
        base + 1.1 * rng.nextGaussian()
      }
      (id, label, ts)
    }

  /** The frozen ProximityTree (trained once by tools — see
    * tools/gen_fixture.md — on fixtureSeries(5000, 300) and committed as a
    * resource), so the driver can hash-check end-to-end prediction
    * determinism against a literal confusion-matrix oracle at any SF.
    */
  lazy val fixtureTree: graft.tree.ProximityTreeModel = {
    val in = getClass.getResourceAsStream("/graft/fixture_tree.json")
    require(in != null, "missing resource /graft/fixture_tree.json")
    val json = scala.io.Source.fromInputStream(in, "UTF-8").mkString
    ModelJson.treeFromJson(json)
  }

  lazy val fixedQuery: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_tsc_predict_fixed" -> ((s, d) => {
      import s.implicits._
      val rows = fixtureSeries(9000L, 200)
        .map { case (id, lbl, ts) => (id, lbl, ts.toSeq) }
      val test = graft.prep.Preprocessing.spread(
        s.createDataFrame(rows).toDF("id", "label", "ts"))
        .select(Seq(col("id"), col("label")) ++
          (0 until 16).map(i => col("ts").getItem(i).as(s"_t$i")): _*)
      confusion(LocalTrainer.predictTree(
        s, fixtureTree, test, (0 until 16).map(i => s"_t$i")))
        .select(col("label").cast("long").as("label"),
          col("prediction").cast("long").as("prediction"), col("cnt"))
    }))

  // Fixture-payload memos: every synthetic payload below is a pure function
  // of id % 256, so a JVM-wide map of <= 256 entries (shared across tasks,
  // one per executor) makes the queries measure DECODE — the operator under
  // test — instead of re-encoding the same 256 fixtures once per row.
  // (id*k % 256 == (id%256)*k % 256 for id >= 0, so features are unchanged.)
  private def memo256(cache: java.util.concurrent.ConcurrentHashMap[java.lang.Long, Array[Byte]],
      id: Long)(build: Long => Array[Byte]): Array[Byte] =
    cache.computeIfAbsent(java.lang.Long.valueOf(id % 256), r => build(r.longValue))

  private val twoBandMemo = new java.util.concurrent.ConcurrentHashMap[java.lang.Long, Array[Byte]]()
  private def fixtureTwoBandPng(id: Long): Array[Byte] = memo256(twoBandMemo, id) { r =>
    graft.multimodal.ImageCodecs.twoBandPng(16, 16,
      ((r % 256).toInt, (r * 7 % 256).toInt, (r * 13 % 256).toInt),
      ((r * 3 % 256).toInt, (r * 5 % 256).toInt, (r * 11 % 256).toInt))
  }

  private val solidMemo = new java.util.concurrent.ConcurrentHashMap[java.lang.Long, Array[Byte]]()
  private def fixtureSolidPng(id: Long): Array[Byte] = memo256(solidMemo, id) { r =>
    graft.multimodal.ImageCodecs.solidPng(16, 16,
      (r % 256).toInt, (r * 7 % 256).toInt, (r * 13 % 256).toInt)
  }

  private val stripeMemo = new java.util.concurrent.ConcurrentHashMap[java.lang.Long, Array[Byte]]()
  private def fixtureStripePng(id: Long): Array[Byte] = memo256(stripeMemo, id) { r =>
    graft.multimodal.ImageCodecs.stripePng(16, 16,
      Seq(1L, 3L, 9L, 27L).map { cj =>
        val m = r * cj
        ((m % 256).toInt, (m * 7 % 256).toInt, (m * 13 % 256).toInt)
      })
  }

  // Near-dup fixture: top half varies with (id/4)%64 (data-dependent
  // stripes, the q_media_phash color scheme), bottom half is a fixed
  // bright/bright/dark/dark palette ROTATED by id%4. Rotation preserves
  // the bottom luma sum, so images sharing a top residue share the exact
  // pooled mean and hence identical top-band hash bytes — they collide on
  // the top bands while adjacent rotations differ in exactly two bottom
  // stripes (Hamming 16, the keep threshold) and opposite rotations in
  // four (Hamming 32, filtered). A plain stripe image can NEVER produce
  // a banded candidate (its hash is one byte repeated — all four bands
  // equal ⇒ distinct hashes never share a band), which is why the
  // near-dup query uses this stacked fixture.
  private val stackedMemo = new java.util.concurrent.ConcurrentHashMap[java.lang.Long, Array[Byte]]()
  private def fixtureStackedPng(id: Long): Array[Byte] = memo256(stackedMemo, id) { k =>
    val r = (k / 4) % 64
    val rot = (k % 4).toInt
    val pal = Seq((200, 200, 200), (200, 200, 200), (10, 10, 10), (10, 10, 10))
    graft.multimodal.ImageCodecs.stackedStripePng(16, 16,
      Seq(1L, 3L, 9L, 27L).map { cj =>
        val m = r * cj
        ((m % 256).toInt, (m * 7 % 256).toInt, (m * 13 % 256).toInt)
      },
      (0 until 4).map(j => pal((j + rot) % 4)))
  }

  private val mpngMemo = new java.util.concurrent.ConcurrentHashMap[java.lang.Long, Array[Byte]]()
  private def fixtureMpng(id: Long): Array[Byte] = memo256(mpngMemo, id) { r =>
    graft.multimodal.VideoCodecs.mpngOf(
      (0 until 6).map(f => graft.multimodal.ImageCodecs.solidPng(8, 8,
        ((r + f * 17) % 256).toInt,
        ((r * 7 + f * 29) % 256).toInt,
        ((r * 13 + f * 41) % 256).toInt)))
  }

  /** Multimodal plumbing driven through the driver gate: documents' text
    * bytes stand in for opaque media payloads (deterministic), exercising
    * the binary-column feature-extraction path end-to-end. The stub codec
    * is integer-exact over bytes and the corpus is ASCII, so DuckDB can
    * rebuild the features from the text column (ascii() per char == byte).
    */
  lazy val mediaQuery: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_media_features" -> ((s, d) => {
      val media = Tables.documents(s, d).select(
        col("doc_id").as("media_id"),
        lit("image").as("kind"),
        encode(col("text"), "UTF-8").as("payload"),
        lit(32).as("width"), lit(32).as("height"),
        lit(null).cast("int").as("sample_rate"),
        lit(null).cast("long").as("duration_ms"))
      graft.multimodal.Multimodal.imageFeatures(s, media, dim = 4)
        .select(col("media_id"),
          round(element_at(col("features"), 1).cast("double"), 4).as("f0"),
          round(element_at(col("features"), 2).cast("double"), 4).as("f1"))
    }),

    // REAL image decode, oracled end to end: per row an executor-side UDF
    // encodes a deterministic two-band 16x16 PNG (colors derived from
    // media_id), javax.imageio decodes it back, and 2x2 grid pooling emits
    // cell lumas. PNG is lossless, so expected features have a closed form
    // DuckDB computes from media_id alone — decode, pixel access, AND
    // pooling geometry are all hash-checked.
    "q_media_decode" -> ((s, d) => {
      val pngUdf = udf((id: Long) => fixtureTwoBandPng(id))
      val media = Tables.documents(s, d).select(
        col("doc_id").as("media_id"),
        lit("image").as("kind"),
        pngUdf(col("doc_id")).as("payload"),
        lit(16).as("width"), lit(16).as("height"),
        lit(null).cast("int").as("sample_rate"),
        lit(null).cast("long").as("duration_ms"))
      graft.multimodal.Multimodal.imageFeatures(s, media, dim = 4, codec = "imageio")
        .select(col("media_id"),
          round(element_at(col("features"), 1).cast("double"), 4).as("f0"),
          round(element_at(col("features"), 2).cast("double"), 4).as("f1"),
          round(element_at(col("features"), 3).cast("double"), 4).as("f2"),
          round(element_at(col("features"), 4).cast("double"), 4).as("f3"))
    }),

    // Perceptual image hashing through the REAL decode path: every row
    // carries a 4-stripe 16x16 PNG (stripe colors derived from media_id),
    // executors decode it and compute the 64-bit aHash (8x8 pooled luma
    // grid, bit = cell above mean). For a 4-stripe image the hash has a
    // closed integer form — bit_j = (4*L_j > sum L) over the Rec.601
    // integer lumas L = 299r+587g+114b — so decode, pooling geometry,
    // thresholding, and the MSB-first bit packing are ALL value-checked
    // by DuckDB from media_id alone (no residue hits the 4L=sumL tie, so
    // the float pooling path and the integer oracle agree exactly).
    "q_media_phash" -> ((s, d) => {
      val pngUdf = udf((id: Long) => fixtureStripePng(id))
      val hashUdf = udf((p: Array[Byte]) =>
        graft.multimodal.ImageCodecs.aHash64(p))
      Tables.documents(s, d).select(
        col("doc_id").as("media_id"),
        hashUdf(pngUdf(col("doc_id"))).as("ahash"))
    }),

    // Image dedup BY perceptual hash — the multimodal twin of
    // q_dedup_exact: group on the 8-byte fingerprint (narrow-row
    // shuffle; pixels never move), min-id keeper per visual equivalence
    // class. The aHash collapses re-encodes and solid-region edits that
    // byte-level hashing can't.
    "q_media_phash_dedup" -> ((s, d) => {
      val pngUdf = udf((id: Long) => fixtureStripePng(id))
      val hashUdf = udf((p: Array[Byte]) =>
        graft.multimodal.ImageCodecs.aHash64(p))
      Tables.documents(s, d)
        .select(col("doc_id").as("media_id"),
          hashUdf(pngUdf(col("doc_id"))).as("ahash"))
        .groupBy(col("ahash"))
        .agg(count(lit(1)).as("n_imgs"), min(col("media_id")).as("keep_id"))
    }),

    // REAL bilinear resize, oracled end to end: a solid 16x16 PNG (color
    // derived from media_id) resizes to 8x8 through Graphics2D + PNG
    // re-encode, then decodes back to its luma. Bilinear resampling of a
    // constant image is that constant, so the resized luma has the same
    // closed form as the source color — resample, re-encode, re-decode,
    // and the metadata update are all hash-checked.
    "q_media_resize" -> ((s, d) => {
      val solidUdf = udf((id: Long) => fixtureSolidPng(id))
      val lumaUdf = udf((p: Array[Byte]) =>
        graft.multimodal.ImageCodecs.imageFeatures(p, 1)(0))
      val media = Tables.documents(s, d).select(
        col("doc_id").as("media_id"),
        lit("image").as("kind"),
        solidUdf(col("doc_id")).as("payload"),
        lit(16).as("width"), lit(16).as("height"),
        lit(null).cast("int").as("sample_rate"),
        lit(null).cast("long").as("duration_ms"))
      graft.multimodal.Multimodal.resizeImages(s, media, toW = 8, toH = 8, codec = "imageio")
        .select(col("media_id"), col("width"), col("height"),
          round(lumaUdf(col("payload")).cast("double"), 4).as("luma"))
    }),

    // REAL JPEG decode: every row carries the frozen in-repo JPEG fixture
    // (committed bytes — JPEG is lossy, so unlike the PNG sibling above the
    // expected lumas have no closed form) and executors decode it through
    // the same javax.imageio path. The oracle is the generator-frozen
    // grid-pooled lumas (JpegFixtureOracle, regenerated by GenJpegFixture).
    // JPEG IDCT output is implementation-defined to ±1 LSB (~0.004 luma)
    // across JDK vendors, so the comparison is a ±0.01 TOLERANCE check
    // (boolean per feature), not an exact decimal match — pooling geometry
    // and decode wiring still can't drift without flipping a flag, but a
    // conforming alternate IDCT doesn't fail the gate.
    //
    // BENCH NOTE — BENCH_r18's drifted stamp (1.301 s vs the 0.412
    // floor) is ADJUDICATED (r19, measured): no code touched this query
    // or multimodal/ in the r18 diff; a fresh-JVM rep profile on
    // identical code reads 5.81/0.83/0.92/1.04/0.69/0.72 s — the
    // imageio decode loop (non-codegen, like the as-of exec) steadies
    // at ~0.7 s (1.7× floor, under both drift tiers: excess 0.29 s
    // < 0.75). Cause named: run-order JIT shift from r18's 11 catalog
    // insertions + a loaded driver box (cal_q_spread_raw 9.2×), not a
    // plan change.
    "q_media_decode_jpeg" -> ((s, d) => {
      val in = getClass.getResourceAsStream("/graft/fixture_image.jpg")
      require(in != null, "missing resource /graft/fixture_image.jpg")
      val jpeg =
        try {
          val bos = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](4096)
          var n = in.read(buf)
          while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
          bos.toByteArray
        } finally in.close()
      val media = Tables.documents(s, d).select(
        col("doc_id").as("media_id"),
        lit("image").as("kind"),
        lit(jpeg).as("payload"),
        lit(32).as("width"), lit(32).as("height"),
        lit(null).cast("int").as("sample_rate"),
        lit(null).cast("long").as("duration_ms"))
      def ok(i: Int, expect: Double) =
        (abs(element_at(col("features"), i).cast("double") - lit(expect))
          <= lit(0.01)).as(s"f${i - 1}_ok")
      graft.multimodal.Multimodal.imageFeatures(s, media, dim = 4, codec = "imageio")
        .select(col("media_id"),
          ok(1, JpegFixtureOracle.f0), ok(2, JpegFixtureOracle.f1),
          ok(3, JpegFixtureOracle.f2), ok(4, JpegFixtureOracle.f3))
    }),

    // REAL audio decode, oracled end to end (the WAV sibling of
    // q_media_decode): an executor UDF encodes a two-band square-wave WAV
    // per row (amplitudes derived from media_id), javax.sound decodes the
    // PCM back, and 4-band windowed energies emerge. Every |sample| is
    // amp/32768 — a power-of-two division, exact in doubles — so DuckDB
    // reproduces the band features bit-for-bit from media_id alone.
    "q_audio_decode" -> ((s, d) => {
      val wavUdf = udf((id: Long) => graft.multimodal.AudioCodecs.twoBandSquareWav(
        4096, (id * 37 % 16384).toInt, (id * 53 % 16384).toInt))
      val media = Tables.documents(s, d).select(
        col("doc_id").as("media_id"),
        lit("audio").as("kind"),
        wavUdf(col("doc_id")).as("payload"),
        lit(null).cast("int").as("width"), lit(null).cast("int").as("height"),
        lit(8000).as("sample_rate"),
        lit(512L).as("duration_ms"))
      graft.multimodal.Multimodal.audioFeatures(s, media, bands = 4, codec = "wav")
        .select(col("media_id"),
          round(element_at(col("features"), 1).cast("double"), 6).as("b0"),
          round(element_at(col("features"), 2).cast("double"), 6).as("b1"),
          round(element_at(col("features"), 3).cast("double"), 6).as("b2"),
          round(element_at(col("features"), 4).cast("double"), 6).as("b3"))
    }),

    // Image NEAR-dup across perceptual-hash classes — the SimHash banding
    // trick on aHashes: the 64-bit hash splits into four 16-bit bands,
    // hash CLASSES (already grouped — ≤ hash-space rows, never images)
    // that agree on ≥1 band become candidates via an equi band join, and
    // exact Hamming ≤ 16 (one stripe's worth of bits) keeps real
    // neighbors. The shift-then-mask band extraction is sign-agnostic,
    // so DuckDB replays it on the signed hash values exactly. The
    // stacked fixture plants REAL survivors (adjacent palette rotations
    // sharing a top half: band collision + Hamming exactly 16) and real
    // rejects (opposite rotations: Hamming 32) — the band join, shift
    // extraction, and keep filter are all value-exercised, not
    // vacuously green on an empty candidate set.
    "q_media_phash_near" -> ((s, d) => {
      val pngUdf = udf((id: Long) => fixtureStackedPng(id))
      val hashUdf = udf((p: Array[Byte]) =>
        graft.multimodal.ImageCodecs.aHash64(p))
      val classes = Tables.documents(s, d)
        .select(col("doc_id").as("media_id"),
          hashUdf(pngUdf(col("doc_id"))).as("ahash"))
        .groupBy(col("ahash"))
        .agg(count(lit(1)).as("n_imgs"), min(col("media_id")).as("keep_id"))
      def banded(tag: String) = classes.select(
        col("ahash").as(s"${tag}_hash"), col("keep_id").as(s"${tag}_keep"),
        explode(array((0 to 3).map(b =>
          struct(lit(b).as("band"),
            shiftright(col("ahash"), b * 16).bitwiseAND(lit(65535L))
              .as("bval"))): _*)).as("bb"))
        .select(col(s"${tag}_hash"), col(s"${tag}_keep"),
          col("bb.band").as("band"), col("bb.bval").as("bval"))
      banded("a").join(banded("b"), Seq("band", "bval"))
        .filter(col("a_hash") < col("b_hash"))
        .select(col("a_hash"), col("b_hash"), col("a_keep"), col("b_keep"))
        .distinct()
        .withColumn("hamming",
          bit_count(col("a_hash").bitwiseXOR(col("b_hash"))).cast("long"))
        .filter(col("hamming") <= 16)
    }),

    // Audio fingerprint dedup through the REAL decode path (the aHash
    // sibling for clips): per row the two-band square WAV decodes, band
    // energies quantize to 256 levels, and the packed fingerprint groups
    // visually — audibly — identical clips. The fixture's |sample| is
    // amp/32768 (a power-of-two division, exact in float), so the
    // quantized bucket has the closed integer form amp // 128 and DuckDB
    // verifies decode, quantization, AND the base-256 packing exactly,
    // plus the min-id-keeper dedup on top.
    "q_audio_fp_dedup" -> ((s, d) => {
      val wavUdf = udf((id: Long) => graft.multimodal.AudioCodecs.twoBandSquareWav(
        4096, (id * 37 % 16384).toInt, (id * 53 % 16384).toInt))
      val fpUdf = udf((p: Array[Byte]) =>
        graft.multimodal.AudioCodecs.audioFingerprint(p))
      Tables.documents(s, d)
        .select(col("doc_id").as("media_id"),
          fpUdf(wavUdf(col("doc_id"))).as("afp"))
        .groupBy(col("afp"))
        .agg(count(lit(1)).as("n_clips"), min(col("media_id")).as("keep_id"))
    }),

    // VIDEO-level dedup by sampled-frame signature — the standard cheap
    // video dedup (sample k frames, hash each, match the signature):
    // every %10==3 doc carries a byte-identical COPY of its predecessor's
    // video, the real demux+decode path runs per row (mpng walk, PNG
    // decode, luma), and the signature is the frame-ordered quantized
    // luma tuple (floor(x*10000+0.5) — the engine-agnostic rounding
    // doctrine). The oracle rebuilds every signature from the closed-form
    // color formula and must land on the same groups: planted pairs
    // collapse, everything else stays singleton.
    "q_video_sig_dedup" -> ((s, d) => {
      val mpngUdf = udf((id: Long) => fixtureMpng(id))
      val lumaUdf = udf((frame: Array[Byte]) =>
        graft.multimodal.ImageCodecs.imageFeatures(frame, 1)(0))
      val media = Tables.documents(s, d).select(
        col("doc_id").as("media_id"),
        lit("video").as("kind"),
        mpngUdf(when(pmod(col("doc_id"), lit(10)) === 3, col("doc_id") - 1)
          .otherwise(col("doc_id"))).as("payload"),
        lit(8).as("width"), lit(8).as("height"),
        lit(null).cast("int").as("sample_rate"),
        lit(250L).as("duration_ms"))
      graft.multimodal.Multimodal
        .sampleVideoFrames(s, media, numFrames = 3, codec = "mpng")
        .select(col("media_id"), col("frame_idx").cast("long").as("fi"),
          floor(lumaUdf(col("frame")).cast("double") * 10000 + 0.5)
            .cast("long").as("lq"))
        .groupBy(col("media_id"))
        .agg(concat_ws("_",
          transform(array_sort(collect_list(struct(col("fi"), col("lq")))),
            x => x.getField("lq").cast("string"))).as("sig"))
        .groupBy(col("sig"))
        .agg(min(col("media_id")).as("keep_id"),
          count(lit(1)).as("n_copies"))
    }),

    // REAL video demux + frame decode, oracled end to end: an executor UDF
    // assembles a 6-frame motion-PNG container per row (solid frame colors
    // derived from media_id × frame index), VideoCodecs walks the frame
    // index sampling frames 0/2/4 by byte offset, and each sampled frame
    // PNG-decodes to its luma. DuckDB reproduces frame indices and lumas
    // from the closed form — demux, sampling geometry, and decode are all
    // hash-verified.
    "q_video_frames" -> ((s, d) => {
      val mpngUdf = udf((id: Long) => fixtureMpng(id))
      val lumaUdf = udf((frame: Array[Byte]) =>
        graft.multimodal.ImageCodecs.imageFeatures(frame, 1)(0))
      val media = Tables.documents(s, d).select(
        col("doc_id").as("media_id"),
        lit("video").as("kind"),
        mpngUdf(col("doc_id")).as("payload"),
        lit(8).as("width"), lit(8).as("height"),
        lit(null).cast("int").as("sample_rate"),
        lit(250L).as("duration_ms"))
      graft.multimodal.Multimodal.sampleVideoFrames(s, media, numFrames = 3, codec = "mpng")
        .select(col("media_id"),
          col("frame_idx").cast("long").as("frame_idx"),
          round(lumaUdf(col("frame")).cast("double"), 4).as("luma"))
    }),

    // REAL animated-GIF mux + demux: the JDK's only natively encodable
    // multi-frame container (javax.imageio GIF plugin — MP4/MKV stay
    // documented stubs because the JDK ships no codec for them). Per row,
    // k = 3 + id%3 solid-gray 8x8 frames (level (id*31 + 17*f) % 256)
    // round-trip through a sequence-written GIF; palette encoding is
    // LOSSLESS for grayscale, so the decoded corner pixel equals the
    // planted level exactly and DuckDB replays frame counts and levels
    // from the closed form — container write, frame index, and per-frame
    // decode are all hash-verified.
    "q_video_gif" -> ((s, d) => {
      val gifUdf = udf((id: Long) => {
        val k = 3 + (id % 3).toInt
        val frames = (0 until k).map { f =>
          val img = new java.awt.image.BufferedImage(8, 8,
            java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val g = ((id * 31 + 17 * f) % 256).toInt
          val gr = img.createGraphics()
          gr.setColor(new java.awt.Color(g, g, g))
          gr.fillRect(0, 0, 8, 8)
          gr.dispose()
          img
        }
        graft.multimodal.VideoCodecs.animatedGif(frames)
      })
      val levelsUdf = udf((payload: Array[Byte]) =>
        graft.multimodal.VideoCodecs.gifFrames(payload)
          .map(img => (img.getRGB(0, 0) & 0xFF).toString).mkString(","))
      Tables.documents(s, d)
        .select(col("doc_id").as("media_id"),
          levelsUdf(gifUdf(col("doc_id"))).as("levels_csv"))
        .select(col("media_id"),
          when(col("levels_csv") === "", lit(0L))
            .otherwise(size(split(col("levels_csv"), ",")).cast("long"))
            .as("n_frames"),
          col("levels_csv"))
    }))

  private val tscInvariantSql =
    """SELECT CAST(count(*) AS BIGINT) AS n_test,
       CAST(count(*) AS BIGINT) AS n_pred,
       CAST(1 AS BIGINT) AS pred_in_domain
       FROM embeddings WHERE vec_id >= 400 AND vec_id < 500"""

  val oracles: Map[String, String] = Map(
    // the expected (qid × rank) grid with corpus count; is_match = 1 is
    // the exactness claim the in-plan brute twin enforces
    "q_dtw_topk" ->
      """SELECT e.vec_id AS qid, r.rank,
         (SELECT count(*) FROM embeddings) AS n_corpus,
         CAST(1 AS BIGINT) AS is_match
         FROM embeddings e, (SELECT unnest(range(1, 6)) AS rank) r
         WHERE e.vec_id % 250 = 7""",

    "q_tsc_local_forest" -> tscInvariantSql,
    "q_tsc_global_tree" -> tscInvariantSql,

    "q_tsc_global_scale" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_test,
         CAST(count(*) AS BIGINT) AS n_pred,
         CAST(1 AS BIGINT) AS pred_in_domain
         FROM lineitem WHERE (l_orderkey * 7 + l_linenumber) % 100 = 0""",

    // literal expected confusion matrix of the frozen model on the frozen
    // test set — regenerated by tools/gen_fixture.md when the fixture
    // changes (placeholder replaced by the generator output)
    "q_tsc_predict_fixed" -> FixtureOracle.confusionSql,

    "q_media_features" ->
      """WITH pos AS (SELECT doc_id AS media_id, text,
             unnest(range(1, len(text) + 1)) AS i FROM documents),
         byt AS (SELECT media_id, i - 1 AS idx,
             ascii(substr(text, CAST(i AS INT), 1)) AS byte FROM pos),
         agg AS (SELECT media_id, count(*) AS n,
             sum(CASE WHEN idx % 4 = 0 THEN byte ELSE 0 END) AS s0,
             sum(CASE WHEN idx % 4 = 1 THEN byte ELSE 0 END) AS s1
           FROM byt GROUP BY media_id)
         SELECT media_id,
           round(CAST(CAST((CAST(s0 AS DOUBLE) / 255.0) / greatest(1, n // 4) AS FLOAT) AS DOUBLE), 4) AS f0,
           round(CAST(CAST((CAST(s1 AS DOUBLE) / 255.0) / greatest(1, n // 4) AS FLOAT) AS DOUBLE), 4) AS f1
         FROM agg""",

    // closed-form expected lumas of the two-band PNG (top band = cells
    // f0/f1, bottom = f2/f3); same Rec.601 weights, same float cast
    "q_media_decode" ->
      """SELECT doc_id AS media_id,
           round(CAST(CAST((0.299*(doc_id % 256) + 0.587*((doc_id*7) % 256)
             + 0.114*((doc_id*13) % 256)) / 255.0 AS FLOAT) AS DOUBLE), 4) AS f0,
           round(CAST(CAST((0.299*(doc_id % 256) + 0.587*((doc_id*7) % 256)
             + 0.114*((doc_id*13) % 256)) / 255.0 AS FLOAT) AS DOUBLE), 4) AS f1,
           round(CAST(CAST((0.299*((doc_id*3) % 256) + 0.587*((doc_id*5) % 256)
             + 0.114*((doc_id*11) % 256)) / 255.0 AS FLOAT) AS DOUBLE), 4) AS f2,
           round(CAST(CAST((0.299*((doc_id*3) % 256) + 0.587*((doc_id*5) % 256)
             + 0.114*((doc_id*11) % 256)) / 255.0 AS FLOAT) AS DOUBLE), 4) AS f3
         FROM documents""",

    // integer closed form of the 4-stripe aHash: per-stripe Rec.601 lumas
    // scaled x1000 (L = 299r+587g+114b, exact integers), bit_j = strict
    // 4*L_j > sum(L), row byte = bits at 0xC0/0x30/0x0C/0x03, repeated
    // down all 8 grid rows = byte * 0x0101010101010101, wrapped to the
    // signed 64-bit value the JVM packs
    "q_media_phash" ->
      (s"""WITH lum AS (
         |  SELECT doc_id,
         |    299*((doc_id) % 256) + 587*((doc_id*7) % 256) + 114*((doc_id*13) % 256) AS l0,
         |    299*((doc_id*3) % 256) + 587*((doc_id*21) % 256) + 114*((doc_id*39) % 256) AS l1,
         |    299*((doc_id*9) % 256) + 587*((doc_id*63) % 256) + 114*((doc_id*117) % 256) AS l2,
         |    299*((doc_id*27) % 256) + 587*((doc_id*189) % 256) + 114*((doc_id*351) % 256) AS l3
         |  FROM documents),
         |b AS (
         |  SELECT doc_id,
         |    CAST(CASE WHEN 4*l0 > l0+l1+l2+l3 THEN 192 ELSE 0 END
         |      + CASE WHEN 4*l1 > l0+l1+l2+l3 THEN 48 ELSE 0 END
         |      + CASE WHEN 4*l2 > l0+l1+l2+l3 THEN 12 ELSE 0 END
         |      + CASE WHEN 4*l3 > l0+l1+l2+l3 THEN 3 ELSE 0 END AS HUGEINT)
         |      * 72340172838076673 AS hu
         |  FROM lum)
         |SELECT doc_id AS media_id,
         |  CAST(CASE WHEN hu >= 9223372036854775808 THEN hu - 18446744073709551616
         |            ELSE hu END AS BIGINT) AS ahash
         |FROM b""").stripMargin,

    "q_media_phash_dedup" ->
      (s"""WITH lum AS (
         |  SELECT doc_id,
         |    299*((doc_id) % 256) + 587*((doc_id*7) % 256) + 114*((doc_id*13) % 256) AS l0,
         |    299*((doc_id*3) % 256) + 587*((doc_id*21) % 256) + 114*((doc_id*39) % 256) AS l1,
         |    299*((doc_id*9) % 256) + 587*((doc_id*63) % 256) + 114*((doc_id*117) % 256) AS l2,
         |    299*((doc_id*27) % 256) + 587*((doc_id*189) % 256) + 114*((doc_id*351) % 256) AS l3
         |  FROM documents),
         |b AS (
         |  SELECT doc_id,
         |    CAST(CASE WHEN 4*l0 > l0+l1+l2+l3 THEN 192 ELSE 0 END
         |      + CASE WHEN 4*l1 > l0+l1+l2+l3 THEN 48 ELSE 0 END
         |      + CASE WHEN 4*l2 > l0+l1+l2+l3 THEN 12 ELSE 0 END
         |      + CASE WHEN 4*l3 > l0+l1+l2+l3 THEN 3 ELSE 0 END AS HUGEINT)
         |      * 72340172838076673 AS hu
         |  FROM lum),
         |h AS (
         |  SELECT doc_id AS media_id,
         |    CAST(CASE WHEN hu >= 9223372036854775808 THEN hu - 18446744073709551616
         |              ELSE hu END AS BIGINT) AS ahash
         |  FROM b)
         |SELECT ahash, count(*) AS n_imgs, min(media_id) AS keep_id
         |FROM h GROUP BY ahash""").stripMargin,

    // closed-form luma of the solid source color: bilinear resampling of a
    // constant image is the constant, so the 8x8 re-decode sees the same
    // (r, g, b) the 16x16 source was painted with
    "q_media_resize" ->
      """SELECT doc_id AS media_id, 8 AS width, 8 AS height,
           round(CAST(CAST((0.299*(doc_id % 256) + 0.587*((doc_id*7) % 256)
             + 0.114*((doc_id*13) % 256)) / 255.0 AS FLOAT) AS DOUBLE), 4) AS luma
         FROM documents""",

    // generator-frozen lumas of the committed JPEG fixture — every doc row
    // decodes the same bytes and each pooled luma must land within ±0.01
    // of the frozen literal (IDCT is vendor-defined to ~±0.004)
    "q_media_decode_jpeg" ->
      """SELECT doc_id AS media_id,
           TRUE AS f0_ok, TRUE AS f1_ok, TRUE AS f2_ok, TRUE AS f3_ok
         FROM documents""",

    // closed-form hashes of the STACKED fixture (top byte from the
    // (doc_id//4)%64 stripe lumas, bottom byte from the doc_id%4 palette
    // rotation — both decided against the combined 8-stripe mean, exactly
    // the comparisons the pooled aHash makes), banded 16-bit-wise;
    // shift-then-mask band values are sign-agnostic (fill bits land
    // outside the mask for shifts of 0/16/32/48)
    "q_media_phash_near" ->
      """WITH lum AS (
        |  SELECT doc_id,
        |    299*((((doc_id//4)%64)) % 256) + 587*((((doc_id//4)%64)*7) % 256) + 114*((((doc_id//4)%64)*13) % 256) AS l0,
        |    299*((((doc_id//4)%64)*3) % 256) + 587*((((doc_id//4)%64)*21) % 256) + 114*((((doc_id//4)%64)*39) % 256) AS l1,
        |    299*((((doc_id//4)%64)*9) % 256) + 587*((((doc_id//4)%64)*63) % 256) + 114*((((doc_id//4)%64)*117) % 256) AS l2,
        |    299*((((doc_id//4)%64)*27) % 256) + 587*((((doc_id//4)%64)*189) % 256) + 114*((((doc_id//4)%64)*351) % 256) AS l3,
        |    CASE WHEN (0 + doc_id % 4) % 4 IN (0, 1) THEN 200000 ELSE 10000 END AS m0,
        |    CASE WHEN (1 + doc_id % 4) % 4 IN (0, 1) THEN 200000 ELSE 10000 END AS m1,
        |    CASE WHEN (2 + doc_id % 4) % 4 IN (0, 1) THEN 200000 ELSE 10000 END AS m2,
        |    CASE WHEN (3 + doc_id % 4) % 4 IN (0, 1) THEN 200000 ELSE 10000 END AS m3
        |  FROM documents),
        |b AS (
        |  SELECT doc_id,
        |    CAST(CASE WHEN 8*l0 > l0+l1+l2+l3+m0+m1+m2+m3 THEN 192 ELSE 0 END
        |      + CASE WHEN 8*l1 > l0+l1+l2+l3+m0+m1+m2+m3 THEN 48 ELSE 0 END
        |      + CASE WHEN 8*l2 > l0+l1+l2+l3+m0+m1+m2+m3 THEN 12 ELSE 0 END
        |      + CASE WHEN 8*l3 > l0+l1+l2+l3+m0+m1+m2+m3 THEN 3 ELSE 0 END AS HUGEINT)
        |      * 72340172821233664
        |    + CAST(CASE WHEN 8*m0 > l0+l1+l2+l3+m0+m1+m2+m3 THEN 192 ELSE 0 END
        |      + CASE WHEN 8*m1 > l0+l1+l2+l3+m0+m1+m2+m3 THEN 48 ELSE 0 END
        |      + CASE WHEN 8*m2 > l0+l1+l2+l3+m0+m1+m2+m3 THEN 12 ELSE 0 END
        |      + CASE WHEN 8*m3 > l0+l1+l2+l3+m0+m1+m2+m3 THEN 3 ELSE 0 END AS HUGEINT)
        |      * 16843009 AS hu
        |  FROM lum),
        |h AS (
        |  SELECT doc_id AS media_id,
        |    CAST(CASE WHEN hu >= 9223372036854775808 THEN hu - 18446744073709551616
        |              ELSE hu END AS BIGINT) AS ahash
        |  FROM b),
        |cls AS (
        |  SELECT ahash, min(media_id) AS keep_id FROM h GROUP BY ahash),
        |bands AS (
        |  SELECT ahash, keep_id, band,
        |    ((ahash >> (band * 16)) & 65535) AS bval
        |  FROM cls, (SELECT unnest([0, 1, 2, 3]) AS band) bs),
        |cand AS (
        |  SELECT DISTINCT a.ahash AS a_hash, b.ahash AS b_hash,
        |    a.keep_id AS a_keep, b.keep_id AS b_keep
        |  FROM bands a JOIN bands b
        |    ON a.band = b.band AND a.bval = b.bval AND a.ahash < b.ahash)
        |SELECT a_hash, b_hash, a_keep, b_keep,
        |  CAST(bit_count(xor(a_hash, b_hash)) AS BIGINT) AS hamming
        |FROM cand
        |WHERE bit_count(xor(a_hash, b_hash)) <= 16""".stripMargin,

    // closed-form fingerprint: bands 0-1 quantize to (doc_id*37%16384)//128,
    // bands 2-3 to (doc_id*53%16384)//128, packed base 256
    "q_audio_fp_dedup" ->
      """WITH f AS (
        |  SELECT doc_id AS media_id,
        |    ((((doc_id*37 % 16384) // 128) * 256 + ((doc_id*37 % 16384) // 128)) * 256
        |      + ((doc_id*53 % 16384) // 128)) * 256
        |      + ((doc_id*53 % 16384) // 128) AS afp
        |  FROM documents)
        |SELECT afp, count(*) AS n_clips, min(media_id) AS keep_id
        |FROM f GROUP BY afp""".stripMargin,

    // closed-form band energies of the two-band square WAV: bands 0-1 see
    // |amp1|/32768, bands 2-3 |amp2|/32768 (4096 samples, band = 1024,
    // half = 2048 — windows align exactly)
    "q_audio_decode" ->
      """SELECT doc_id AS media_id,
           round(CAST(CAST(CAST((doc_id*37) % 16384 AS DOUBLE) / 32768.0 AS FLOAT) AS DOUBLE), 6) AS b0,
           round(CAST(CAST(CAST((doc_id*37) % 16384 AS DOUBLE) / 32768.0 AS FLOAT) AS DOUBLE), 6) AS b1,
           round(CAST(CAST(CAST((doc_id*53) % 16384 AS DOUBLE) / 32768.0 AS FLOAT) AS DOUBLE), 6) AS b2,
           round(CAST(CAST(CAST((doc_id*53) % 16384 AS DOUBLE) / 32768.0 AS FLOAT) AS DOUBLE), 6) AS b3
         FROM documents""",

    // every signature rebuilt from the closed-form colors of the SOURCE
    // id (%10==3 copies its predecessor), quantized with the
    // engine-agnostic floor(x+0.5); groups must match exactly
    "q_video_sig_dedup" ->
      """WITH src AS (SELECT doc_id,
        |    CASE WHEN doc_id % 10 = 3 THEN doc_id - 1 ELSE doc_id END AS sid
        |  FROM documents),
        |f AS (SELECT doc_id, sid, unnest([0, 2, 4]) AS fi FROM src),
        |l AS (SELECT doc_id, fi,
        |    CAST(floor(CAST(CAST((0.299*((sid + fi*17) % 256)
        |      + 0.587*((sid*7 + fi*29) % 256)
        |      + 0.114*((sid*13 + fi*41) % 256)) / 255.0 AS FLOAT) AS DOUBLE)
        |      * 10000 + 0.5) AS BIGINT) AS lq
        |  FROM f),
        |sig AS (SELECT doc_id,
        |    string_agg(CAST(lq AS VARCHAR), '_' ORDER BY fi) AS sig
        |  FROM l GROUP BY doc_id)
        |SELECT sig, min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM sig GROUP BY 1""".stripMargin,

    // closed-form frame lumas: sampling 3 of 6 frames picks true indices
    // 0/2/4; each solid frame's luma follows the id x index color formula
    "q_video_frames" ->
      """WITH f AS (SELECT doc_id, unnest([0, 2, 4]) AS fi FROM documents)
         SELECT doc_id AS media_id, CAST(fi AS BIGINT) AS frame_idx,
           round(CAST(CAST((0.299*((doc_id + fi*17) % 256)
             + 0.587*((doc_id*7 + fi*29) % 256)
             + 0.114*((doc_id*13 + fi*41) % 256)) / 255.0 AS FLOAT) AS DOUBLE), 4) AS luma
         FROM f""",

    // closed-form replay of the planted GIF frames: count and the exact
    // palette-lossless gray levels per frame, in frame order
    "q_video_gif" ->
      """WITH f AS (SELECT doc_id,
           unnest(range(0, CAST(3 + doc_id % 3 AS BIGINT))) AS i
         FROM documents)
         SELECT doc_id AS media_id, CAST(count(*) AS BIGINT) AS n_frames,
           string_agg(CAST((doc_id * 31 + 17 * i) % 256 AS VARCHAR),
             ',' ORDER BY i) AS levels_csv
         FROM f GROUP BY doc_id"""
  )
}
