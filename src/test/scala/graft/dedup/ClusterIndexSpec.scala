package graft.dedup

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The incremental clustering's one contract: resolved labels after ANY
  * batch sequence equal the from-scratch clustering over the union of
  * all pairs — including the hard case, a delta pair merging standing
  * clusters. Plus the lifecycle: no-op batches, epoch replay refusal,
  * compact invariance.
  */
class ClusterIndexSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def pairsDf(ps: (Long, Long)*) = ps.toDF("id_a", "id_b")

  private def labelsOf(df: org.apache.spark.sql.DataFrame) =
    df.as[(Long, Long)].collect().toMap

  test("incremental batches converge to the from-scratch clustering, merges included") {
    val dir = Files.createTempDirectory("cluster_idx").toString + "/idx"
    // final graph: chain 1-2-3-4-5, triangle 10-11-12, pair 20-21
    val b0 = pairsDf(1L -> 2L, 4L -> 5L, 10L -> 11L)
    val b1 = pairsDf(2L -> 3L, 11L -> 12L)            // grows two clusters
    val b2 = pairsDf(3L -> 4L, 10L -> 12L, 20L -> 21L) // MERGES {1,2,3}+{4,5}
    ClusterIndex.build(b0, "id_a", "id_b", dir)
    val n1 = ClusterIndex.addPairs(spark, dir, b1, "id_a", "id_b", epoch = 1)
    assert(n1 === 2L, "batch 1 labels the two new vertices (3 and 12)")
    val n2 = ClusterIndex.addPairs(spark, dir, b2, "id_a", "id_b", epoch = 2)
    // batch 2: 4 and 5 move to label 1; 20 and 21 appear — 10/12's
    // intra-cluster shortcut changes nothing
    assert(n2 === 4L, s"expected 4 relabels, got $n2")
    val got = labelsOf(ClusterIndex.resolve(spark, dir))
    val scratch = labelsOf(Dedup.connectedComponents(
      b0.union(b1).union(b2), "id_a", "id_b"))
    assert(got === scratch)
    assert(got(5L) === 1L && got(12L) === 10L && got(21L) === 20L)

    // no-op batch: already-known pairs relabel nothing and resolve is
    // unchanged; replaying a used epoch id refuses loudly
    val n3 = ClusterIndex.addPairs(spark, dir,
      pairsDf(1L -> 2L, 10L -> 11L), "id_a", "id_b", epoch = 3)
    assert(n3 === 0L)
    assert(labelsOf(ClusterIndex.resolve(spark, dir)) === scratch)
    intercept[Exception] {
      ClusterIndex.addPairs(spark, dir, pairsDf(30L -> 31L),
        "id_a", "id_b", epoch = 2)
    }
    assert(labelsOf(ClusterIndex.resolve(spark, dir)) === scratch,
      "a refused replay must not half-apply")

    // compact: same resolved labels from a folded base, update log gone
    ClusterIndex.compact(spark, dir)
    assert(labelsOf(ClusterIndex.resolve(spark, dir)) === scratch)
    assert(!new java.io.File(s"$dir/label_updates").exists())
    // and the index still accepts batches after compaction
    val n4 = ClusterIndex.addPairs(spark, dir, pairsDf(21L -> 22L),
      "id_a", "id_b", epoch = 4)
    assert(n4 === 1L)
    assert(labelsOf(ClusterIndex.resolve(spark, dir))(22L) === 20L)
  }

  test("streaming ingest: detection and clustering maintained together per trigger") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = Files.createTempDirectory("cluster_stream").toString
    val lshDir = s"$base/lsh"
    val clDir = s"$base/cluster"
    // seed corpus: two unrelated docs; no standing pairs yet (an EMPTY
    // build is a first-class state)
    val w = (1 to 10).map(i => s"w$i").mkString(" ")
    val seed = Seq(
      (1L, w),
      (2L, "zero uno due tre quattro cinque sei sette otto nove")
    ).toDF("doc_id", "text")
    LshIndex.build(seed, "doc_id", "text", lshDir)
    ClusterIndex.build(pairsDf(), "id_a", "id_b", clDir)

    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = ClusterIndex.streamingIngest(spark, lshDir, clDir,
      stream.toDF().toDF("doc_id", "text"), "doc_id", "text",
      threshold = 0.5)
    try {
      // trigger 1: near-dup of SEED doc 1 -> cross pair via the index
      stream.addData((10L, w + " w11"))
      q.processAllAvailable()
      val r1 = labelsOf(ClusterIndex.resolve(spark, clDir))
      assert(r1 === Map(1L -> 1L, 10L -> 1L), s"after trigger 1: $r1")

      // trigger 2: near-dup of the TRIGGER-1 doc (cross-trigger state)
      // plus a novel doc that must stay unclustered
      stream.addData((20L, w + " w11 w12"),
        (21L, "red orange yellow green blue indigo violet pink"))
      q.processAllAvailable()
      val r2 = labelsOf(ClusterIndex.resolve(spark, clDir))
      assert(r2.keySet.contains(20L) && r2(20L) === 1L, s"after trigger 2: $r2")
      assert(!r2.contains(21L), "the novel doc has no pair, hence no label")

      // the detection index grew too: every streamed doc is probe-able
      val ids = spark.read.parquet(s"$lshDir/docs")
        .select("id").as[Long].collect().toSet
      assert(ids === Set(1L, 2L, 10L, 20L, 21L))
    } finally q.stop()
  }

  test("crash recovery: unsealed pairs are invisible until repair re-derives and seals") {
    val dir = Files.createTempDirectory("cluster_crash").toString + "/idx"
    ClusterIndex.build(pairsDf(1L -> 2L), "id_a", "id_b", dir)
    val before = labelsOf(ClusterIndex.resolve(spark, dir))
    // simulate addPairs crashing between write 1 (pairs) and write 3
    // (seal): the epoch's pairs land, labels and seal do not
    pairsDf(2L -> 3L).select(
        least(col("id_a"), col("id_b")).as("pa"),
        greatest(col("id_a"), col("id_b")).as("pb"))
      .write.parquet(s"$dir/pairs/epoch=1")
    assert(ClusterIndex.unsealedEpochs(spark, dir) === Seq(1))
    // readers see only committed state; writers refuse to build on it
    assert(labelsOf(ClusterIndex.resolve(spark, dir)) === before)
    intercept[IllegalArgumentException] {
      ClusterIndex.addPairs(spark, dir, pairsDf(3L -> 4L), "id_a", "id_b", 2)
    }
    // repair re-derives epoch 1's labels FROM ITS RECORDED PAIRS
    assert(ClusterIndex.repair(spark, dir) === Seq(1))
    assert(ClusterIndex.unsealedEpochs(spark, dir) === Nil)
    val healed = labelsOf(ClusterIndex.resolve(spark, dir))
    assert(healed === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    // and the index accepts batches again, building on the repaired state
    ClusterIndex.addPairs(spark, dir, pairsDf(3L -> 4L), "id_a", "id_b", 2)
    assert(labelsOf(ClusterIndex.resolve(spark, dir)) ===
      labelsOf(Dedup.connectedComponents(
        pairsDf(1L -> 2L, 2L -> 3L, 3L -> 4L), "id_a", "id_b")))
  }

  test("maintain: heals, reports needs_repair, compacts on the epoch bar") {
    val dir = Files.createTempDirectory("cluster_mnt").toString + "/idx"
    ClusterIndex.build(pairsDf(1L -> 2L), "id_a", "id_b", dir)
    // below the bar: no-op, nothing healed
    ClusterIndex.addPairs(spark, dir, pairsDf(2L -> 3L), "id_a", "id_b", 1)
    val r0 = ClusterIndex.maintain(spark, dir).collect()(0)
    assert(r0.getAs[String]("action") === "none")
    assert(r0.getAs[String]("healed") === "no_staging")
    assert(r0.getAs[Int]("update_epochs") === 1)

    // crashed addPairs: maintain REPORTS (it must not invent scores on a
    // best-enabled index, so repair stays the operator's move) and
    // touches nothing
    pairsDf(3L -> 4L).select(
        least(col("id_a"), col("id_b")).as("pa"),
        greatest(col("id_a"), col("id_b")).as("pb"))
      .write.parquet(s"$dir/pairs/epoch=2")
    val r1 = ClusterIndex.maintain(spark, dir).collect()(0)
    assert(r1.getAs[String]("action") === "needs_repair")
    assert(ClusterIndex.unsealedEpochs(spark, dir) === Seq(2),
      "maintain must not repair")
    ClusterIndex.repair(spark, dir)

    // two sealed update epochs >= a bar of 2: maintain compacts
    val r2 = ClusterIndex.maintain(spark, dir,
      ClusterIndex.MaintenancePolicy(epochsBar = 2)).collect()(0)
    assert(r2.getAs[String]("action") === "compact")
    assert(!new java.io.File(s"$dir/label_updates").exists())
    assert(labelsOf(ClusterIndex.resolve(spark, dir)) ===
      labelsOf(Dedup.connectedComponents(
        pairsDf(1L -> 2L, 2L -> 3L, 3L -> 4L), "id_a", "id_b")))

    // acting reset the signal to its floor; the ledger audits every
    // decision in order
    val r3 = ClusterIndex.maintain(spark, dir).collect()(0)
    assert(r3.getAs[String]("action") === "none")
    assert(r3.getAs[Int]("update_epochs") === 0)
    assert(ClusterIndex.maintenanceLog(spark, dir).collect()
      .map(r => (r.getAs[Long]("seq"), r.getAs[String]("action"))).toSeq ===
      Seq((0L, "none"), (1L, "needs_repair"), (2L, "compact"), (3L, "none")))
  }

  test("a delta that bridges EVERY standing cluster still resolves exactly") {
    val dir = Files.createTempDirectory("cluster_idx2").toString + "/idx"
    val b0 = pairsDf(1L -> 2L, 10L -> 11L, 20L -> 21L)
    ClusterIndex.build(b0, "id_a", "id_b", dir)
    val bridge = pairsDf(2L -> 10L, 11L -> 20L)
    val n = ClusterIndex.addPairs(spark, dir, bridge, "id_a", "id_b", 1)
    assert(n === 4L, "10,11,20,21 all move to label 1")
    val got = labelsOf(ClusterIndex.resolve(spark, dir))
    assert(got === Map(1L -> 1L, 2L -> 1L, 10L -> 1L, 11L -> 1L,
      20L -> 1L, 21L -> 1L))
  }

  // ---- incremental survivorship (r17): the best-member view ----

  // scores chosen so the cross-epoch merge CHANGES a cluster's winner
  // (cluster {4,5}'s keep moves 4 -> 2 when it merges into {1,2,3}),
  // plus a tie pair (20, 21: equal scores -> min id) and unpaired docs
  private def bestDocs = Seq(
    (1L, 5L), (2L, 9L), (3L, 1L), (4L, 7L), (5L, 2L),
    (10L, 3L), (11L, 8L), (20L, 4L), (21L, 4L)
  ).toDF("id", "score")

  private def keepOf(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.as[Long].collect().toSet

  private def scratchKeep(ps: (Long, Long)*): Set[Long] =
    keepOf(Dedup.keepBest(bestDocs, "id", col("score"),
      Dedup.connectedComponents(pairsDf(ps: _*), "id_a", "id_b")))

  test("resolveBest equals from-scratch keepBest after every epoch, " +
      "including a merge that changes a cluster's winner") {
    val dir = Files.createTempDirectory("cluster_best").toString + "/idx"
    val all = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    def check(): Unit =
      assert(keepOf(ClusterIndex.resolveBest(spark, dir, bestDocs, "id"))
        === scratchKeep(all.toSeq: _*))

    all ++= Seq(1L -> 2L, 4L -> 5L)
    ClusterIndex.buildWithBest(pairsDf(all.toSeq: _*), "id_a", "id_b",
      bestDocs, "id", col("score"), dir)
    check() // winners 2 and 4; unpaired 3,10,11,20,21 keep themselves
    assert(scratchKeep(all.toSeq: _*) === Set(2L, 4L, 3L, 10L, 11L, 20L, 21L))

    // epoch 1: grow {1,2} by 3 — winner stays 2, doc 3 leaves unpaired
    val b1 = Seq(2L -> 3L); all ++= b1
    ClusterIndex.addPairsWithBest(spark, dir, pairsDf(b1: _*),
      "id_a", "id_b", bestDocs, "id", col("score"), 1)
    check()

    // epoch 2: MERGE {1,2,3} + {4,5} — cluster 4 dies (tombstone), its
    // old winner 4 must stop being kept; joint winner is 2
    val b2 = Seq(3L -> 4L); all ++= b2
    ClusterIndex.addPairsWithBest(spark, dir, pairsDf(b2: _*),
      "id_a", "id_b", bestDocs, "id", col("score"), 2)
    check()
    assert(!keepOf(ClusterIndex.resolveBest(spark, dir, bestDocs, "id"))
      .contains(4L), "the merged-away cluster's old winner must drop")

    // epoch 3: two unpaired docs become a cluster (winner 11) and the
    // tie pair lands (equal scores -> min id 20)
    val b3 = Seq(10L -> 11L, 20L -> 21L); all ++= b3
    ClusterIndex.addPairsWithBest(spark, dir, pairsDf(b3: _*),
      "id_a", "id_b", bestDocs, "id", col("score"), 3)
    check()
    assert(scratchKeep(all.toSeq: _*) === Set(2L, 11L, 20L))

    // compact folds winners + labels; resolved keep set unchanged
    ClusterIndex.compact(spark, dir)
    check()

    // a no-op batch (known pair) records its epoch but changes nothing
    ClusterIndex.addPairsWithBest(spark, dir, pairsDf(1L -> 2L),
      "id_a", "id_b", bestDocs, "id", col("score"), 4)
    check()
  }

  test("best crash recovery: unsealed epochs invisible to resolveBest; " +
      "repairWithBest re-derives labels AND winners; repair() refuses") {
    val dir = Files.createTempDirectory("cluster_best_crash").toString + "/idx"
    ClusterIndex.buildWithBest(pairsDf(1L -> 2L, 4L -> 5L), "id_a", "id_b",
      bestDocs, "id", col("score"), dir)
    val before = keepOf(ClusterIndex.resolveBest(spark, dir, bestDocs, "id"))
    // crash between write 1 (pairs) and the seal: the merging epoch's
    // pairs land, label/best updates do not
    pairsDf(3L -> 4L, 2L -> 3L).select(
        least(col("id_a"), col("id_b")).as("pa"),
        greatest(col("id_a"), col("id_b")).as("pb"))
      .write.parquet(s"$dir/pairs/epoch=1")
    assert(ClusterIndex.unsealedEpochs(spark, dir) === Seq(1))
    // readers see committed state only — the old winners
    assert(keepOf(ClusterIndex.resolveBest(spark, dir, bestDocs, "id"))
      === before)
    // writers refuse; the label-only repair refuses on a best index
    intercept[IllegalArgumentException] {
      ClusterIndex.addPairsWithBest(spark, dir, pairsDf(10L -> 11L),
        "id_a", "id_b", bestDocs, "id", col("score"), 2)
    }
    intercept[IllegalArgumentException] {
      ClusterIndex.repair(spark, dir)
    }
    assert(ClusterIndex.repairWithBest(spark, dir, bestDocs, "id",
      col("score")) === Seq(1))
    assert(ClusterIndex.unsealedEpochs(spark, dir) === Nil)
    // healed state == from-scratch over all recorded pairs: the merge
    // relabeled {4,5} into {1,2,3,4,5}, winner 2, old winner 4 dropped
    assert(keepOf(ClusterIndex.resolveBest(spark, dir, bestDocs, "id"))
      === scratchKeep(1L -> 2L, 4L -> 5L, 3L -> 4L, 2L -> 3L))
    // and the index accepts best batches again
    ClusterIndex.addPairsWithBest(spark, dir, pairsDf(10L -> 11L),
      "id_a", "id_b", bestDocs, "id", col("score"), 2)
    assert(keepOf(ClusterIndex.resolveBest(spark, dir, bestDocs, "id"))
      === scratchKeep(1L -> 2L, 4L -> 5L, 3L -> 4L, 2L -> 3L, 10L -> 11L))
  }

  test("face guards: plain addPairs/streamingIngest refuse a best index " +
      "(silent winner corruption), repairWithBest refuses a plain one") {
    val dir = Files.createTempDirectory("cluster_guard").toString + "/idx"
    ClusterIndex.buildWithBest(pairsDf(1L -> 2L, 4L -> 5L), "id_a", "id_b",
      bestDocs, "id", col("score"), dir)
    // a plain-addPairs epoch would seal labels WITHOUT recomputing
    // winners or tombstoning merged-away clusters — resolveBest would
    // silently diverge from keepBest with no repair path
    intercept[IllegalArgumentException] {
      ClusterIndex.addPairs(spark, dir, pairsDf(2L -> 4L), "id_a", "id_b", 1)
    }
    // nothing was recorded by the refusal
    assert(ClusterIndex.maxRecordedEpoch(spark, dir) === 0L)
    assert(keepOf(ClusterIndex.resolveBest(spark, dir, bestDocs, "id"))
      === scratchKeep(1L -> 2L, 4L -> 5L))
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    intercept[IllegalArgumentException] {
      ClusterIndex.streamingIngest(spark, dir, dir,
        stream.toDF().toDF("doc_id", "text"), "doc_id", "text", 0.5)
    }
    // and the mirror: repairWithBest on a plain index would write
    // orphan best updates
    val plain = Files.createTempDirectory("cluster_guard2").toString + "/idx"
    ClusterIndex.build(pairsDf(1L -> 2L), "id_a", "id_b", plain)
    intercept[IllegalArgumentException] {
      ClusterIndex.repairWithBest(spark, plain, bestDocs, "id", col("score"))
    }
  }

  test("streaming ingest with best: the keep set is maintained per " +
      "trigger and equals from-scratch keepBest over the streamed docs") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = Files.createTempDirectory("cluster_stream_best").toString
    val lshDir = s"$base/lsh"
    val clDir = s"$base/cluster"
    val w = (1 to 10).map(i => s"w$i").mkString(" ")
    // the pre-stream corpus: one doc already in the detection index. Its
    // score must be SEEDED (setup refuses otherwise — see the coverage
    // guard test): winner recomputation reads docScores only, and this
    // doc can pair with streamed arrivals
    val seedCorpus = Seq((1L, "zz yy xx ww vv uu tt ss rr qq"))
      .toDF("doc_id", "text")
    LshIndex.build(seedCorpus, "doc_id", "text", lshDir)
    ClusterIndex.buildWithBest(pairsDf(), "id_a", "id_b",
      Seq.empty[(Long, Double)].toDF("id", "score"), "id", col("score"),
      clDir)
    ClusterIndex.seedScores(spark, clDir, seedCorpus, "doc_id",
      length(col("text")).cast("double"))

    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = ClusterIndex.streamingIngestWithBest(spark, lshDir, clDir,
      stream.toDF().toDF("doc_id", "text"), "doc_id", "text",
      threshold = 0.5, score = length(col("text")).cast("double"))
    def kept(): Set[Long] =
      ClusterIndex.resolveBest(spark, clDir,
        ClusterIndex.docScores(spark, clDir), "id")
        .as[Long].collect().toSet
    try {
      // trigger 1: two unrelated docs — no pairs, both keep themselves
      // (and the seeded corpus doc keeps itself: unpaired)
      stream.addData((10L, w), (11L, "uno due tre quattro cinque sei"))
      q.processAllAvailable()
      assert(kept() === Set(1L, 10L, 11L))

      // trigger 2: a LONGER near-dup of doc 10 (cross pair through the
      // index) — the cluster winner moves to the longer text
      stream.addData((20L, w + " w11"))
      q.processAllAvailable()
      assert(kept() === Set(1L, 20L, 11L))

      // trigger 3: a still-longer member joins the same cluster AND an
      // intra-trigger near-dup pair of fresh docs (50 longer than 51)
      stream.addData((30L, w + " w11 w12"),
        (50L, "red orange yellow green blue indigo violet extra"),
        (51L, "red orange yellow green blue indigo violet"))
      q.processAllAvailable()
      assert(kept() === Set(1L, 30L, 11L, 50L))

      // the maintained view == from-scratch keepBest over exactly the
      // streamed docs and the recorded pair graph
      val scratch = Dedup.keepBest(
        ClusterIndex.docScores(spark, clDir), "id", col("score"),
        Dedup.connectedComponents(
          spark.read.schema("pa long, pb long")
            .parquet(s"$clDir/pairs").select(col("pa"), col("pb")),
          "pa", "pb"))
        .as[Long].collect().toSet
      assert(kept() === scratch)
      assert(ClusterIndex.unsealedEpochs(spark, clDir).isEmpty)
      assert(ClusterIndex.maxRecordedEpoch(spark, clDir) === 3L)
    } finally q.stop()

    // compact folds the streamed score epochs into ONE (a long-lived
    // stream's winner joins otherwise re-scan a parquet dir per
    // historical trigger) alongside labels and winners — resolved keep
    // set unchanged, ledger intact
    ClusterIndex.compact(spark, clDir)
    assert(kept() === Set(1L, 30L, 11L, 50L))
    val scoreEpochs = new java.io.File(s"$clDir/doc_scores").listFiles()
      .map(_.getName).filter(_.startsWith("epoch=")).toSet
    assert(scoreEpochs === Set("epoch=0"), s"folded score epochs: $scoreEpochs")
    assert(ClusterIndex.maxRecordedEpoch(spark, clDir) === 3L)
  }

  test("streaming best over a PRE-STREAM corpus: setup refuses unseeded " +
      "scores; seeded, a corpus-stream merge keeps the corpus winner") {
    // THE silent-corruption scenario the coverage guard exists for:
    // corpus docs A(long) -- pair -- B(short); stream doc C (mid length)
    // that near-dups B. Winner recomputation reads docScores ONLY — with
    // A and B unscored they'd drop out of the merged cluster's max and C
    // would silently be crowned over the true winner A.
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = Files.createTempDirectory("cluster_seed").toString
    val lshDir = s"$base/lsh"
    val clDir = s"$base/cluster"
    val bText = (1 to 10).map(i => s"b$i").mkString(" ")
    val corpus = Seq(
      (1L, (1 to 18).map(i => s"a$i").mkString(" ")), // A: longest
      (2L, bText)                                      // B: shortest
    ).toDF("doc_id", "text")
    val scoreCol = length(col("text")).cast("double")
    LshIndex.build(corpus, "doc_id", "text", lshDir)
    ClusterIndex.buildWithBest(pairsDf(1L -> 2L), "id_a", "id_b",
      corpus, "doc_id", scoreCol, clDir)

    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    // unseeded: the detection index holds unscored docs — refuse at setup
    intercept[IllegalArgumentException] {
      ClusterIndex.streamingIngestWithBest(spark, lshDir, clDir,
        stream.toDF().toDF("doc_id", "text"), "doc_id", "text",
        threshold = 0.5, score = scoreCol)
    }
    ClusterIndex.seedScores(spark, clDir, corpus, "doc_id", scoreCol)
    // seeding is idempotent — a second call leaves the committed seed
    ClusterIndex.seedScores(spark, clDir, corpus, "doc_id", scoreCol)
    val q = ClusterIndex.streamingIngestWithBest(spark, lshDir, clDir,
      stream.toDF().toDF("doc_id", "text"), "doc_id", "text",
      threshold = 0.5, score = scoreCol)
    try {
      // C near-dups B through the index -> pair (2,3) merges C into the
      // corpus cluster {A,B}; A (longest) must stay the winner
      stream.addData((3L, bText + " b11"))
      q.processAllAvailable()
      val kept = ClusterIndex.resolveBest(spark, clDir,
        ClusterIndex.docScores(spark, clDir), "id")
        .as[Long].collect().toSet
      assert(kept === Set(1L), s"corpus winner must survive the merge: $kept")
      // equals from-scratch keepBest over the seeded+streamed docs and
      // the full recorded pair graph
      val scratch = Dedup.keepBest(
        ClusterIndex.docScores(spark, clDir), "id", col("score"),
        Dedup.connectedComponents(
          spark.read.schema("pa long, pb long")
            .parquet(s"$clDir/pairs").select(col("pa"), col("pb")),
          "pa", "pb"))
        .as[Long].collect().toSet
      assert(kept === scratch)
    } finally q.stop()
  }

  test("compact is crash-safe: no _ready rolls back, _ready completes, " +
      "writers refuse a crashed staging") {
    val dir = Files.createTempDirectory("cluster_cswap").toString + "/idx"
    ClusterIndex.buildWithBest(pairsDf(1L -> 2L, 4L -> 5L), "id_a", "id_b",
      bestDocs, "id", col("score"), dir)
    ClusterIndex.addPairsWithBest(spark, dir, pairsDf(2L -> 3L),
      "id_a", "id_b", bestDocs, "id", col("score"), 1)
    val want = keepOf(ClusterIndex.resolveBest(spark, dir, bestDocs, "id"))

    // crash BEFORE the _ready marker: a half-written staging. Every
    // writer refuses (a write landing now would be folded away by the
    // later swap); recovery rolls back and live state is untouched.
    val st = new java.io.File(s"$dir/_compact_staging/labels_base")
    assert(st.mkdirs())
    intercept[IllegalArgumentException] {
      ClusterIndex.addPairsWithBest(spark, dir, pairsDf(10L -> 11L),
        "id_a", "id_b", bestDocs, "id", col("score"), 2)
    }
    intercept[IllegalArgumentException] { ClusterIndex.compact(spark, dir) }
    intercept[IllegalArgumentException] {
      ClusterIndex.seedScores(spark, dir, bestDocs, "id", col("score"))
    }
    assert(ClusterIndex.recoverCompact(spark, dir) === "rolled_back")
    assert(ClusterIndex.recoverCompact(spark, dir) === "no_staging")
    assert(keepOf(ClusterIndex.resolveBest(spark, dir, bestDocs, "id"))
      === want)
    assert(new java.io.File(s"$dir/best_updates").exists(),
      "rollback must leave the un-folded update log intact")

    // crash AFTER _ready (on a plain index so the staged fold is
    // constructible from public reads): recovery completes the swap
    val dir2 = Files.createTempDirectory("cluster_cswap2").toString + "/idx"
    ClusterIndex.build(pairsDf(1L -> 2L), "id_a", "id_b", dir2)
    ClusterIndex.addPairs(spark, dir2, pairsDf(2L -> 3L), "id_a", "id_b", 1)
    val wantLabels = labelsOf(ClusterIndex.resolve(spark, dir2))
    ClusterIndex.resolve(spark, dir2)
      .write.parquet(s"$dir2/_compact_staging/labels_base")
    assert(new java.io.File(s"$dir2/_compact_staging/_ready").createNewFile())
    assert(ClusterIndex.recoverCompact(spark, dir2) === "completed")
    assert(labelsOf(ClusterIndex.resolve(spark, dir2)) === wantLabels)
    assert(!new java.io.File(s"$dir2/label_updates").exists())
    assert(!new java.io.File(s"$dir2/_compact_staging").exists())
    // and the index accepts batches again
    ClusterIndex.addPairs(spark, dir2, pairsDf(3L -> 4L), "id_a", "id_b", 2)
    assert(labelsOf(ClusterIndex.resolve(spark, dir2))(4L) === 1L)
  }

  test("compact's folded scores carry graft's own seal — survive a " +
      "committer that writes no _SUCCESS (r18 ADVICE)") {
    val dir = Files.createTempDirectory("cluster_seal").toString + "/idx"
    ClusterIndex.buildWithBest(pairsDf(1L -> 2L), "id_a", "id_b",
      bestDocs, "id", col("score"), dir)
    ClusterIndex.seedScores(spark, dir, bestDocs, "id", col("score"))
    val want = ClusterIndex.docScores(spark, dir)
      .as[(Long, Double)].collect().toMap
    ClusterIndex.compact(spark, dir)
    val folded = s"$dir/doc_scores/epoch=0"
    assert(new java.io.File(folded, "_graft_commit").exists(),
      "the staged fold's seal must ride the swap rename")
    // simulate marksuccessfuljobs=false / a cloud committer: strip every
    // _SUCCESS — before the fix, docScores would see epoch=0 uncommitted
    // and ALL winners' scores would silently vanish
    new java.io.File(folded).listFiles()
      .filter(_.getName == "_SUCCESS").foreach(f => assert(f.delete()))
    graft.io.EpochCommit.dropCacheForTest(folded)
    val got = ClusterIndex.docScores(spark, dir)
      .as[(Long, Double)].collect().toMap
    assert(got === want, "folded scores must stay readable without _SUCCESS")
  }

  test("compact refuses to fold a doc_scores face holding ONLY a crashed " +
      "uncommitted epoch — seedScores still heals after (r18 ADVICE)") {
    val dir = Files.createTempDirectory("cluster_fold").toString + "/idx"
    ClusterIndex.buildWithBest(pairsDf(1L -> 2L), "id_a", "id_b",
      bestDocs, "id", col("score"), dir)
    // simulate a crashed seedScores: the epoch=0 dir exists with data
    // files but carries no commit proof
    val partial = s"$dir/doc_scores/epoch=0"
    bestDocs.select(col("id"), col("score").cast("double").as("score"))
      .write.parquet(partial)
    assert(new java.io.File(partial, "_SUCCESS").delete())
    graft.io.EpochCommit.dropCacheForTest(partial)
    ClusterIndex.compact(spark, dir)
    // before the fix: compact folded a committed EMPTY epoch=0, so
    // seedScores early-returned forever while the streaming coverage
    // guard kept failing — the index was stuck with no in-API recovery
    assert(ClusterIndex.docScores(spark, dir).count() === 0L,
      "an uncommitted partial must never feed readers")
    ClusterIndex.seedScores(spark, dir, bestDocs, "id", col("score"))
    assert(ClusterIndex.docScores(spark, dir).count() === bestDocs.count(),
      "seedScores must clear the preserved partial and land the seed")
  }

  test("streaming after batch epochs: epochBase = maxRecordedEpoch " +
      "avoids the ledger collision (r17 ADVICE)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = Files.createTempDirectory("cluster_base").toString
    val lshDir = s"$base/lsh"
    val clDir = s"$base/cluster"
    val w = (1 to 10).map(i => s"w$i").mkString(" ")
    LshIndex.build(Seq((1L, w)).toDF("doc_id", "text"),
      "doc_id", "text", lshDir)
    ClusterIndex.build(pairsDf(), "id_a", "id_b", clDir)
    // batch epochs 1 and 2 land BEFORE streaming starts — with the old
    // epochId.toInt+1 mapping the first trigger would collide with
    // epoch 1 and the mode("error") pairs write would kill the query
    ClusterIndex.addPairs(spark, clDir, pairsDf(100L -> 101L),
      "id_a", "id_b", 1)
    ClusterIndex.addPairs(spark, clDir, pairsDf(200L -> 201L),
      "id_a", "id_b", 2)
    assert(ClusterIndex.maxRecordedEpoch(spark, clDir) === 2L)

    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = ClusterIndex.streamingIngest(spark, lshDir, clDir,
      stream.toDF().toDF("doc_id", "text"), "doc_id", "text",
      threshold = 0.5,
      epochBase = ClusterIndex.maxRecordedEpoch(spark, clDir))
    try {
      stream.addData((10L, w + " w11"))
      q.processAllAvailable()
      val r = labelsOf(ClusterIndex.resolve(spark, clDir))
      // batch labels intact, streamed pair folded in at epoch 3
      assert(r === Map(100L -> 100L, 101L -> 100L, 200L -> 200L,
        201L -> 200L, 1L -> 1L, 10L -> 1L), s"resolved $r")
      assert(ClusterIndex.maxRecordedEpoch(spark, clDir) === 3L)
      assert(ClusterIndex.unsealedEpochs(spark, clDir).isEmpty)
    } finally q.stop()
  }
}
