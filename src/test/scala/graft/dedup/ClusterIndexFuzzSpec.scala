package graft.dedup

import java.nio.file.Files

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Randomized adversarial check of the incremental clustering's ONE
  * contract on shapes a hand-written fixture can't enumerate: random
  * pair graphs (dense, sparse, self-loop-heavy, duplicate-heavy) cut
  * into random epoch sequences — resolved labels must equal the
  * from-scratch clustering over the union of all pairs after EVERY
  * epoch, and the maintained best view must equal from-scratch keepBest
  * (ties included: scores drawn from a tiny range so equal-score
  * min-id tie-breaks actually fire). Seeded, so failures reproduce.
  */
class ClusterIndexFuzzSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val rnd = new Random(20260815L)

  private def labelsOf(df: org.apache.spark.sql.DataFrame) =
    df.as[(Long, Long)].collect().toMap

  private def keepOf(df: org.apache.spark.sql.DataFrame) =
    df.as[Long].collect().toSet

  test("random graphs x random epoch splits: resolve and resolveBest " +
      "match from-scratch after every epoch") {
    for (round <- 1 to 4) {
      val nVerts = 8 + rnd.nextInt(33) // 8..40
      val nPairs = 5 + rnd.nextInt(36) // 5..40, dups + self-loops allowed
      val pairs = Seq.fill(nPairs)(
        (rnd.nextInt(nVerts).toLong, rnd.nextInt(nVerts).toLong))
      // scores from {0..3}: collisions guaranteed, so the (score desc,
      // id asc) tie-break is exercised, not just compiled
      val docs = (0 until nVerts)
        .map(v => (v.toLong, rnd.nextInt(4).toDouble)).toDF("id", "score")
      val nEpochs = 1 + rnd.nextInt(3) // build + 0..2 delta epochs
      val cut = pairs.map(_ => rnd.nextInt(nEpochs))
      val byEpoch = (0 until nEpochs).map(e =>
        pairs.zip(cut).collect { case (p, c) if c == e => p })

      val dir = Files.createTempDirectory(s"cluster_fuzz_$round").toString + "/idx"
      ClusterIndex.buildWithBest(byEpoch.head.toDF("id_a", "id_b"),
        "id_a", "id_b", docs, "id", col("score"), dir)
      var seen = byEpoch.head
      def check(): Unit = {
        // the index canonicalizes pa != pb (a doc paired with ITSELF is
        // no pair), so the from-scratch twin sees the same universe: a
        // self-loop-only vertex is unpaired on both sides (it keeps
        // itself in the keep set and carries no cluster label)
        val all = seen.filter(p => p._1 != p._2).toDF("id_a", "id_b")
        val scratchLabels = labelsOf(
          Dedup.connectedComponents(all, "id_a", "id_b"))
        assert(labelsOf(ClusterIndex.resolve(spark, dir)) === scratchLabels,
          s"labels diverged (round $round, ${seen.size} pairs)")
        val scratchKeep = keepOf(Dedup.keepBest(docs, "id", col("score"),
          Dedup.connectedComponents(all, "id_a", "id_b")))
        assert(keepOf(ClusterIndex.resolveBest(spark, dir, docs, "id"))
          === scratchKeep, s"keep set diverged (round $round)")
      }
      check()
      byEpoch.toSeq.zipWithIndex.drop(1).foreach { case (batch, e) =>
        ClusterIndex.addPairsWithBest(spark, dir,
          batch.toDF("id_a", "id_b"), "id_a", "id_b", docs, "id",
          col("score"), e.toLong)
        seen = seen ++ batch
        check()
      }
      // compaction is a pure rewrite: same resolved state after
      ClusterIndex.compact(spark, dir)
      check()
    }
  }

  test("random MID-SEQUENCE compactions: folding between epochs changes " +
      "neither view, and later deltas build on the folded base") {
    // the staged-swap compact (r17 review fix) folds labels AND winners
    // mid-history; every later epoch then overlays a folded base instead
    // of the original build — a folding bug (lost tombstone, stale
    // winner) shows up as divergence at the NEXT check, not just at the
    // end-of-sequence compact the other test exercises
    for (round <- 1 to 3) {
      val nVerts = 8 + rnd.nextInt(25)
      val nPairs = 6 + rnd.nextInt(30)
      val pairs = Seq.fill(nPairs)(
        (rnd.nextInt(nVerts).toLong, rnd.nextInt(nVerts).toLong))
      val docs = (0 until nVerts)
        .map(v => (v.toLong, rnd.nextInt(4).toDouble)).toDF("id", "score")
      val nEpochs = 3 + rnd.nextInt(3) // build + 2..4 delta epochs
      val cut = pairs.map(_ => rnd.nextInt(nEpochs))
      val byEpoch = (0 until nEpochs).map(e =>
        pairs.zip(cut).collect { case (p, c) if c == e => p })

      val dir = Files.createTempDirectory(s"cluster_fuzzc_$round").toString + "/idx"
      ClusterIndex.buildWithBest(byEpoch.head.toDF("id_a", "id_b"),
        "id_a", "id_b", docs, "id", col("score"), dir)
      var seen = byEpoch.head
      def check(): Unit = {
        val all = seen.filter(p => p._1 != p._2).toDF("id_a", "id_b")
        assert(labelsOf(ClusterIndex.resolve(spark, dir)) ===
          labelsOf(Dedup.connectedComponents(all, "id_a", "id_b")),
          s"labels diverged (round $round after ${seen.size} pairs)")
        assert(keepOf(ClusterIndex.resolveBest(spark, dir, docs, "id")) ===
          keepOf(Dedup.keepBest(docs, "id", col("score"),
            Dedup.connectedComponents(all, "id_a", "id_b"))),
          s"keep set diverged (round $round)")
      }
      check()
      byEpoch.toSeq.zipWithIndex.drop(1).foreach { case (batch, e) =>
        ClusterIndex.addPairsWithBest(spark, dir,
          batch.toDF("id_a", "id_b"), "id_a", "id_b", docs, "id",
          col("score"), e.toLong)
        seen = seen ++ batch
        check()
        if (rnd.nextBoolean()) { // fold mid-history
          ClusterIndex.compact(spark, dir)
          check()
        }
      }
    }
  }

  test("random crashed epoch: repairWithBest re-derives labels AND " +
      "winners to the from-scratch state") {
    for (round <- 1 to 3) {
      val nVerts = 8 + rnd.nextInt(25)
      val docs = (0 until nVerts)
        .map(v => (v.toLong, rnd.nextInt(4).toDouble)).toDF("id", "score")
      def somePairs(n: Int) = Seq.fill(n)(
        (rnd.nextInt(nVerts).toLong, rnd.nextInt(nVerts).toLong))
      val built = somePairs(4 + rnd.nextInt(10))
      val sealed1 = somePairs(2 + rnd.nextInt(8))
      val crashed = somePairs(2 + rnd.nextInt(8))

      val dir = Files.createTempDirectory(s"cluster_fuzzr_$round").toString + "/idx"
      ClusterIndex.buildWithBest(built.toDF("id_a", "id_b"),
        "id_a", "id_b", docs, "id", col("score"), dir)
      ClusterIndex.addPairsWithBest(spark, dir,
        sealed1.toDF("id_a", "id_b"), "id_a", "id_b", docs, "id",
        col("score"), 1L)
      // crash window: epoch 2's pairs land in canonical form (what
      // addPairsWithBest writes first), no updates, no seal
      crashed.toDF("id_a", "id_b")
        .select(least(col("id_a"), col("id_b")).as("pa"),
          greatest(col("id_a"), col("id_b")).as("pb"))
        .filter(col("pa") =!= col("pb")).distinct()
        .write.parquet(s"$dir/pairs/epoch=2")
      assert(ClusterIndex.unsealedEpochs(spark, dir) === Seq(2L))
      assert(ClusterIndex.repairWithBest(spark, dir, docs, "id",
        col("score")) === Seq(2L))
      val all = (built ++ sealed1 ++ crashed)
        .filter(p => p._1 != p._2).toDF("id_a", "id_b")
      assert(labelsOf(ClusterIndex.resolve(spark, dir)) ===
        labelsOf(Dedup.connectedComponents(all, "id_a", "id_b")),
        s"repaired labels diverged (round $round)")
      assert(keepOf(ClusterIndex.resolveBest(spark, dir, docs, "id")) ===
        keepOf(Dedup.keepBest(docs, "id", col("score"),
          Dedup.connectedComponents(all, "id_a", "id_b"))),
        s"repaired keep set diverged (round $round)")
    }
  }
}
