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
}
