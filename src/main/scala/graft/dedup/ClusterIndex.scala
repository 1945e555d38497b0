package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent, incrementally-maintained transitive clustering — the
  * missing state layer between pair DETECTION (LshIndex admits/names new
  * near-dup pairs nightly) and the keep/drop DECISION
  * ([[Dedup.connectedComponents]] labels a pair graph from scratch). A
  * standing 100 TB corpus cannot re-cluster the whole pair graph per
  * ingest: a nightly delta touches a handful of clusters, and only those
  * may be relabeled — including the hard case, a delta pair MERGING two
  * existing clusters (their members all move to the joint minimum).
  *
  * On disk (every face append-only between [[compact]]s — the repo's
  * no-rewrite index doctrine):
  *
  *   dir/pairs/epoch=N/          the pair graph, canonical (pa < pb),
  *                               one directory per accepted batch
  *   dir/labels_base/            (member_id, cluster_id) from [[build]]
  *   dir/label_updates/epoch=N/  relabels from [[addPairs]] — readers
  *                               resolve latest-epoch-wins (the
  *                               merge-on-read doctrine), so an update
  *                               never rewrites the base or an earlier
  *                               epoch
  *
  * [[addPairs]] work is DELTA-bounded, not corpus-bounded: the affected
  * set = the current clusters of the batch's endpoints; only THEIR
  * stored pairs re-enter component computation (the two-tier
  * [[Dedup.connectedComponentsStats]] — driver union-find at real sizes).
  * Untouched clusters are never read past the label join. Correctness
  * contract (ClusterIndexSpec + the q_dedup_cluster_index oracle):
  * resolved labels after any batch sequence equal a from-scratch
  * [[Dedup.connectedComponents]] over the union of all pairs —
  * bit-for-bit, including cross-batch merges.
  *
  * Epoch replay safety: both per-epoch writes use mode("error") — a
  * re-submitted epoch id fails loudly instead of double-appending (the
  * [[graft.sim.IvfIndex.streamingIngest]] ledger discipline).
  */
object ClusterIndex {

  /** Initial clustering: canonicalize, label, persist. Epoch 0. */
  def build(pairs: DataFrame, aCol: String, bCol: String,
      dir: String): Unit = {
    val p = canonical(pairs, aCol, bCol).localCheckpoint(true)
    p.write.mode("error").parquet(s"$dir/pairs/epoch=0")
    Dedup.connectedComponents(p, "pa", "pb")
      .write.mode("error").parquet(s"$dir/labels_base")
    Dedup.releasePlan(p)
  }

  /** The delta-bounded relabel computation shared by [[addPairs]],
    * [[addPairsWithBest]], and [[repair]]'s per-epoch replay: canonical
    * new pairs, pre-batch labels, the touched clusters, the affected
    * subgraph's fresh labels, and the genuine label changes. Everything
    * checkpointed; callers release via [[releaseDelta]].
    */
  private case class Delta(np: DataFrame, labels: DataFrame,
      affected: DataFrame, relabeled: DataFrame, changed: DataFrame,
      n: Long)

  private def releaseDelta(d: Delta): Unit =
    Seq(d.np, d.labels, d.affected, d.relabeled, d.changed)
      .foreach(Dedup.releasePlan)

  private def computeDelta(spark: SparkSession, newPairs: DataFrame,
      aCol: String, bCol: String, storedPairs: DataFrame,
      labels0: DataFrame): Delta = {
    val np = canonical(newPairs, aCol, bCol).localCheckpoint(true)
    val labels = labels0.localCheckpoint(true)
    // current cluster of every batch endpoint; an unseen vertex is its
    // own (singleton) cluster
    val eps = np.select(col("pa").as("v"))
      .union(np.select(col("pb").as("v"))).distinct()
    val affected = eps.join(labels, col("v") === col("member_id"), "left_outer")
      .select(coalesce(col("cluster_id"), col("v")).as("albl"))
      .distinct()
      .localCheckpoint(true) // delta-bounded: one row per touched cluster
    // stored pairs inside affected clusters only (both endpoints of a
    // stored pair share a label by construction, so testing pa suffices);
    // a left_semi on the tiny affected frame — untouched clusters' pairs
    // never flow further
    val stored = storedPairs
      .join(labels, col("pa") === col("member_id"), "left_outer")
      .select(col("pa"), col("pb"),
        coalesce(col("cluster_id"), col("pa")).as("lbl"))
      .join(affected, col("lbl") === col("albl"), "left_semi")
      .select(col("pa"), col("pb"))
    val relabeled = Dedup.connectedComponents(stored.union(np), "pa", "pb")
      .localCheckpoint(true)
    // only genuine changes land in the update log (a no-op batch still
    // records pairs + seal, so its epoch id stays spent)
    val changed = relabeled.join(labels.select(
        col("member_id").as("m0"), col("cluster_id").as("c0")),
        col("member_id") === col("m0"), "left_outer")
      .filter(col("c0").isNull || col("c0") =!= col("cluster_id"))
      .select(col("member_id"), col("cluster_id"))
      .localCheckpoint(true)
    Delta(np, labels, affected, relabeled, changed, changed.count())
  }

  /** Fold a delta pair batch into the standing clustering. Returns the
    * number of members relabeled (0 = the batch only repeated known
    * pairs inside existing clusters — still recorded, labels unchanged).
    */
  def addPairs(spark: SparkSession, dir: String, newPairs: DataFrame,
      aCol: String, bCol: String, epoch: Long): Long = {
    require(epoch > 0, "epoch 0 is the build; batches start at 1")
    requireNoCompactStaging(spark, dir)
    // guard symmetry with repair() (r17 self-review): a plain-addPairs
    // epoch on a best-enabled index would seal labels WITHOUT
    // recomputing winners or tombstoning merged-away clusters —
    // silently breaking the resolveBest == keepBest contract with no
    // repair path (the epoch is sealed)
    require(!hasBest(spark, dir),
      "best-enabled index (best_base present) — use addPairsWithBest so " +
        "the maintained winners stay consistent with the labels")
    val bad = unsealedEpochs(spark, dir)
    require(bad.isEmpty,
      s"unsealed epochs $bad (crashed addPairs) — run ClusterIndex.repair first")
    val d = computeDelta(spark, newPairs, aCol, bCol,
      readPairs(spark, dir), resolve(spark, dir))
    // COMMIT ORDER (the DV reserve/write/seal doctrine, small form):
    //   1. pairs   — the epoch ledger AND the source of truth: every label
    //                is re-derivable from pairs, never the reverse, so the
    //                truth lands first (labels-first would let a crash
    //                strand labels for pairs the store never recorded —
    //                a later delta would then silently split the cluster)
    //   2. updates — derived state (skipped when empty: an all-empty-
    //                partition parquet write leaves a schema-less dir
    //                that breaks partition-discovery reads)
    //   3. seal    — single file; readers of the LEDGER trust sealed
    //                epochs only. addPairs refuses to build on an
    //                unsealed predecessor (a crash window 1->3) and
    //                points at [[repair]], which re-derives the labels
    //                from the recorded pairs and seals.
    // The pairs mode("error") write is also the replay refusal: a reused
    // epoch id dies here, before any state changes.
    d.np.write.mode("error").parquet(s"$dir/pairs/epoch=$epoch")
    if (d.n > 0)
      d.changed.write.mode("error").parquet(s"$dir/label_updates/epoch=$epoch")
    seal(spark, dir, epoch)
    releaseDelta(d)
    d.n
  }

  // ---- incremental survivorship (r16 verdict task 4): the keep/drop
  // DECISION maintained beside the clustering. [[Dedup.keepBest]]
  // recomputes every cluster's winner from the full resolved labels; at
  // a standing 100 TB corpus the nightly delta touches a handful of
  // clusters, and only THEIR winners may be recomputed. On disk, the
  // labels layout mirrored:
  //
  //   dir/best_base/            (cluster_id, keep_id) from buildWithBest
  //   dir/best_updates/epoch=N/ relabeled clusters' new winners; a
  //                             cluster that DIED in a merge gets a
  //                             keep_id NULL tombstone (labels are
  //                             component minima and pairs only accrete,
  //                             so a dead cluster id can never return —
  //                             the tombstone is permanent-safe)
  //
  // Readers resolve latest-epoch-wins per cluster and drop tombstones.
  // Contract (spec + q_dedup_keep_best_incremental oracle):
  // resolveBest == from-scratch keepBest over the same docs and the
  // union of all pairs, bit-for-bit, after any batch sequence.

  /** True iff this index maintains the best-member view. */
  def hasBest(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/best_base")
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  /** [[build]] plus the initial per-cluster winners under
    * (score desc, id asc). `docs` must cover every pair endpoint (the
    * corpus table the pairs were detected over); winners are stored by
    * id only — scores live in the corpus, never denormalized into the
    * index.
    */
  def buildWithBest(pairs: DataFrame, aCol: String, bCol: String,
      docs: DataFrame, idCol: String, score: org.apache.spark.sql.Column,
      dir: String): Unit = {
    val spark = pairs.sparkSession
    val p = canonical(pairs, aCol, bCol).localCheckpoint(true)
    p.write.mode("error").parquet(s"$dir/pairs/epoch=0")
    val labels0 = Dedup.connectedComponents(p, "pa", "pb")
      .localCheckpoint(true)
    labels0.write.mode("error").parquet(s"$dir/labels_base")
    winnersOf(labels0, docs, idCol, score)
      .write.mode("error").parquet(s"$dir/best_base")
    Seq(p, labels0).foreach(Dedup.releasePlan)
  }

  /** Per-cluster winner of the given (member, label) frame: ONE
    * aggregate, max over struct(score, -id, id) — the
    * [[Dedup.keepBest]] selection rule verbatim.
    */
  private def winnersOf(labels: DataFrame, docs: DataFrame, idCol: String,
      score: org.apache.spark.sql.Column): DataFrame =
    docs.select(col(idCol).cast("long").as("__id"), score.as("__score"))
      .join(labels, col("member_id") === col("__id"))
      .groupBy(col("cluster_id"))
      .agg(max(struct(col("__score"), (-col("__id")).as("__negid"),
        col("__id"))).as("b"))
      .select(col("cluster_id"), col("b.__id").as("keep_id"))

  /** The epoch's best-updates write: fresh winners for every cluster of
    * the affected subgraph (delta-bounded — `relabeled` holds exactly
    * the members of touched clusters; the docs join is a semi-pruned
    * lookup, never a corpus scan) plus tombstones for the cluster ids
    * the batch merged away. Skipped whole when the batch changed no
    * membership (winners can only change when membership does — scores
    * are immutable here).
    */
  private def writeBestUpdates(spark: SparkSession, dir: String, d: Delta,
      docs: DataFrame, idCol: String, score: org.apache.spark.sql.Column,
      epoch: Long): Unit = {
    if (d.n == 0) return
    val winners = winnersOf(d.relabeled, docs, idCol, score)
    val dead = d.affected.join(
        d.relabeled.select(col("cluster_id")).distinct(),
        col("albl") === col("cluster_id"), "left_anti")
      .select(col("albl").as("cluster_id"),
        lit(null).cast("long").as("keep_id"))
    val upd = winners.unionByName(dead).localCheckpoint(true)
    if (upd.count() > 0)
      upd.write.mode("error").parquet(s"$dir/best_updates/epoch=$epoch")
    Dedup.releasePlan(upd)
  }

  /** [[addPairs]] on a [[buildWithBest]] index: same ledger, same commit
    * order, with the affected clusters' winners re-derived in the same
    * epoch (write order pairs -> label updates -> best updates -> seal;
    * both update faces are pure functions of pairs + docs, so
    * [[repairWithBest]] re-derives them for any crash window). Returns
    * members relabeled.
    */
  def addPairsWithBest(spark: SparkSession, dir: String,
      newPairs: DataFrame, aCol: String, bCol: String, docs: DataFrame,
      idCol: String, score: org.apache.spark.sql.Column,
      epoch: Long): Long = {
    require(epoch > 0, "epoch 0 is the build; batches start at 1")
    requireNoCompactStaging(spark, dir)
    require(hasBest(spark, dir),
      "not a best-enabled index — build with buildWithBest, or use addPairs")
    val bad = unsealedEpochs(spark, dir)
    require(bad.isEmpty,
      s"unsealed epochs $bad (crashed addPairs) — run repairWithBest first")
    val d = computeDelta(spark, newPairs, aCol, bCol,
      readPairs(spark, dir), resolve(spark, dir))
    d.np.write.mode("error").parquet(s"$dir/pairs/epoch=$epoch")
    if (d.n > 0)
      d.changed.write.mode("error").parquet(s"$dir/label_updates/epoch=$epoch")
    writeBestUpdates(spark, dir, d, docs, idCol, score, epoch)
    seal(spark, dir, epoch)
    releaseDelta(d)
    d.n
  }

  /** The maintained keep set: stored winners (base overlaid with
    * updates, latest epoch wins per cluster, tombstones dropped, sealed
    * epochs only — the [[resolve]] doctrine) plus every doc with no
    * cluster (unpaired docs keep themselves — no score needed, so the
    * winners side never touches the corpus). One `keep_id` row per
    * surviving doc; equals [[Dedup.keepBest]](docs, idCol, score,
    * [[resolve]](dir)) bit-for-bit.
    */
  def resolveBest(spark: SparkSession, dir: String, docs: DataFrame,
      idCol: String): DataFrame = {
    val winners = resolvedWinners(spark, dir)
      .select(col("keep_id"))
    val unpaired = docs.select(col(idCol).cast("long").as("__id"))
      .join(resolve(spark, dir), col("__id") === col("member_id"),
        "left_anti")
      .select(col("__id").as("keep_id"))
    winners.unionByName(unpaired)
  }

  /** Stored winners, merge-on-read: base overlaid with sealed update
    * epochs, latest epoch wins per cluster (ep never ties: base is 0,
    * epoch e writes ep = e + 1, one row per cluster per epoch),
    * tombstones dropped. (cluster_id, keep_id) per live cluster.
    */
  private def resolvedWinners(spark: SparkSession, dir: String): DataFrame = {
    val base = spark.read.schema("cluster_id long, keep_id long")
      .parquet(s"$dir/best_base")
      .select(col("cluster_id"), col("keep_id"), lit(0L).as("ep"))
    val bad = unsealedEpochs(spark, dir)
    val upd = bestUpdatesOpt(spark, dir).map { u =>
      val visible =
        if (bad.isEmpty) u
        else u.filter(!col("epoch").isin(bad.map(java.lang.Long.valueOf): _*))
      visible.select(col("cluster_id"), col("keep_id"),
        (col("epoch").cast("long") + 1L).as("ep"))
    }
    upd.fold(base)(base.unionByName(_))
      .groupBy(col("cluster_id"))
      .agg(max(struct(col("ep"), col("keep_id"))).as("b"))
      .select(col("cluster_id"), col("b.keep_id").as("keep_id"))
      .filter(col("keep_id").isNotNull)
  }

  private def bestUpdatesOpt(spark: SparkSession, dir: String): Option[DataFrame] =
    updatesFace(spark, dir, "best_updates", "cluster_id long, keep_id long")

  private def sealPath(dir: String, epoch: Long) =
    new org.apache.hadoop.fs.Path(s"$dir/seals/epoch_$epoch")

  private def seal(spark: SparkSession, dir: String, epoch: Long): Unit = {
    val p = sealPath(dir, epoch)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(p.getParent)
    fs.create(p, false).close()
  }

  /** True iff `epoch` committed fully (pairs + labels + seal). */
  def isSealed(spark: SparkSession, dir: String, epoch: Long): Boolean = {
    val p = sealPath(dir, epoch)
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  /** Epochs whose pairs landed but whose seal did not — the crash window
    * between addPairs' write 1 and write 3. Their labels may be missing
    * or partial; [[repair]] re-derives them from the recorded pairs.
    */
  def unsealedEpochs(spark: SparkSession, dir: String): Seq[Long] =
    epochsOf(spark, dir, "pairs")
      .filter(e => e > 0 && !isSealed(spark, dir, e))
      .sorted

  /** Epoch ids recorded under `dir/face/epoch=N` — the one listing
    * idiom shared by [[unsealedEpochs]], [[maxRecordedEpoch]], and
    * [[compact]]'s score-fold probe (second-review: three hand-rolled
    * copies of the same listStatus parse drift independently).
    */
  private def epochsOf(spark: SparkSession, dir: String,
      face: String): Seq[Long] = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/$face")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .collect { case s if s.startsWith("epoch=") => s.drop(6).toLong }
  }

  /** Recover from a crashed addPairs: for each unsealed epoch, drop any
    * partial update dir, re-derive that epoch's labels FROM ITS RECORDED
    * PAIRS (labels are always a function of pairs), and seal. Safe to
    * run any time; a no-op on a healthy index. On a best-enabled index
    * (built with [[buildWithBest]]) use [[repairWithBest]] — the best
    * view also derives from pairs but needs the docs' scores.
    */
  def repair(spark: SparkSession, dir: String): Seq[Long] = {
    require(!hasBest(spark, dir),
      "best-enabled index (best_base present) — run repairWithBest so " +
        "crashed epochs re-derive their best-member updates too")
    repairImpl(spark, dir, None)
  }

  /** [[repair]] for a [[buildWithBest]] index: re-derives both the label
    * updates and the best-member updates of every crashed epoch.
    */
  def repairWithBest(spark: SparkSession, dir: String, docs: DataFrame,
      idCol: String, score: org.apache.spark.sql.Column): Seq[Long] = {
    require(hasBest(spark, dir),
      "not a best-enabled index — use repair (best updates here would be orphans)")
    repairImpl(spark, dir, Some((docs, idCol, score)))
  }

  private def repairImpl(spark: SparkSession, dir: String,
      best: Option[(DataFrame, String, org.apache.spark.sql.Column)]): Seq[Long] = {
    requireNoCompactStaging(spark, dir)
    val bad = unsealedEpochs(spark, dir)
    bad.foreach { e =>
      val conf = spark.sessionState.newHadoopConf()
      Seq("label_updates", "best_updates").foreach { face =>
        val p = new org.apache.hadoop.fs.Path(s"$dir/$face/epoch=$e")
        p.getFileSystem(conf).delete(p, true) // partial or absent either way
        ()
      }
      // replay epoch e's labeling against the state BELOW e: resolve()
      // over updates < e plus base (epochs are repaired in order, so
      // earlier repairs are already sealed when later ones replay)
      val np = spark.read.schema("pa long, pb long")
        .parquet(s"$dir/pairs/epoch=$e")
      val storedBelow = spark.read.schema("pa long, pb long")
        .parquet(s"$dir/pairs")
        .filter(col("epoch") < e)
        .select(col("pa"), col("pb"))
      val d = computeDelta(spark, np, "pa", "pb", storedBelow,
        resolveBelow(spark, dir, e))
      if (d.n > 0)
        d.changed.write.mode("error").parquet(s"$dir/label_updates/epoch=$e")
      best.foreach { case (docs, idCol, score) =>
        writeBestUpdates(spark, dir, d, docs, idCol, score, e)
      }
      seal(spark, dir, e)
      releaseDelta(d)
    }
    bad
  }

  /** [[resolve]] restricted to update epochs strictly below `e`. */
  private def resolveBelow(spark: SparkSession, dir: String, e: Long): DataFrame = {
    val base = spark.read.schema("member_id long, cluster_id long")
      .parquet(s"$dir/labels_base")
      .select(col("member_id"), col("cluster_id"), lit(0L).as("ep"))
    val upd = updatesOpt(spark, dir).map(_.filter(col("epoch") < e)
      .select(col("member_id"), col("cluster_id"),
        (col("epoch").cast("long") + 1L).as("ep")))
    upd.fold(base)(base.unionByName(_))
      .groupBy(col("member_id"))
      .agg(max(struct(col("ep"), col("cluster_id"))).as("b"))
      .select(col("member_id"), col("b.cluster_id").as("cluster_id"))
  }

  /** Current labels: base overlaid with updates, latest epoch wins per
    * member (merge-on-read; one small struct-max aggregate). Reads
    * SEALED state only — updates from a crashed (unsealed) epoch are
    * invisible until [[repair]] re-derives and seals them, so a reader
    * racing a crash never sees half a merge.
    */
  def resolve(spark: SparkSession, dir: String): DataFrame = {
    val base = spark.read.schema("member_id long, cluster_id long")
      .parquet(s"$dir/labels_base")
      .select(col("member_id"), col("cluster_id"), lit(0L).as("ep"))
    val bad = unsealedEpochs(spark, dir)
    val upd = updatesOpt(spark, dir).map { u =>
      val visible =
        if (bad.isEmpty) u
        else u.filter(!col("epoch").isin(bad.map(java.lang.Long.valueOf): _*))
      visible.select(col("member_id"), col("cluster_id"),
        (col("epoch").cast("long") + 1L).as("ep"))
    }
    upd.fold(base)(base.unionByName(_))
      .groupBy(col("member_id"))
      .agg(max(struct(col("ep"), col("cluster_id"))).as("b"))
      .select(col("member_id"), col("b.cluster_id").as("cluster_id"))
  }

  /** Fold updates into a fresh base, clear the update log. One rewrite,
    * same resolved labels (spec-pinned).
    */
  def compact(spark: SparkSession, dir: String): Unit = {
    // CRASH-SAFE (second-review fix): the old in-place mode("overwrite")
    // of best_base/labels_base was delete-then-write — a crash mid-write
    // destroyed the only copy of the winners with no recovery path
    // (repair replays unsealed EPOCHS, never the base). Now every folded
    // face is STAGED, a _ready marker commits the intent, and
    // [[finishCompact]] swaps with checked renames — a crash leaves
    // either the old state intact (no _ready: [[recoverCompact]] rolls
    // back) or a completable swap (recoverCompact finishes it).
    requireNoCompactStaging(spark, dir)
    val bad = unsealedEpochs(spark, dir)
    require(bad.isEmpty,
      s"unsealed epochs $bad (crashed addPairs) — repair before compacting")
    val st = stagingPath(dir)
    val fs = st.getFileSystem(spark.sessionState.newHadoopConf())
    // staged writes READ pre-compaction state and WRITE a different path,
    // so the old read-then-overwrite localCheckpoint pin is not needed
    resolve(spark, dir).write.mode("error").parquet(s"$st/labels_base")
    if (hasBest(spark, dir))
      resolvedWinners(spark, dir).write.mode("error").parquet(s"$st/best_base")
    // fold the streamed score epochs too (second-review finding: a
    // long-lived stream's winner joins otherwise re-scan one parquet dir
    // per historical trigger) — docScores reads committed epochs only,
    // and single-writer means no trigger lands between this snapshot and
    // the swap. Gate on a COMMITTED epoch existing, not on epochsOf
    // listing any dir (r17 ADVICE): doc_scores holding only a crashed
    // uncommitted epoch (e.g. a dead seedScores) would otherwise fold an
    // EMPTY committed epoch=0 — seedScores then early-returns on its
    // committed check forever while the streaming coverage guard keeps
    // failing, with no in-API recovery. Left unfolded, the crashed
    // partial heals through seedScores' own clearPartial path.
    if (hasCommittedScores(spark, dir)) {
      val folded = s"$st/doc_scores_folded"
      docScores(spark, dir).write.mode("error").parquet(folded)
      // seal the STAGED fold before _ready so the finishCompact rename
      // carries the _graft_commit marker atomically (r17 ADVICE): relying
      // on the committer's _SUCCESS is configuration-dependent — on
      // configs that omit it, the swap would delete every live committed
      // score epoch and install an epoch=0 that docScores refuses to
      // read, silently losing all winners. Sealing after the rename
      // would leave a crash window recoverCompact cannot re-enter.
      graft.io.EpochCommit.seal(spark, folded)
    }
    fs.create(new org.apache.hadoop.fs.Path(st, "_ready"), false).close()
    val done = finishCompact(spark, dir)
    assert(done == "completed", s"compact swap state: $done")
  }

  /** Crash recovery for [[compact]] (the staged-swap doctrine): staging
    * without the _ready marker is an abandoned fold — rolled back, live
    * state untouched; with the marker the swap completes idempotently.
    * Single-writer like compact itself: must not run concurrently with
    * writers or readers of this index. Returns "no_staging",
    * "rolled_back", or "completed".
    */
  def recoverCompact(spark: SparkSession, dir: String): String = {
    val st = stagingPath(dir)
    val fs = st.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(st)) "no_staging"
    else if (!fs.exists(new org.apache.hadoop.fs.Path(st, "_ready"))) {
      fs.delete(st, true)
      "rolled_back"
    } else finishCompact(spark, dir)
  }

  /** Compaction policy for [[maintain]]: `epochsBar` bounds the sealed
    * update-epoch count AND the streamed score-epoch count —
    * [[resolve]]/[[resolveBest]] merge-on-read one parquet dir per
    * update epoch, and a best-enabled stream's winner joins scan one
    * dir per historical score epoch, so read amplification is linear
    * in epochs since the last fold on both faces.
    */
  case class MaintenancePolicy(epochsBar: Int = 8) {
    require(epochsBar >= 1, s"epochsBar must be >= 1, got $epochsBar")
  }

  /** The closed maintenance loop on the clustering index — the
    * [[graft.sim.IvfIndex.maintain]] policy doctrine, completing the
    * persistent-structure family (IVF, text, LSH, now clusters). Each
    * call: HEAL any crashed compact ([[recoverCompact]] — rollback or
    * idempotent completion, both safe), read the signals, decide, act,
    * append ONE auditable row to `dir/maintenance/`:
    *
    *   (seq, healed, unsealed_epochs, update_epochs, score_epochs,
    *    epochs_bar, action)
    *
    * `action` ∈ none | compact | needs_repair. Signals are exact
    * counters, so no hysteresis (the [[graft.text.TextIndex.maintain]]
    * doctrine — acting resets them to the floor). `needs_repair` is a
    * REPORT, not a move: re-deriving a crashed epoch's winners on a
    * best-enabled index needs the corpus' scores, which maintain must
    * not invent — the same refusal-to-guess the streaming coverage
    * guard applies; run [[repair]]/[[repairWithBest]] and call again.
    * Single-writer like every other maintenance op.
    */
  def maintain(spark: SparkSession, dir: String,
      policy: MaintenancePolicy = MaintenancePolicy()): DataFrame = {
    import spark.implicits._
    val healed = recoverCompact(spark, dir)
    val badSeq = unsealedEpochs(spark, dir)
    val bad = badSeq.size
    // sealed update epochs only: an unsealed epoch is already reported
    // in its own column, and the read-amplification signal this column
    // audits counts what resolve() actually merges (review fix —
    // counting crashed epochs twice over-reported the signal)
    val updEpochs = epochsOf(spark, dir, "label_updates")
      .count(e => !badSeq.contains(e))
    // epoch=0 is the folded base slot; only trigger epochs beyond it
    // amplify the winner joins
    val scoreEpochs = epochsOf(spark, dir, "doc_scores").count(_ > 0L)
    val action =
      if (bad > 0) "needs_repair"
      else if (updEpochs >= policy.epochsBar ||
          scoreEpochs >= policy.epochsBar) {
        compact(spark, dir); "compact"
      } else "none"
    val seq = graft.io.IndexHealth.nextSeq(spark, s"$dir/maintenance")
    val row = Seq((seq, healed, bad, updEpochs, scoreEpochs,
        policy.epochsBar, action))
      .toDF("seq", "healed", "unsealed_epochs", "update_epochs",
        "score_epochs", "epochs_bar", "action")
    row.write.mode("append").parquet(s"$dir/maintenance")
    row
  }

  /** The full maintenance ledger, seq-ordered. */
  def maintenanceLog(spark: SparkSession, dir: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/maintenance")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val schema = "seq long, healed string, unsealed_epochs int, " +
      "update_epochs int, score_epochs int, epochs_bar int, action string"
    if (!fs.exists(p)) spark.read.schema(schema).parquet()
    else spark.read.schema(schema).parquet(p.toString).orderBy("seq")
  }

  private def stagingPath(dir: String) =
    new org.apache.hadoop.fs.Path(s"$dir/_compact_staging")

  /** A crashed compact left a staging dir; every WRITER refuses until
    * [[recoverCompact]] adjudicates it — a write landing between the
    * _ready marker and the swap would be folded away (its update epoch
    * is deleted by the swap but absent from the staged base).
    */
  private def requireNoCompactStaging(spark: SparkSession, dir: String): Unit = {
    val st = stagingPath(dir)
    require(!st.getFileSystem(spark.sessionState.newHadoopConf()).exists(st),
      "compact staging present (crashed compact) — run " +
        "ClusterIndex.recoverCompact first")
  }

  /** The committed half of the compact swap. Hadoop FileSystem signals
    * failure by RETURNING FALSE (the IvfIndex.recoverRetrain doctrine):
    * every step is checked; on failure the staging and its _ready marker
    * stay intact and the swap stays re-runnable.
    */
  private def finishCompact(spark: SparkSession, dir: String): String = {
    val st = stagingPath(dir)
    val fs = st.getFileSystem(spark.sessionState.newHadoopConf())
    def must(ok: Boolean, what: String): Unit =
      if (!ok) throw new java.io.IOException(
        s"compact swap: $what failed — staging left intact, re-run recoverCompact")
    Seq("labels_base", "best_base").foreach { face =>
      val staged = new org.apache.hadoop.fs.Path(st, face)
      if (fs.exists(staged)) {
        val live = new org.apache.hadoop.fs.Path(s"$dir/$face")
        if (fs.exists(live)) must(fs.delete(live, true), s"delete live $face")
        must(fs.rename(staged, live), s"rename staged $face")
      }
    }
    val stagedScores = new org.apache.hadoop.fs.Path(st, "doc_scores_folded")
    if (fs.exists(stagedScores)) {
      // the staged fold snapshotted EVERY committed score epoch (single-
      // writer: no trigger runs during compact), so clearing the live
      // epoch dirs before the rename loses nothing; the staged dir was
      // SEALED (_graft_commit) before _ready, so the rename delivers a
      // committed epoch=0 on every committer config — _SUCCESS alone is
      // configuration-dependent (r17 ADVICE)
      val live = new org.apache.hadoop.fs.Path(s"$dir/doc_scores")
      if (fs.exists(live)) must(fs.delete(live, true), "clear doc_scores")
      must(fs.mkdirs(live), "recreate doc_scores")
      must(fs.rename(stagedScores,
        new org.apache.hadoop.fs.Path(live, "epoch=0")),
        "rename folded doc_scores")
    }
    // stale update epochs surviving a crash here are harmless: they
    // re-assert exactly the rows the folded base already carries
    // (latest-epoch-wins re-applies identical labels/winners; a dead
    // cluster's null tombstone re-drops it), so deleting them after the
    // base swap is safe in any crash window
    Seq("label_updates", "best_updates").foreach { face =>
      val p = new org.apache.hadoop.fs.Path(s"$dir/$face")
      if (fs.exists(p)) must(fs.delete(p, true), s"clear $face")
    }
    must(fs.delete(st, true), "clear staging")
    "completed"
  }

  /** Streaming face closing the whole near-dup loop: per trigger the
    * micro-batch is (1) paired against the standing [[LshIndex]] (cross-
    * corpus) and against itself (intra-batch) under the index's FROZEN
    * hash parameters, (2) appended to the LshIndex so later triggers
    * pair against it, and (3) its pairs folded into THIS clustering
    * (epoch = trigger epoch + 1, so a replayed trigger refuses via the
    * mode("error") ledger like every other graft streaming ingest).
    *
    * The complementary policy to [[LshIndex.streamingIngest]]: that face
    * REJECTS near-dups at the door (dedup-on-ingest — right when storage
    * is the constraint); this face keeps every doc and maintains the
    * transitive keep/drop state instead (cluster-on-ingest — right when
    * survivorship wants hindsight, e.g. [[Dedup.keepBest]] choosing the
    * best member AFTER all duplicates have arrived).
    *
    * `epochBase` (r17 ADVICE fix) maps trigger ids into the cluster
    * ledger: cluster epoch = epochBase + trigger epoch + 1. When batch
    * [[addPairs]] epochs preceded streaming, pass
    * [[maxRecordedEpoch]](clusterDir) — with the default 0 the first
    * trigger would collide with batch epoch 1 and the mode("error")
    * pairs write would kill the query. The base is FIXED for the
    * stream's lifetime: on a crash-recovery restart pass the SAME value
    * (the checkpoint resumes trigger ids, so the replayed trigger maps
    * to its original — sealed — epoch and is skipped; recomputing the
    * base at restart would shift the mapping and double-ingest).
    *
    * NO in-stream maintenance beat here, BY DESIGN (the one streaming
    * index without one — TextIndex/LshIndex/IvfIndex all carry
    * `maintainEvery`): [[maintain]] can return `needs_repair` as a
    * REPORT rather than an action (a crashed best-fold's winners need
    * the corpus' scores, which maintain must not invent), so a beat
    * wired in here could silently report-and-continue forever while the
    * operator believes maintenance is handled. A repair decision needs
    * an operator with the score corpus in hand — schedule
    * [[maintain]] out-of-band where its report is actually read.
    */
  def streamingIngest(spark: SparkSession, lshDir: String,
      clusterDir: String, stream: DataFrame, idCol: String,
      textCol: String, threshold: Double,
      epochBase: Long = 0L): org.apache.spark.sql.streaming.StreamingQuery = {
    require(!hasBest(spark, clusterDir),
      "best-enabled index — use streamingIngestWithBest so the " +
        "maintained winners stay consistent with the labels")
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        val epoch = epochBase + epochId + 1
        // RESTART IDEMPOTENCY: a re-delivered trigger (no streaming
        // checkpointLocation, or a recovery replay) whose epoch already
        // SEALED is skipped whole — without this, the LshIndex.append
        // inside the trigger would re-run before addPairs' ledger could
        // refuse, duplicating the batch's docs in the detection index
        if (!isSealed(spark, clusterDir, epoch))
          ingestTrigger(spark, lshDir, clusterDir, batch, epoch, idCol,
            textCol, threshold, None)
        ()
      }
      .start()
  }

  /** The shared per-trigger protocol of both streaming faces (r17
    * self-review: one body, not two drifting copies): pair detection
    * BEFORE the append (a doc must not pair with itself through the
    * index), then LshIndex append, then — best face only — the batch's
    * scores, then the clustering fold. A crash AFTER the append but
    * before the epoch seal re-runs the whole trigger: the re-append
    * duplicates doc rows in the LSH store — pair CORRECTNESS is
    * unaffected (candidates and pairs are distinct-ed, addPairs
    * canonicalizes), only doc counts inflate until an LshIndex.compact
    * folds them. Per-trigger checkpoints die with the trigger, not with
    * GC (the freeCheckpoint doctrine — a standing query must not
    * accumulate batch-scale blocks across triggers).
    */
  private def ingestTrigger(spark: SparkSession, lshDir: String,
      clusterDir: String, batch: DataFrame, epoch: Long, idCol: String,
      textCol: String, threshold: Double,
      best: Option[org.apache.spark.sql.Column]): Unit = {
    val b = batch.localCheckpoint()
    val m = LshIndex.loadMeta(spark, lshDir)
    val cross = LshIndex.probe(spark, lshDir, b, idCol, textCol,
        threshold)
      .select(col("index_id").as("id_a"), col("probe_id").as("id_b"))
    val intra = Dedup.minhashPairsExact(b, idCol, textCol,
        shingleN = m.shingleN, numHashes = m.numHashes,
        bands = m.bands, threshold = threshold, seed = m.seed)
      .select(col("id_a"), col("id_b"))
    val pairs = cross.unionByName(intra).localCheckpoint()
    LshIndex.append(spark, lshDir, b, idCol, textCol)
    best match {
      case None =>
        addPairs(spark, clusterDir, pairs, "id_a", "id_b", epoch)
      case Some(score) =>
        // scores: caller truth like pairs, committed BEFORE them (a
        // crashed epoch's winners must be re-derivable from recorded
        // state); a replayed trigger skips a committed score epoch and
        // clears a crashed partial so mode("error") can land
        val scoresDir = s"$clusterDir/doc_scores/epoch=$epoch"
        if (!graft.io.EpochCommit.committed(spark, scoresDir)) {
          graft.io.EpochCommit.clearPartial(spark, scoresDir)
          val sc = b.select(col(idCol).cast("long").as("id"),
            score.cast("double").as("score")).localCheckpoint()
          if (sc.count() > 0) {
            sc.write.mode("error").parquet(scoresDir)
            graft.io.EpochCommit.seal(spark, scoresDir)
          }
          Dedup.releasePlan(sc)
        }
        addPairsWithBest(spark, clusterDir, pairs, "id_a", "id_b",
          docScores(spark, clusterDir), "id", col("score"), epoch)
        ()
    }
    Seq(b, pairs).foreach(Dedup.releasePlan)
  }

  /** [[streamingIngest]] with the keep/drop DECISION maintained per
    * trigger — the streaming face of [[addPairsWithBest]]. Batch best
    * maintenance looks member scores up in the standing corpus table;
    * a stream HAS no corpus table (the index is the corpus), so each
    * trigger's scores (`score`, a Column over the batch, stored as
    * double) land in a `doc_scores/epoch=N` sidecar gated by the
    * [[graft.io.EpochCommit]] marker, and winner recomputation reads
    * the accumulated [[docScores]]. Write order per trigger: LshIndex
    * append → doc scores → addPairsWithBest (pairs → updates → best →
    * seal) — scores precede pairs so a crashed epoch's winners are
    * always re-derivable; after a crash INSIDE addPairsWithBest, run
    * [[repairWithBest]](dir, [[docScores]](dir), "id", col("score"))
    * before restarting the stream. `clusterDir` must be
    * [[buildWithBest]]-built; the resolved keep set is
    * [[resolveBest]](dir, docScores(dir), "id"). If the detection index
    * holds PRE-STREAM docs (a built corpus), their scores must be seeded
    * via [[seedScores]] first — setup refuses otherwise (an unscored
    * member would silently drop out of a merged cluster's winner max).
    */
  def streamingIngestWithBest(spark: SparkSession, lshDir: String,
      clusterDir: String, stream: DataFrame, idCol: String,
      textCol: String, threshold: Double,
      score: org.apache.spark.sql.Column,
      epochBase: Long = 0L): org.apache.spark.sql.streaming.StreamingQuery = {
    require(hasBest(spark, clusterDir),
      "not a best-enabled index — build with buildWithBest, or use streamingIngest")
    // SCORE COVERAGE (second-review finding): winner recomputation reads
    // ONLY the accumulated docScores, so every doc already probe-able in
    // the detection index must have a stored score BEFORE a streamed
    // near-dup can merge with it — an unscored member silently drops out
    // of the struct-max and the wrong doc survives. One bounded setup
    // job; the per-trigger sides are covered by construction (each
    // batch's scores commit before its addPairsWithBest).
    val unscored = LshIndex.liveIds(spark, lshDir)
      .join(docScores(spark, clusterDir), Seq("id"), "left_anti")
      .limit(1).count()
    require(unscored == 0L,
      "detection-index docs lack doc_scores coverage — the pre-stream " +
        "corpus's scores are not in this cluster index; call " +
        "ClusterIndex.seedScores(clusterDir, corpusDocs, idCol, score) " +
        "before streaming (winner recomputation reads docScores only)")
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        val epoch = epochBase + epochId + 1
        if (!isSealed(spark, clusterDir, epoch))
          ingestTrigger(spark, lshDir, clusterDir, batch, epoch, idCol,
            textCol, threshold, Some(score))
        ()
      }
      .start()
  }

  /** Every streamed doc's (id, score) accumulated by
    * [[streamingIngestWithBest]] — the docs frame its winner lookups
    * and [[resolveBest]] read. COMMITTED epochs only (r17 self-review):
    * a crash mid-scores-write leaves a partial epoch dir that must
    * never feed a reader — torn files or a row subset would surface as
    * spurious keep rows matching no committed state. Empty (schema'd)
    * when nothing committed.
    */
  /** One-time corpus-score seeding for [[streamingIngestWithBest]] over
    * an index whose pre-stream corpus is non-empty (a [[buildWithBest]]
    * corpus, or docs already in the detection LshIndex): the stream's
    * winner recomputation reads ONLY the accumulated [[docScores]], so
    * every doc a probe can pair against must have its score stored
    * before streaming starts. Writes the corpus (id, score) as
    * doc_scores/epoch=0 — trigger epochs start at 1, so the slot is
    * reserved for the seed (and for [[compact]]'s fold). Idempotent: a
    * committed seed is left alone; a crashed partial is cleared and
    * rewritten (the ingestTrigger scores discipline).
    */
  def seedScores(spark: SparkSession, dir: String, docs: DataFrame,
      idCol: String, score: org.apache.spark.sql.Column): Unit = {
    requireNoCompactStaging(spark, dir)
    val scoresDir = s"$dir/doc_scores/epoch=0"
    if (graft.io.EpochCommit.committed(spark, scoresDir)) return
    graft.io.EpochCommit.clearPartial(spark, scoresDir)
    docs.select(col(idCol).cast("long").as("id"),
        score.cast("double").as("score"))
      .write.mode("error").parquet(scoresDir)
    graft.io.EpochCommit.seal(spark, scoresDir)
  }

  /** True iff at least one doc_scores epoch carries a commit proof —
    * the [[compact]] fold gate (a merely-EXISTING epoch dir may be a
    * crashed partial that must heal in place, not be folded away).
    */
  private def hasCommittedScores(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/doc_scores")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.exists(p) && fs.listStatus(p).exists(s =>
      s.isDirectory && s.getPath.getName.startsWith("epoch=") &&
        graft.io.EpochCommit.committed(spark, s.getPath.toString))
  }

  def docScores(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val empty = Seq.empty[(Long, Double)].toDF("id", "score")
    val p = new org.apache.hadoop.fs.Path(s"$dir/doc_scores")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) empty
    else {
      val committedDirs = fs.listStatus(p).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("epoch="))
        .map(_.getPath.toString)
        .filter(graft.io.EpochCommit.committed(spark, _))
      if (committedDirs.isEmpty) empty
      else spark.read.schema("id long, score double")
        .parquet(committedDirs: _*)
        .select(col("id"), col("score"))
    }
  }

  /** Highest epoch the pairs ledger has recorded (0 = build only; -1 =
    * no index yet) — the `epochBase` a caller passes to
    * [[streamingIngest]] when batch [[addPairs]] epochs precede it.
    */
  def maxRecordedEpoch(spark: SparkSession, dir: String): Long = {
    val es = epochsOf(spark, dir, "pairs")
    if (es.isEmpty) -1L else es.max
  }

  // explicit schemas: an empty batch writes a part-file-less dir, and
  // schema INFERENCE over it would throw — declared schemas make empty
  // epochs (and an empty build) first-class states
  private def readPairs(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema("pa long, pb long").parquet(s"$dir/pairs")
      .select(col("pa"), col("pb"))

  private def updatesOpt(spark: SparkSession, dir: String): Option[DataFrame] =
    updatesFace(spark, dir, "label_updates", "member_id long, cluster_id long")

  /** The optional merge-on-read updates face (one reader for both the
    * label and the best views — second-review dedup): explicit schema so
    * an absent-part-file epoch dir never trips inference.
    */
  private def updatesFace(spark: SparkSession, dir: String, face: String,
      schema: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/$face")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) Some(spark.read.schema(schema).parquet(p.toString))
    else None
  }

  private def canonical(pairs: DataFrame, aCol: String, bCol: String): DataFrame =
    pairs.select(
        least(col(aCol).cast("long"), col(bCol).cast("long")).as("pa"),
        greatest(col(aCol).cast("long"), col(bCol).cast("long")).as("pb"))
      .filter(col("pa") =!= col("pb"))
      .distinct()
}
