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

  /** Fold a delta pair batch into the standing clustering. Returns the
    * number of members relabeled (0 = the batch only repeated known
    * pairs inside existing clusters — still recorded, labels unchanged).
    */
  def addPairs(spark: SparkSession, dir: String, newPairs: DataFrame,
      aCol: String, bCol: String, epoch: Long): Long = {
    require(epoch > 0, "epoch 0 is the build; batches start at 1")
    val bad = unsealedEpochs(spark, dir)
    require(bad.isEmpty,
      s"unsealed epochs $bad (crashed addPairs) — run ClusterIndex.repair first")
    val np = canonical(newPairs, aCol, bCol).localCheckpoint(true)
    val labels = resolve(spark, dir).localCheckpoint(true)
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
    val stored = readPairs(spark, dir)
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
    val n = changed.count()
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
    np.write.mode("error").parquet(s"$dir/pairs/epoch=$epoch")
    if (n > 0)
      changed.write.mode("error").parquet(s"$dir/label_updates/epoch=$epoch")
    seal(spark, dir, epoch)
    Seq(np, labels, affected, relabeled, changed).foreach(Dedup.releasePlan)
    n
  }

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
  def unsealedEpochs(spark: SparkSession, dir: String): Seq[Long] = {
    val pairsP = new org.apache.hadoop.fs.Path(s"$dir/pairs")
    val fs = pairsP.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(pairsP)) return Nil
    fs.listStatus(pairsP).toSeq
      .map(_.getPath.getName)
      .collect { case s if s.startsWith("epoch=") => s.drop(6).toLong }
      .filter(e => e > 0 && !isSealed(spark, dir, e))
      .sorted
  }

  /** Recover from a crashed addPairs: for each unsealed epoch, drop any
    * partial update dir, re-derive that epoch's labels FROM ITS RECORDED
    * PAIRS (labels are always a function of pairs), and seal. Safe to
    * run any time; a no-op on a healthy index.
    */
  def repair(spark: SparkSession, dir: String): Seq[Long] = {
    val bad = unsealedEpochs(spark, dir)
    bad.foreach { e =>
      val upd = new org.apache.hadoop.fs.Path(s"$dir/label_updates/epoch=$e")
      val fs = upd.getFileSystem(spark.sessionState.newHadoopConf())
      fs.delete(upd, true) // partial or absent either way
      // replay epoch e's labeling against the state BELOW e: resolve()
      // over updates < e plus base (epochs are repaired in order, so
      // earlier repairs are already sealed when later ones replay)
      val np = spark.read.schema("pa long, pb long")
        .parquet(s"$dir/pairs/epoch=$e").localCheckpoint(true)
      val labels = resolveBelow(spark, dir, e).localCheckpoint(true)
      val eps = np.select(col("pa").as("v"))
        .union(np.select(col("pb").as("v"))).distinct()
      val affected = eps.join(labels, col("v") === col("member_id"), "left_outer")
        .select(coalesce(col("cluster_id"), col("v")).as("albl")).distinct()
      val stored = spark.read.schema("pa long, pb long")
        .parquet(s"$dir/pairs")
        .filter(col("epoch") < e)
        .select(col("pa"), col("pb"))
        .join(labels, col("pa") === col("member_id"), "left_outer")
        .select(col("pa"), col("pb"),
          coalesce(col("cluster_id"), col("pa")).as("lbl"))
        .join(affected, col("lbl") === col("albl"), "left_semi")
        .select(col("pa"), col("pb"))
      val relabeled = Dedup.connectedComponents(stored.union(np), "pa", "pb")
      val changed = relabeled.join(labels.select(
          col("member_id").as("m0"), col("cluster_id").as("c0")),
          col("member_id") === col("m0"), "left_outer")
        .filter(col("c0").isNull || col("c0") =!= col("cluster_id"))
        .select(col("member_id"), col("cluster_id"))
        .localCheckpoint(true)
      if (changed.count() > 0)
        changed.write.mode("error").parquet(s"$dir/label_updates/epoch=$e")
      seal(spark, dir, e)
      Seq(np, labels, changed).foreach(Dedup.releasePlan)
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
    val folded = resolve(spark, dir).localCheckpoint(true)
    folded.write.mode("overwrite").parquet(s"$dir/labels_base")
    val p = new org.apache.hadoop.fs.Path(s"$dir/label_updates")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(p, true)
    Dedup.releasePlan(folded)
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
    */
  def streamingIngest(spark: SparkSession, lshDir: String,
      clusterDir: String, stream: DataFrame, idCol: String,
      textCol: String, threshold: Double,
      epochBase: Long = 0L): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        val epoch = epochBase + epochId + 1
        // RESTART IDEMPOTENCY: a re-delivered trigger (no streaming
        // checkpointLocation, or a recovery replay) whose epoch already
        // SEALED is skipped whole — without this, the LshIndex.append
        // below would re-run before addPairs' ledger could refuse,
        // duplicating the batch's docs in the detection index
        if (!isSealed(spark, clusterDir, epoch)) {
          val b = batch.localCheckpoint()
          val m = LshIndex.loadMeta(spark, lshDir)
          val cross = LshIndex.probe(spark, lshDir, b, idCol, textCol,
              threshold)
            .select(col("index_id").as("id_a"), col("probe_id").as("id_b"))
          val intra = Dedup.minhashPairsExact(b, idCol, textCol,
              shingleN = m.shingleN, numHashes = m.numHashes,
              bands = m.bands, threshold = threshold, seed = m.seed)
            .select(col("id_a"), col("id_b"))
          // pair detection BEFORE the append (a doc must not pair with
          // itself through the index). A crash AFTER the append but
          // before the seal re-runs the whole trigger: the re-append
          // duplicates doc rows in the LSH store — pair CORRECTNESS is
          // unaffected (candidates and pairs are distinct-ed, addPairs
          // canonicalizes), only doc counts inflate until an
          // LshIndex.compact folds them
          val pairs = cross.unionByName(intra).localCheckpoint()
          LshIndex.append(spark, lshDir, b, idCol, textCol)
          addPairs(spark, clusterDir, pairs, "id_a", "id_b", epoch)
          // per-trigger checkpoints die with the trigger, not with GC
          // (the freeCheckpoint doctrine — a standing query must not
          // accumulate batch-scale blocks across triggers)
          Seq(b, pairs).foreach(Dedup.releasePlan)
        }
        ()
      }
      .start()

  /** Highest epoch the pairs ledger has recorded (0 = build only; -1 =
    * no index yet) — the `epochBase` a caller passes to
    * [[streamingIngest]] when batch [[addPairs]] epochs precede it.
    */
  def maxRecordedEpoch(spark: SparkSession, dir: String): Long = {
    val pairsP = new org.apache.hadoop.fs.Path(s"$dir/pairs")
    val fs = pairsP.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(pairsP)) return -1L
    val es = fs.listStatus(pairsP).toSeq.map(_.getPath.getName)
      .collect { case s if s.startsWith("epoch=") => s.drop(6).toLong }
    if (es.isEmpty) -1L else es.max
  }

  // explicit schemas: an empty batch writes a part-file-less dir, and
  // schema INFERENCE over it would throw — declared schemas make empty
  // epochs (and an empty build) first-class states
  private def readPairs(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema("pa long, pb long").parquet(s"$dir/pairs")
      .select(col("pa"), col("pb"))

  private def updatesOpt(spark: SparkSession, dir: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/label_updates")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p))
      Some(spark.read.schema("member_id long, cluster_id long")
        .parquet(p.toString))
    else None
  }

  private def canonical(pairs: DataFrame, aCol: String, bCol: String): DataFrame =
    pairs.select(
        least(col(aCol).cast("long"), col(bCol).cast("long")).as("pa"),
        greatest(col(aCol).cast("long"), col(bCol).cast("long")).as("pb"))
      .filter(col("pa") =!= col("pb"))
      .distinct()
}
