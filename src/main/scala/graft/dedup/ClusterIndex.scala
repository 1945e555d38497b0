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
      aCol: String, bCol: String, epoch: Int): Long = {
    require(epoch > 0, "epoch 0 is the build; batches start at 1")
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
    // only genuine changes land in the epoch (a no-op batch writes an
    // empty epoch dir — present for the audit trail, zero rows)
    val changed = relabeled.join(labels.select(
        col("member_id").as("m0"), col("cluster_id").as("c0")),
        col("member_id") === col("m0"), "left_outer")
      .filter(col("c0").isNull || col("c0") =!= col("cluster_id"))
      .select(col("member_id"), col("cluster_id"))
      .localCheckpoint(true)
    val n = changed.count()
    // an all-empty-partition parquet write leaves a schema-less dir that
    // breaks partition-discovery reads — a no-op batch records only its
    // pairs (whose mode("error") still rejects an epoch replay)
    if (n > 0)
      changed.write.mode("error").parquet(s"$dir/label_updates/epoch=$epoch")
    np.write.mode("error").parquet(s"$dir/pairs/epoch=$epoch")
    Seq(np, labels, affected, relabeled, changed).foreach(Dedup.releasePlan)
    n
  }

  /** Current labels: base overlaid with updates, latest epoch wins per
    * member (merge-on-read; one small struct-max aggregate).
    */
  def resolve(spark: SparkSession, dir: String): DataFrame = {
    val base = spark.read.schema("member_id long, cluster_id long")
      .parquet(s"$dir/labels_base")
      .select(col("member_id"), col("cluster_id"), lit(0L).as("ep"))
    val upd = updatesOpt(spark, dir).map(_.select(col("member_id"),
      col("cluster_id"), (col("epoch").cast("long") + 1L).as("ep")))
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
    */
  def streamingIngest(spark: SparkSession, lshDir: String,
      clusterDir: String, stream: DataFrame, idCol: String,
      textCol: String,
      threshold: Double): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
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
        // itself through the index), append BEFORE clustering (a crash
        // between the two leaves a detectable gap: pairs present for an
        // epoch the cluster ledger lacks — re-derivable; the reverse
        // order would lose detection state silently)
        val pairs = cross.unionByName(intra).localCheckpoint()
        LshIndex.append(spark, lshDir, b, idCol, textCol)
        addPairs(spark, clusterDir, pairs, "id_a", "id_b",
          epoch = epochId.toInt + 1)
        ()
      }
      .start()

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
