package graft.dedup

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The persistent LSH index must (1) discover exactly the cross pairs the
  * inline banded path finds, (2) append without rewriting any existing
  * index file (frozen hash parameters), and (3) keep appended docs
  * probe-visible — the properties that make it a standing corpus index
  * instead of a per-run rehash.
  */
class LshIndexSpec extends AnyFunSuite with SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private lazy val docs = graft.ops.Tables.documents(spark, d)

  // standing corpus = even ids; nightly batch = odd ids
  private lazy val corpus = docs.filter(col("doc_id") % 2 === 0)
  private lazy val batch = docs.filter(col("doc_id") % 2 === 1)

  private lazy val dir = {
    val t = Files.createTempDirectory("lsh_index").toString + "/idx"
    LshIndex.build(corpus, "doc_id", "text", t)
    t
  }

  test("probe equals the inline banded path's cross pairs") {
    val fromIndex = LshIndex.probe(spark, dir, batch, "doc_id", "text",
      threshold = 0.3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // inline one-shot over the union, restricted to (even, odd) pairs —
    // same hash family, so the index path must find exactly these
    val inline = Dedup.minhashPairsExact(docs, "doc_id", "text",
      shingleN = 2, numHashes = 64, bands = 16, threshold = 0.3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .flatMap { case (a, b, j) =>
        if (a % 2 == 0 && b % 2 == 1) Some((a, b, j))
        else if (a % 2 == 1 && b % 2 == 0) Some((b, a, j))
        else None
      }.toSet
    assert(fromIndex === inline)
    assert(fromIndex.nonEmpty, "fixture produced no cross pairs — vacuous")
    // the declarative lint twin computes the same pairs
    val unmaterialized = LshIndex.probe(spark, dir, batch, "doc_id", "text",
      threshold = 0.3, materialize = false).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(unmaterialized === fromIndex)
  }

  test("a small probe pushes its band hashes into the postings scan") {
    val small = batch.limit(20)
    val plan = LshIndex.probe(spark, dir, small, "doc_id", "text", 0.3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("In(band_hash"),
      s"coarse band-hash IN must push into the postings scan:\n$plan")
  }

  test("append: frozen params, no rewrite of existing files, visibility") {
    val t = Files.createTempDirectory("lsh_append").toString + "/idx"
    val third = docs.filter(col("doc_id") % 4 === 1)
    LshIndex.build(corpus, "doc_id", "text", t)
    def files(p: String) = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
        else Seq(f)
      walk(new java.io.File(p)).filter(_.getName.endsWith(".parquet"))
        .map(f => s"${f.getPath}@${f.lastModified}@${f.length}").toSet
    }
    val before = files(s"$t/postings") ++ files(s"$t/docs")
    val n = LshIndex.append(spark, t, third, "doc_id", "text")
    assert(n > 0 && n <= third.count())
    // index maintenance is append-only: every pre-existing posting and
    // doc file byte-identical (the DV no-rewrite doctrine)
    assert((files(s"$t/postings") ++ files(s"$t/docs")).intersect(before) === before)

    // one-shot equivalence: an index built in a single pass over
    // corpus + appended third answers a probe identically
    val t2 = Files.createTempDirectory("lsh_oneshot").toString + "/idx"
    LshIndex.build(corpus.unionByName(third), "doc_id", "text", t2)
    val probeSet = docs.filter(col("doc_id") % 4 === 3)
    def res(p: String) = LshIndex.probe(spark, p, probeSet, "doc_id", "text",
      threshold = 0.3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val viaAppend = res(t)
    assert(viaAppend === res(t2))

    // visibility: appended (%4==1) docs surface as index-side partners
    assert(viaAppend.exists(_._1 % 4 == 1),
      s"no appended doc surfaced among ${viaAppend.size} pairs")
  }

  test("streaming ingest: index-as-state dedups across triggers") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val t = Files.createTempDirectory("lsh_stream").toString
    val idxDir = s"$t/idx"
    val admDir = s"$t/adm"
    LshIndex.build(
      Seq((1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
        .toDF("doc_id", "text"),
      "doc_id", "text", idxDir)

    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = LshIndex.streamingIngest(spark, idxDir, admDir,
      stream.toDF().toDF("doc_id", "text"), "doc_id", "text",
      threshold = 0.5)
    try {
      // trigger 1: near-dup of the SEEDED doc (rejected), one novel doc
      // (admitted), and an intra-batch near-dup pair (lower id wins)
      stream.addData(
        (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda"),
        (11L, "one two three four five six seven eight nine ten"),
        (12L, "one two three four five six seven eight nine ten eleven"))
      q.processAllAvailable()
      val e0 = spark.read.parquet(s"$admDir/epoch=0")
        .select("doc_id").as[Long].collect().toSet
      assert(e0 === Set(11L), s"epoch 0 admitted $e0")

      // trigger 2: near-dup of a doc ADMITTED IN TRIGGER 1 — rejected
      // through the index (the cross-trigger state), plus a novel doc
      stream.addData(
        (20L, "one two three four five six seven eight nine ten twelve"),
        (21L, "red orange yellow green blue indigo violet pink brown black"))
      q.processAllAvailable()
      val e1 = spark.read.parquet(s"$admDir/epoch=1")
        .select("doc_id").as[Long].collect().toSet
      assert(e1 === Set(21L), s"epoch 1 admitted $e1")

      // the index grew by exactly the admitted docs
      val ids = spark.read.parquet(s"$idxDir/docs")
        .select("id").as[Long].collect().toSet
      assert(ids === Set(1L, 11L, 21L))
    } finally q.stop()
  }

  test("streaming ingest maintains its own index: the maintenance beat " +
      "fires every N triggers and compacts the fragmentation appends create") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val t = Files.createTempDirectory("lsh_stream_mnt").toString
    val idxDir = s"$t/idx"
    LshIndex.build(
      Seq((1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
        .toDF("doc_id", "text"),
      "doc_id", "text", idxDir)
    val baseFiles = graft.io.IndexHealth.dataFileCount(spark, s"$idxDir/postings")

    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    // filesBar below a single post-append count: every beat must compact
    val q = LshIndex.streamingIngest(spark, idxDir, s"$t/adm",
      stream.toDF().toDF("doc_id", "text"), "doc_id", "text",
      threshold = 0.5, maintainEvery = 2,
      policy = LshIndex.MaintenancePolicy(filesBar = baseFiles))
    try {
      stream.addData((11L, "one two three four five six seven eight nine ten"))
      q.processAllAvailable() // epoch 0: no beat ((0+1) % 2 != 0)
      assert(LshIndex.maintenanceLog(spark, idxDir).count() === 0L)
      stream.addData((21L, "red orange yellow green blue indigo violet pink"))
      q.processAllAvailable() // epoch 1: beat fires, fragmentation over bar
      val log = LshIndex.maintenanceLog(spark, idxDir).collect()
      assert(log.length === 1 && log(0).getAs[String]("action") === "compact",
        s"beat at epoch 1 must compact: ${log.toSeq}")
      assert(log(0).getAs[Int]("post_files") <=
          log(0).getAs[Int]("postings_files"),
        "compact must not grow the postings file count")
      // the compacted index still serves: all three docs live
      assert(spark.read.parquet(s"$idxDir/docs")
        .select("id").as[Long].collect().toSet === Set(1L, 11L, 21L))
    } finally q.stop()
  }

  test("delete: tombstoned docs leave probe results; compact folds them") {
    import spark.implicits._
    val t = Files.createTempDirectory("lsh_del").toString + "/idx"
    LshIndex.build(corpus, "doc_id", "text", t)
    val probeSet = batch
    val full = LshIndex.probe(spark, t, probeSet, "doc_id", "text", 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full.nonEmpty, "fixture produced no pairs — vacuous")
    val victim = full.head._1
    LshIndex.delete(spark, t, Seq(victim).toDF("doc_id"), "doc_id")
    val after = LshIndex.probe(spark, t, probeSet, "doc_id", "text", 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after === full.filterNot(_._1 == victim))
    val (_, folded) = LshIndex.compact(spark, t)
    assert(folded === 1)
    assert(!new java.io.File(s"$t/tombstones").exists())
    assert(LshIndex.probe(spark, t, probeSet, "doc_id", "text", 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet === after)
  }

  test("maintain: spine-conditioned dead ratio; acts over the bar; " +
      "unknown-id deletes don't count") {
    import spark.implicits._
    val t = Files.createTempDirectory("lsh_mnt").toString + "/idx"
    LshIndex.build(docs, "doc_id", "text", t)
    val spineN = spark.read.parquet(s"$t/docs").count()

    // delete a set of ids that do NOT exist in the index: the dead
    // ratio must stay 0 (a tombstone nobody stores costs nothing at
    // probe time), even though the sidecar is non-empty
    LshIndex.delete(spark, t, (1000000L to 1000050L).toSeq.toDF("doc_id"), "doc_id")
    val r0 = LshIndex.maintain(spark, t).collect()(0)
    assert(r0.getAs[Double]("dead_ratio") === 0.0)
    assert(r0.getAs[String]("action") === "none")

    // tombstone enough real docs to cross the bar; folded counts the
    // whole sidecar (including the unknown ids), survivors the spine
    val dead = docs.filter(col("doc_id") % 11 === 0 || col("doc_id") % 7 === 0)
      .select("doc_id")
    LshIndex.delete(spark, t, dead, "doc_id")
    val deadInSpine = spark.read.parquet(s"$t/docs")
      .join(dead.withColumnRenamed("doc_id", "id"), Seq("id"), "left_semi")
      .count()
    val r1 = LshIndex.maintain(spark, t).collect()(0)
    assert(r1.getAs[String]("action") === "compact")
    assert(r1.getAs[Double]("dead_ratio") ===
      math.rint(deadInSpine.toDouble / spineN * 1e6) / 1e6)
    assert(r1.getAs[Long]("survivors") === spineN - deadInSpine)
    assert(r1.getAs[Long]("folded") === dead.count() + 51L)
    assert(!new java.io.File(s"$t/tombstones").exists())

    // ledger: two seq-ordered rows; a third call observes the floor
    val r2 = LshIndex.maintain(spark, t).collect()(0)
    assert(r2.getAs[String]("action") === "none")
    assert(LshIndex.maintenanceLog(spark, t).collect()
      .map(r => (r.getAs[Long]("seq"), r.getAs[String]("action"))).toSeq ===
      Seq((0L, "none"), (1L, "compact"), (2L, "none")))
  }

  test("band stats report covers every band; postings range-laid-out") {
    val stats = LshIndex.bandStats(spark, dir).collect()
    assert(stats.map(_.getInt(0)).toSet === (0 until 16).toSet)
    assert(stats.forall(_.getLong(2) >= 1L))
    // the write path's range layout: each postings file's band_hash span
    // is a narrow slice, so probe-side min/max pruning has teeth; weak
    // proxy testable locally — files sorted by the write, multiple files
    val parts = new java.io.File(s"$dir/postings").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(parts >= 1)
  }

  test("streaming ingest: a crashed partial admissions epoch is healed " +
      "on replay (seal = _SUCCESS, not dir existence)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val t = Files.createTempDirectory("lsh_crash").toString
    val idxDir = s"$t/idx"
    val admDir = s"$t/adm"
    LshIndex.build(
      Seq((1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
        .toDF("doc_id", "text"),
      "doc_id", "text", idxDir)
    // simulate a first attempt that crashed mid-admissions-write: the
    // epoch dir exists (Spark creates it at job setup, and task output
    // may be present) but the commit marker never landed — the r17
    // ADVICE scenario where dir-existence gating would skip the replay
    // whole and leave the ledger permanently wrong for this epoch
    Seq((99L, "stale partial row")).toDF("doc_id", "text")
      .withColumn("epoch", lit(0L)).write.parquet(s"$admDir/epoch=0")
    assert(new java.io.File(s"$admDir/epoch=0", "_SUCCESS").delete())

    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = LshIndex.streamingIngest(spark, idxDir, admDir,
      stream.toDF().toDF("doc_id", "text"), "doc_id", "text",
      threshold = 0.5)
    try {
      stream.addData((11L, "one two three four five six seven eight nine ten"))
      q.processAllAvailable()
      // the replayed trigger was NOT skipped: partial cleared, whole
      // trigger re-run, epoch committed with the true admissions
      val e0 = spark.read.parquet(s"$admDir/epoch=0")
        .select("doc_id").as[Long].collect().toSet
      assert(e0 === Set(11L), s"epoch 0 admissions $e0")
      assert(new java.io.File(s"$admDir/epoch=0", "_SUCCESS").exists())
      val ids = spark.read.parquet(s"$idxDir/docs")
        .select("id").as[Long].collect().toSet
      assert(ids === Set(1L, 11L))
    } finally q.stop()
  }
}
