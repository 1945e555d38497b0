package graft.quality

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** DSIR importance resampling: target-like docs must outrank target-unlike
  * ones on planted vocabulary, scores must be bit-identical under
  * repartitioning (the decimal-sum doctrine), smoothing must keep every
  * score finite, and zero-gram docs must be excluded, not scored 0.
  */
class DsirSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // planted geometry: targets speak "alpha beta gamma", half the raw pool
  // mimics them, the other half speaks "omega sigma tau"
  private def planted = {
    val target = (0L until 20L).map(i => (i, "alpha beta gamma alpha beta"))
    val mimics = (100L until 110L).map(i => (i, "alpha beta gamma"))
    val others = (200L until 210L).map(i => (i, "omega sigma tau omega"))
    (target ++ mimics ++ others).toDF("id", "text")
  }

  private def isTarget = col("id") < 100L

  test("target-like raw docs outrank target-unlike ones") {
    val scores = Dsir.importanceScores(planted, "id", "text", isTarget,
      buckets = 64).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores.keySet === ((100L until 110L) ++ (200L until 210L)).toSet,
      "exactly the raw pool is scored")
    val mimicMin = (100L until 110L).map(scores).min
    val otherMax = (200L until 210L).map(scores).max
    assert(mimicMin > otherMax,
      s"every mimic must outrank every non-mimic: $mimicMin <= $otherMax")
    assert(scores.values.forall(s => !s.isNaN && !s.isInfinite),
      "smoothing keeps every score finite")
  }

  test("selectTopK is the deterministic (score desc, id) head") {
    val top = Dsir.selectTopK(planted, "id", "text", isTarget, k = 10,
      buckets = 64).collect().map(_.getLong(0))
    assert(top.toSet === (100L until 110L).toSet,
      s"the 10 mimics are the top-10: ${top.toSeq}")
  }

  test("scores are bit-identical under repartitioning") {
    val base = Dsir.importanceScores(planted, "id", "text", isTarget,
      buckets = 64).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val shuffled = Dsir.importanceScores(planted.repartition(13), "id",
      "text", isTarget, buckets = 64).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(base === shuffled)
  }

  test("zero-gram docs are excluded, not scored zero") {
    val withEmpty = planted.union(
      Seq((300L, ""), (301L, null.asInstanceOf[String])).toDF("id", "text"))
    val scored = Dsir.importanceScores(withEmpty, "id", "text", isTarget,
      buckets = 64).collect().map(_.getLong(0)).toSet
    assert(!scored.contains(300L) && !scored.contains(301L))
  }

  test("gumbel resampling: deterministic given the seed, noise-shifted " +
      "keys, different seeds draw differently") {
    val a = Dsir.selectGumbel(planted, "id", "text", isTarget, k = 15,
      seed = 42L, buckets = 64).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val b = Dsir.selectGumbel(planted.repartition(9), "id", "text",
      isTarget, k = 15, seed = 42L, buckets = 64).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(a.toSeq === b.toSeq, "same seed + corpus => identical draw")
    assert(a.length === 15)
    // key = score + Gumbel noise: never equal to the raw score
    assert(a.forall { case (_, s, key) => key != s })
    val c = Dsir.selectGumbel(planted, "id", "text", isTarget, k = 15,
      seed = 7L, buckets = 64).collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
    assert(c.map(_._2).toSet !== a.map(_._3).toSet,
      "a different seed must draw different keys")
  }

  test("frozen-stats serving face: scoreWith(ratios) reproduces the " +
      "in-corpus trainer exactly on the raw pool") {
    val inCorpus = Dsir.importanceScores(planted, "id", "text", isTarget,
      buckets = 64).collect().map(_.toSeq).toSet
    val frozen = Dsir.ratios(planted, "id", "text", isTarget, buckets = 64)
      .localCheckpoint() // freeze: serving must not re-derive the table
    val served = Dsir.scoreWith(planted.filter(!isTarget), "id", "text",
      frozen, buckets = 64).collect().map(_.toSeq).toSet
    assert(served === inCorpus,
      "serving against the frozen ratio table must equal in-corpus scores")
  }

  test("frozen-stats serving face is stream == batch: scoring is a pure " +
      "per-doc computation against broadcast state, so trigger chopping " +
      "cannot matter") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val frozen = Dsir.ratios(planted, "id", "text", isTarget, buckets = 64)
      .localCheckpoint()
    val serveRows = planted.filter(!isTarget).as[(Long, String)].collect()
    val batch = Dsir.scoreWith(planted.filter(!isTarget), "id", "text",
      frozen, buckets = 64).collect().map(_.toSeq).toSet
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val sink = new java.util.concurrent.ConcurrentLinkedQueue[Seq[Any]]()
    val q = stream.toDF().toDF("id", "text").writeStream
      .outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        Dsir.scoreWith(b, "id", "text", frozen, buckets = 64)
          .collect().foreach(r => sink.add(r.toSeq))
        ()
      }.start()
    try {
      stream.addData(serveRows.take(7): _*)
      q.processAllAvailable()
      stream.addData(serveRows.slice(7, 16): _*)
      q.processAllAvailable()
      stream.addData(serveRows.drop(16): _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(sink.toArray.map(_.asInstanceOf[Seq[Any]]).toSet === batch,
      "streamed serving must equal the batch twin exactly")
  }

  test("repeating target phrasing raises the score (per-occurrence sums)") {
    val docs = ((0L until 20L).map(i => (i, "alpha beta")) ++
      Seq((100L, "alpha beta"), (101L, "alpha beta alpha beta")))
      .toDF("id", "text")
    val s = Dsir.importanceScores(docs, "id", "text", isTarget, buckets = 64)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(s(101L) > s(100L))
  }
}
