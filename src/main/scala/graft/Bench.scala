package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Timed repetitions per query; the noise band on this box is up to
    // ±2.3x on multi-second queries, so we report the median of N runs.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    // Load sentinel: a fixed single-threaded FMA loop whose wall time
    // depends ONLY on how much CPU this box gives one thread. Timed before
    // warmup, between the two query halves, and after the last query; if
    // the box is quiet all three sit within a few percent of each other,
    // and external load (the r8 contamination: byte-identical queries
    // reporting 16x) shows up as inflated sentinel values — making a
    // contaminated run self-evident from the JSON alone, no re-run needed.
    def calibrate(): Double = {
      val t0 = System.nanoTime()
      var x = 1.0
      var i = 0
      while (i < 100000000) { x = x * 1.0000000001 + 1e-12; i += 1 }
      // consume x so the loop cannot be dead-code-eliminated
      if (x.isNaN) System.err.println("unreachable")
      (System.nanoTime() - t0) / 1e9
    }
    calibrate() // untimed: first run pays JIT compilation of the loop
    def cal3(v: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val calPre = calibrate()
    // Untimed warmup at sf0.001: first execution of each plan shape pays
    // JIT + whole-stage-codegen class compilation (measured 8-20x on the
    // victim query); the cheap SF compiles those once. Target-SF plan
    // finalization (AQE broadcast-vs-shuffle flips, coalesced stage shapes)
    // is absorbed by the FIRST timed rep when reps >= 3 (the median never
    // reports it); with reps < 3 an extra UNTIMED target-SF rep absorbs it
    // instead, so a reps=1 quick run doesn't report the inflated first rep.
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (_, fn) =>
      try { fn(spark, "/root/testdata/sf0.001").count(); () }
      catch { case _: Throwable => () }
    }
    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      (System.nanoTime() - t0) / 1e9
    }
    // Median with even-count averaging: for reps=2 the plain upper-middle
    // pick would report the max (i.e. the AQE-inflated first rep).
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
    }
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    var calMid = -1.0
    val resultsFull = ordered.zipWithIndex.map { case ((name, fn), idx) =>
      if (idx == ordered.size / 2) calMid = calibrate()
      val timed =
        if (reps >= 3) (1 to reps).map(_ => timeOnce(fn))
        else { timeOnce(fn); (1 to reps).map(_ => timeOnce(fn)) }
      // median = the headline (robust to one AQE-inflated rep); min = the
      // box's best case, immune to transient load spikes WITHIN a rep set —
      // a real regression moves BOTH, contamination moves only the median.
      (name, median(timed), timed.min)
    }
    if (calMid < 0) calMid = calibrate()
    val calPost = calibrate()
    val results = resultsFull.map { case (n, med, _) => (n, med) }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val qsMin = resultsFull.map { case (k, _, mn) => s"\"" + k + "\":" + mn }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val totalMin = if (resultsFull.nonEmpty) resultsFull.map(_._3).sum else 0.0
    val calJson = s""""calibration_sec":{"pre":${cal3(calPre)},"mid":${cal3(calMid)},"post":${cal3(calPost)}}"""
    val fullJson =
      s"""{"metric":"total","value":$total,"unit":"sec","reps":$reps,$calJson,"total_min":$totalMin,"queries":$qs,"queries_min":$qsMin,"sf":"$sfDir"}"""
    // Persist the full per-query set (the durable machine-readable
    // channel). Path from env, defaulting next to the repo when present,
    // else the CWD. On write failure the full line goes to stdout instead
    // — front-truncated by the harness, but not lost.
    val outPath = sys.env.get("SPARK_GRAFT_BENCH_OUT").getOrElse {
      if (java.nio.file.Files.isDirectory(java.nio.file.Paths.get("/root/repo")))
        "/root/repo/BENCH_LOCAL.json"
      else "BENCH_LOCAL.json"
    }
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      fullJson.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable =>
      System.err.println(s"bench: could not write $outPath: $e")
      println(fullJson) }
    // The harness that invokes this keeps only the LAST ~2000 chars of
    // stdout (an sbt epilogue line eats ~80 of those), and the full line
    // above is ~3.2 KB — it always arrives front-truncated and unparseable.
    // The LAST line is therefore a compact variant capped at 1800 chars:
    // same envelope, queries ordered heaviest-first, trailing light
    // queries dropped ("omitted" counts them; the full set is in the file).
    val byTime = results.sortBy(-_._2)
    val budget = 1800
    val head = s"""{"metric":"total","value":$total,"unit":"sec","reps":$reps,$calJson,"nq":${results.size},"detail":"BENCH_LOCAL.json","sf":"$sfDir","omitted":NNN,"queries":{"""
    val tail0 = "}}"
    var used = head.length + tail0.length
    val kept = scala.collection.mutable.ArrayBuffer.empty[String]
    byTime.foreach { case (k, v) =>
      // Locale.ROOT: the f-interpolator is locale-sensitive and a comma
      // decimal separator would break the JSON
      val frag = "\"" + k + "\":" +
        String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
      val add = frag.length + (if (kept.nonEmpty) 1 else 0)
      if (used + add <= budget) { kept += frag; used += add }
    }
    val omitted = results.size - kept.size
    println(head.replace("NNN", omitted.toString) + kept.mkString(",") + tail0)
    spark.stop()
  }
}
