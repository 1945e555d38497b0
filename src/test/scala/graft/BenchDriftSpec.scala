package graft

import org.scalatest.funsuite.AnyFunSuite

/** The drift gate's decision logic (round-16 instrument) is pure — pin it
  * without forking JVMs: flat-JSON extraction against the real envelope
  * and floors-file shapes, mover selection (ratio, cap, worst-first,
  * no-floor-no-mover), and the unresolved-drift adjudication (fresh JVM
  * heals vs fails to heal).
  */
class BenchDriftSpec extends AnyFunSuite {

  test("extractObj pulls the flat object after the key, first brace closes") {
    val env = """{"metric":"total","queries":{"q_a":1.5,"q_b":0.25},""" +
      """"queries_median":{"q_a":2.0,"q_b":0.30},"cal_per_query":{"q_a":0.02}}"""
    assert(BenchDrift.parseNumMap(BenchDrift.extractObj(env, "queries")) ===
      Map("q_a" -> 1.5, "q_b" -> 0.25))
    // the LATER maps must not bleed in (the bug a greedy regex over the
    // whole envelope would have)
    assert(BenchDrift.parseNumMap(BenchDrift.extractObj(env, "queries_median")) ===
      Map("q_a" -> 2.0, "q_b" -> 0.30))
    assert(BenchDrift.extractObj(env, "absent") === "")
    assert(BenchDrift.parseNumMap("") === Map.empty)
  }

  test("extractObj handles the floors file with a _meta object before floors") {
    val f = """{"_meta":{"drift_ratio":3.0,"note":"text with q_fake 9.9"},""" +
      """"floors":{"q_x":0.5,"q_y":1.25}}"""
    assert(BenchDrift.parseNumMap(BenchDrift.extractObj(f, "floors")) ===
      Map("q_x" -> 0.5, "q_y" -> 1.25))
  }

  test("selectMovers: ratio gate, worst-excess-first ordering, cap, no floor = no mover") {
    val mins = Seq("q_a" -> 9.0, "q_b" -> 0.9, "q_c" -> 50.0, "q_new" -> 99.0)
    val floors = Map("q_a" -> 1.0, "q_b" -> 1.0, "q_c" -> 1.0) // q_new: none
    val m = BenchDrift.selectMovers(mins, floors, ratio = 3.0, cap = 8)
    assert(m === Seq("q_c" -> 50.0, "q_a" -> 9.0)) // b under 3x; new skipped
    assert(BenchDrift.selectMovers(mins, floors, 3.0, cap = 1) ===
      Seq("q_c" -> 50.0))
    // a zero/negative floor can never gate (guards a corrupt floors file)
    assert(BenchDrift.selectMovers(Seq("q_z" -> 5.0), Map("q_z" -> 0.0),
      3.0, 8) === Nil)
  }

  test("absolute guard: sub-second jitter over 3x ratio never trips the gate") {
    // a 0.14s query seen at 0.44s is 3.1x but only +0.3s — scheduling
    // noise, not the multi-second outlier class (q_join_left_outer, r16)
    val floors = Map("q_small" -> 0.14, "q_big" -> 0.5)
    assert(BenchDrift.selectMovers(Seq("q_small" -> 0.44), floors, 3.0, 8)
      === Nil)
    // q_knn_quantized's real r15 outlier clears both bars
    assert(BenchDrift.selectMovers(Seq("q_big" -> 4.43), floors, 3.0, 8)
      === Seq("q_big" -> 4.43))
    // same guard on the adjudication side
    assert(BenchDrift.unresolved(Seq("q_small" -> 0.44), Map.empty,
      floors, 3.0) === Nil)
    assert(BenchDrift.unresolved(Seq("q_big" -> 4.43), Map.empty,
      floors, 3.0) === Seq(("q_big", 4.43, 0.5)))
  }

  test("unresolved: fresh JVM heals below ratio x floor; failure to heal stays listed") {
    val movers = Seq("q_a" -> 9.0, "q_b" -> 9.0, "q_c" -> 9.0)
    val floors = Map("q_a" -> 1.0, "q_b" -> 1.0, "q_c" -> 1.0)
    // a: healed to 0.5; b: fresh still high; c: no fresh result at all
    val fresh = Map("q_a" -> 0.5, "q_b" -> 8.0)
    val out = BenchDrift.unresolved(movers, fresh, floors, ratio = 3.0)
    assert(out === Seq(("q_b", 8.0, 1.0), ("q_c", 9.0, 1.0)))
    // min over both JVMs: a fresh rep can only improve the published min
    assert(BenchDrift.unresolved(Seq("q_d" -> 4.0), Map("q_d" -> 7.0),
      Map("q_d" -> 1.0), 3.0) === Seq(("q_d", 4.0, 1.0)))
  }

  test("no silent cap: over-ratio queries beyond the retry cap still adjudicate as drifted") {
    // Bench takes movers = selectMovers(..., cap) for the fresh-JVM retry
    // but feeds the UNCAPPED over-ratio list to unresolved() — overflow
    // queries land in `drifted` with their battery min
    val mins = (1 to 12).map(i => (s"q_$i", 10.0 + i))
    val floors = mins.map { case (k, _) => k -> 1.0 }.toMap
    val overRatio = BenchDrift.selectMovers(mins, floors, 3.0, Int.MaxValue)
    assert(overRatio.size === 12)
    val movers = overRatio.take(8)
    // fresh JVM heals only the retried 8; the other 4 must still be listed
    val fresh = movers.map { case (k, _) => k -> 0.5 }.toMap
    val drifted = BenchDrift.unresolved(overRatio, fresh, floors, 3.0)
    assert(drifted.map(_._1).toSet ===
      overRatio.drop(8).map(_._1).toSet)
  }

  test("the committed BENCH_FLOORS.json parses and covers the bench-era catalog") {
    val txt = java.nio.file.Files.readString(
      java.nio.file.Paths.get("BENCH_FLOORS.json"))
    val floors = BenchDrift.parseNumMap(BenchDrift.extractObj(txt, "floors"))
    assert(floors.size >= 250, s"only ${floors.size} floors parsed")
    assert(floors.values.forall(v => v > 0 && v < 60),
      "floors must be positive sub-minute seconds")
    // every floor names a query that still exists (stale floors are
    // harmless to the gate but signal a forgotten regeneration)
    val gone = floors.keySet.diff(SparkEntry.queries.keySet)
    assert(gone.isEmpty, s"floors for absent queries: $gone")
  }
}
