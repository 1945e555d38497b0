package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** The shared staleness-stamped fixture protocol (QueryFixtures) now
  * guards every catalog index fixture — this spec pins the contract the
  * eight former copy-paste blocks each relied on implicitly: build runs
  * once per (cache × sf dir), a crash BEFORE the marker discards the
  * half-built dir and rebuilds whole, a finished dir is reused without
  * rebuilding, and a regenerated source table (new mtime/size stamp)
  * gets a fresh dir.
  */
class QueryFixturesSpec extends AnyFunSuite {

  private def tmpSfDir(): java.io.File = {
    val d = java.nio.file.Files.createTempDirectory("qf_sf").toFile
    val src = new java.io.File(d, "documents.parquet")
    java.nio.file.Files.writeString(src.toPath, "stub")
    d
  }

  test("build runs once, reuse skips it, and the marker gates completion") {
    val sf = tmpSfDir()
    val cache = scala.collection.concurrent.TrieMap.empty[String, String]
    var builds = 0
    def get() = QueryFixtures.fixtureDir(cache, "qf_spec", "documents",
      sf.getAbsolutePath) { dir =>
      builds += 1
      new java.io.File(dir).mkdirs() // builders create their own dir
      java.nio.file.Files.writeString(
        new java.io.File(dir, "payload").toPath, s"b$builds")
      ()
    }
    val d1 = get()
    assert(builds == 1)
    assert(new java.io.File(d1, "_graft_index_complete").exists())
    assert(get() == d1 && builds == 1, "memoized call must not rebuild")

    // a second JVM (fresh cache) sees the finished marker and reuses
    val cache2 = scala.collection.concurrent.TrieMap.empty[String, String]
    val d2 = QueryFixtures.fixtureDir(cache2, "qf_spec", "documents",
      sf.getAbsolutePath) { _ => builds += 1; () }
    assert(d2 == d1 && builds == 1, "finished dir must be reused across JVMs")
  }

  test("a crashed half-build (dir without marker) is discarded and " +
      "redone whole; a regenerated source gets a fresh dir") {
    val sf = tmpSfDir()
    def run(cache: scala.collection.concurrent.TrieMap[String, String],
        fail: Boolean): String =
      QueryFixtures.fixtureDir(cache, "qf_crash", "documents",
        sf.getAbsolutePath) { dir =>
        new java.io.File(dir).mkdirs() // builders create their own dir
        java.nio.file.Files.writeString(
          new java.io.File(dir, "payload").toPath, "half")
        if (fail) sys.error("crash mid-build")
        java.nio.file.Files.writeString(
          new java.io.File(dir, "whole").toPath, "done")
        ()
      }
    val c1 = scala.collection.concurrent.TrieMap.empty[String, String]
    intercept[RuntimeException](run(c1, fail = true))
    // replay in a fresh cache: the unmarked dir must be rebuilt whole
    val c2 = scala.collection.concurrent.TrieMap.empty[String, String]
    val d = run(c2, fail = false)
    assert(new java.io.File(d, "whole").exists(), "rebuild must complete")
    assert(new java.io.File(d, "_graft_index_complete").exists())

    // regenerate the source table -> different stamp -> different dir
    Thread.sleep(1100) // mtime granularity
    java.nio.file.Files.writeString(
      new java.io.File(sf, "documents.parquet").toPath, "regen!")
    val c3 = scala.collection.concurrent.TrieMap.empty[String, String]
    val d3 = run(c3, fail = false)
    assert(d3 != d, "a regenerated fixture source must get a fresh dir")
  }
}
