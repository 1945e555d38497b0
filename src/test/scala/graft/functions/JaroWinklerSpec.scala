package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec

/** Kernel pinned to the literature's canonical values and the DuckDB
  * conventions (empty → 0, boost threshold 0.7), plus the codegen path
  * end to end via the registered SQL function.
  */
class JaroWinklerSpec extends AnyFunSuite with SparkSpec {

  private def jw(a: String, b: String): Double =
    StringKernels.jaroWinkler(UTF8String.fromString(a), UTF8String.fromString(b))

  test("canonical textbook values") {
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-10)
    assert(math.abs(jw("JELLYFISH", "SMELLYFISH") - 0.8962962962962964) < 1e-10)
  }

  test("edge conventions match DuckDB: empties score 0, equals score 1") {
    assert(jw("", "") === 0.0)
    assert(jw("", "abc") === 0.0)
    assert(jw("abc", "") === 0.0)
    assert(jw("abc", "abc") === 1.0)
    assert(jw("a", "b") === 0.0)
  }

  test("non-BMP inputs match DuckDB's byte-level convention") {
    // DuckDB's rapidfuzz-derived kernel matches over UTF-8 BYTES — these
    // values were probed from duckdb jaro_winkler_similarity directly; a
    // UTF-16 or codepoint walk produces 0.0 / 0.5 / 0.867 on the first
    // three and would silently diverge cross-engine on any emoji/CJK data
    assert(math.abs(jw("😀ab", "ab😀") - 0.7777777777777777) < 1e-12)
    assert(math.abs(jw("😀😁", "😁😀") - 0.8833333333333334) < 1e-12)
    assert(math.abs(jw("ab😀cd", "abxcd") - 0.8133333333333332) < 1e-12)
    assert(math.abs(jw("a😀", "😀a") - 0.8666666666666667) < 1e-12)
  }

  test("bounds, symmetry, and no-bonus below the 0.7 threshold") {
    val samples = Seq("abcde", "aedcb", "xyz", "abab", "ba", "a", "abcdefgh")
    for (a <- samples; b <- samples) {
      val s = jw(a, b)
      assert(s >= 0.0 && s <= 1.0, s"out of bounds: $a/$b -> $s")
      assert(s === jw(b, a), s"asymmetric: $a/$b")
      val j = StringKernels.jaro(UTF8String.fromString(a), UTF8String.fromString(b))
      if (j <= 0.7) assert(s === j, s"bonus applied below threshold: $a/$b")
      else assert(s >= j)
    }
  }

  test("SQL registration + codegen path agree with the kernel") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(("MARTHA", "MARHTA"), ("abc", "abd"), ("", "x"))
      .toDF("a", "b")
      .selectExpr("jaro_winkler_similarity(a, b) AS s")
    val got = df.collect().map(_.getDouble(0))
    assert(math.abs(got(0) - jw("MARTHA", "MARHTA")) < 1e-15)
    assert(math.abs(got(1) - jw("abc", "abd")) < 1e-15)
    assert(got(2) === 0.0)
  }
}
