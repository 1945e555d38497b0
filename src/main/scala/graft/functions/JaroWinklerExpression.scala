package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel for the generated code (same discipline as
  * [[DtwKernels]]): textbook Jaro similarity (Winkler 1990 — match window
  * floor(max len / 2) - 1, half-transposition count) with the Winkler
  * common-prefix bonus (scale 0.1, prefix capped at 4) applied above the
  * classic 0.7 boost threshold. Either side empty → 0.0. Lengths,
  * windows, matches and the prefix bonus are all counted in UTF-8 BYTES —
  * the unit DuckDB's rapidfuzz-derived `jaro_winkler_similarity` kernel
  * actually operates on (pinned empirically on non-BMP probes: e.g.
  * jaro('😀ab','ab😀') = 0.7778 and jaro('😀😁','😁😀') = 0.8333
  * reproduce ONLY under byte-level matching — a codepoint walk gives 0.0
  * and 0.5 there; ASCII is identical either way). Working on the
  * UTF8String's bytes directly also skips the String materialization a
  * char/codepoint walk would force per comparison — this runs per
  * candidate pair, the hottest loop of a linkage job.
  */
object StringKernels {

  def jaro(u: UTF8String, v: UTF8String): Double = {
    val l1 = u.numBytes()
    val l2 = v.numBytes()
    if (l1 == 0 || l2 == 0) return 0.0
    if (u.equals(v)) return 1.0
    val window = math.max(0, math.max(l1, l2) / 2 - 1)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var matches = 0
    var i = 0
    while (i < l1) {
      val c = u.getByte(i)
      var j = math.max(0, i - window)
      val hi = math.min(l2, i + window + 1)
      var found = false
      while (!found && j < hi) {
        if (!m2(j) && v.getByte(j) == c) {
          m1(i) = true; m2(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var halfTrans = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (u.getByte(i) != v.getByte(k)) halfTrans += 1
        k += 1
      }
      i += 1
    }
    val t = halfTrans / 2
    val m = matches.toDouble
    (m / l1 + m / l2 + (m - t) / m) / 3.0
  }

  def jaroWinkler(u: UTF8String, v: UTF8String): Double = {
    val j = jaro(u, v)
    if (j <= 0.7) return j
    val max = math.min(4, math.min(u.numBytes(), v.numBytes()))
    var p = 0
    while (p < max && u.getByte(p) == v.getByte(p)) p += 1
    j + 0.1 * p * (1.0 - j)
  }
}

/** Native codegen'd `jaro_winkler_similarity(string, string)` — the
  * scoring half of record linkage ([[graft.ops.Linkage]] generates
  * candidates; this ranks them). A native expression keeps the scorer
  * inside whole-stage codegen instead of a Scala-UDF serialization
  * boundary — it runs per candidate pair, the hottest loop of a linkage
  * job.
  */
case class JaroWinklerSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType == StringType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler_similarity expects (string, string), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    StringKernels.jaroWinkler(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.StringKernels.jaroWinkler($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerSimilarity =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "jaro_winkler_similarity"
}
