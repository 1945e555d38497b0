package graft.io

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class SchemaEvolutionSpec extends AnyFunSuite with SparkSpec {

  test("widen: int family, float family, cross-family, temporal, refusals") {
    assert(SchemaEvolution.widen(IntegerType, LongType) === Some(LongType))
    assert(SchemaEvolution.widen(ByteType, ShortType) === Some(ShortType))
    assert(SchemaEvolution.widen(FloatType, DoubleType) === Some(DoubleType))
    assert(SchemaEvolution.widen(LongType, DoubleType) === Some(DoubleType))
    assert(SchemaEvolution.widen(DateType, TimestampType) === Some(TimestampType))
    assert(SchemaEvolution.widen(StringType, StringType) === Some(StringType))
    // refusals: a type CHANGE is a rewrite, not an evolution
    assert(SchemaEvolution.widen(IntegerType, StringType) === None)
    assert(SchemaEvolution.widen(TimestampType, LongType) === None)
  }

  test("unionEvolve: name-matched, widened, null-filled; order is first-seen") {
    import spark.implicits._
    val gen1 = Seq((1, 1.5f), (2, 2.5f)).toDF("id", "score")
    val gen2 = Seq((3L, 3.5d, "c")).toDF("id", "score", "tag")
    val out = SchemaEvolution.unionEvolve(Seq(gen1, gen2))
    assert(out.schema.map(f => (f.name, f.dataType)) ===
      Seq(("id", LongType), ("score", DoubleType), ("tag", StringType)))
    val rows = out.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getDouble(1), Option(r.getString(2))))
    assert(rows.toSeq === Seq((1L, 1.5d, None), (2L, 2.5d, None),
      (3L, 3.5d, Some("c"))))
  }

  test("unionEvolve: positional-mismatch generations reconcile by NAME") {
    import spark.implicits._
    // same columns, different physical order — positional union would
    // mis-bind tag<->score; evolution must not
    val gen1 = Seq((1, "a", 10.0)).toDF("id", "tag", "score")
    val gen2 = Seq((2, 20.0, "b")).toDF("id", "score", "tag")
    val out = SchemaEvolution.unionEvolve(Seq(gen1, gen2)).orderBy("id").collect()
    assert(out.map(_.getString(1)).toSeq === Seq("a", "b"))
    assert(out.map(_.getDouble(2)).toSeq === Seq(10.0, 20.0))
  }

  test("unionEvolve refuses a non-widening conflict at plan time") {
    import spark.implicits._
    val gen1 = Seq((1, 10)).toDF("id", "v")
    val gen2 = Seq((2, "ten")).toDF("id", "v")
    val e = intercept[IllegalArgumentException] {
      SchemaEvolution.unionEvolve(Seq(gen1, gen2))
    }
    assert(e.getMessage.contains("do not widen"))
  }

  test("driftReport classifies ok/widened/changed/missing/added") {
    import spark.implicits._
    val actual = Seq((1L, 1.5d, "x", true)).toDF("id", "v", "s", "flag").schema
    val out = SchemaEvolution.driftReport(spark, Seq(
      "id" -> LongType,        // ok
      "v" -> IntegerType,      // actual double -> widened
      "s" -> IntegerType,      // actual string -> changed
      "gone" -> StringType),   // missing
      actual).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out === Map("id" -> "ok", "v" -> "type_widened",
      "s" -> "type_changed", "gone" -> "missing", "flag" -> "added"))
  }

  test("unionEvolve stays shuffle-free (projections + union only)") {
    import spark.implicits._
    val gen1 = Seq((1, 1.5f)).toDF("id", "score")
    val gen2 = Seq((3L, 3.5d, "c")).toDF("id", "score", "tag")
    val plan = SchemaEvolution.unionEvolve(Seq(gen1, gen2))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
