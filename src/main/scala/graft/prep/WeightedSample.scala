package graft.prep

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Weighted sampling WITHOUT replacement — the corpus-mixing primitive
  * ("sample 1M docs proportional to quality score") done as one
  * distributed top-k: the A-Res scheme (Efraimidis & Spirakis 2006)
  * assigns each row the key u^(1/w) for u uniform in (0,1) and keeps the
  * k largest — provably equivalent to sequential draws without
  * replacement with probabilities proportional to w.
  *
  * Determinism doctrine: u comes from the row id's md5
  * ([[DeterministicSampling]] — a pure function of the row, not of
  * partitioning or an RNG stream), offset +0.5/2^32 so u is strictly
  * positive (md5 prefix 0 would put ln at -inf). Ordering by u^(1/w) is
  * ordering by ln(u)/w, and ln is libm — so the log is FROZEN to
  * fixed-point (L = floor(ln(u)·10⁹ + 0.5), the repo-wide idf pattern)
  * and the sort key is the single correctly-rounded IEEE division
  * L/w — bit-identical on any engine. Ties (measure-zero) break by id.
  *
  * Scale shape: orderBy(key).limit(k) compiles to TakeOrderedAndProject —
  * each partition keeps its local top-k heap and only k·partitions rows
  * ever leave the executors; there is NO global sort shuffle, which is
  * what makes "sample k of 100 TB" one scan. Per-GROUP weighted sampling
  * composes the same key with [[graft.ops.TopKAgg]] instead of the limit.
  */
object WeightedSample {

  private val LogScale = 1000000000d // 10^9 fixed-point for ln(u)

  /** The A-Res priority key as two columns: fixed-point ln(u) and the
    * IEEE-exact double key L/w. Weight must be a positive long/int.
    */
  def priority(id: Column, weight: Column): Column = {
    val u = (conv(substring(md5(id.cast("string")), 1, 8), 16, 10)
      .cast("long").cast("double") + lit(0.5d)) / lit(4294967296.0d)
    floor(log(u) * lit(LogScale) + lit(0.5d)).cast("long")
      .cast("double") / weight.cast("double")
  }

  /** k rows sampled without replacement, probability proportional to
    * `weightCol` (rows with weight <= 0 are excluded). Returns the
    * sampled rows with their weight and priority key.
    */
  def sample(df: DataFrame, idCol: String, weightCol: String,
      k: Int): DataFrame =
    df.filter(col(weightCol) > 0)
      .withColumn("priority", priority(col(idCol), col(weightCol)))
      .orderBy(col("priority").desc, col(idCol).asc)
      .limit(k)
}
