package graft.prep

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Deterministic global corpus shuffle + sharding — the training-export
  * order: a language-model run wants the corpus in a reproducible
  * pseudo-random order, cut into fixed-size shards, with the guarantee
  * that (seed, corpus) → identical shard files on any cluster, any
  * partitioning, any rerun. Sorting by a seeded md5 of the id IS that
  * permutation (the repo's md5-keyed deterministic-sampling doctrine
  * applied to ordering), and the global position comes from the
  * [[Codebook]] two-pass exact rank — sort + zipWithIndex with partition
  * offsets, never a single-task window funnel: a 100 TB corpus's
  * permutation is data-scale and must rank distributed.
  *
  * A different `seed` is a fresh epoch permutation with zero state; the
  * oracle (q_shuffle_shard) replays the order as a SQL row_number over
  * the same md5 key, so shard and in-shard position are hash-checked
  * per row.
  */
object ShuffleShard {

  /** (id, shard, pos): global seeded-random rank r of each id, cut as
    * shard = r div shardSize, pos = r mod shardSize. Ties (md5 collision)
    * break on the id itself, so the order is total and reproducible.
    */
  def shard(df: DataFrame, idCol: String, seed: String,
      shardSize: Long): DataFrame = {
    require(shardSize > 0, "shardSize must be positive")
    val spark = df.sparkSession
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("shard", LongType),
      StructField("pos", LongType)))
    val rows = df
      .select(col(idCol).cast("long").as("id"),
        md5(concat(lit(seed), lit(":"), col(idCol).cast("string"))).as("__m"))
      .orderBy(col("__m"), col("id"))
      .select(col("id")).rdd
      .zipWithIndex()
      .map { case (r: Row, i: Long) =>
        Row(r.getLong(0), i / shardSize, i % shardSize) }
    spark.createDataFrame(rows, schema)
  }
}
