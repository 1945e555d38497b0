package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Context-window chunking for long-document training prep: split each
  * document's token stream into windows of `window` tokens starting every
  * `stride` tokens (overlapping when stride < window — the standard
  * long-doc recipe so no span is seen only at a window edge).
  *
  * Pure projection + one explode: no shuffle at all — chunking rides the
  * scan, and chunk rows inherit the input partitioning. Chunk starts are
  * 0, stride, 2·stride… while the start is inside the document, so the
  * final chunk may be short (never empty); token-less documents produce
  * no chunks.
  */
object Chunking {

  def chunkDocuments(
      df: DataFrame,
      idCol: String,
      textCol: String,
      window: Int,
      stride: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(stride >= 1 && stride <= window,
      s"stride must be in [1, window], got $stride")
    // NULL text behaves as zero tokens (no chunks), not NULL
    val toks = TextFunctions.safeLowerTokens(col(textCol))
    val base = df.select(col(idCol), toks.as("__toks"))
    // last chunk start index = floor((len-1)/stride); sequence() is guarded
    // because Spark's sequence(0, negative) DESCENDS rather than empties
    val chunks = when(size(col("__toks")) > 0,
      transform(
        sequence(lit(0L),
          floor((size(col("__toks")) - lit(1)).cast("double") / stride)
            .cast("long")),
        i => slice(col("__toks"), (i * stride + 1).cast("int"), lit(window))))
      .otherwise(array().cast("array<array<string>>"))
    base.withColumn("__chunks", chunks)
      .select(col(idCol), posexplode(col("__chunks")).as(Seq("chunk_idx", "__c")))
      .select(col(idCol), col("chunk_idx").cast("long").as("chunk_idx"),
        concat_ws(" ", col("__c")).as("chunk_text"),
        size(col("__c")).cast("long").as("n_tokens"))
  }
}
