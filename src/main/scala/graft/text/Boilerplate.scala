package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level boilerplate removal (CCNet / RefinedWeb-style bulk
  * dedup of repeated spans): any word n-gram occurring in more than
  * `maxDocFreq` documents is treated as boilerplate (headers, footers,
  * license blurbs, navigation chrome) and every token position it covers
  * is dropped from every document; the surviving tokens are reassembled
  * in order.
  *
  * Beyond-reference operator: the reference pipeline has no corpus-level
  * text hygiene; this is the pretraining-curation op that removes
  * cross-document repeated spans before training.
  *
  * Scale shape (the part that must survive 100 TB):
  *  - tokens and n-grams are exploded ONCE each — no per-pair work, no
  *    self-join; every stage is a hash shuffle on (gram) or (doc, pos);
  *  - the frequent-gram set is, by construction, small (grams with
  *    df > cap are the boilerplate tail of the df distribution), so the
  *    postings⋈frequent join is broadcast-able at any corpus size — but
  *    the hint is LEFT TO THE PLANNER (AQE sizes it at runtime), because
  *    a pathological cap could make it large;
  *  - reassembly is one aggregation per document keyed on the id — the
  *    same key the token explode already partitioned by.
  */
object Boilerplate {

  /** `maxDocFreq` alone is an absolute cap. With `maxDocFraction = Some(f)`
    * the cap becomes greatest(maxDocFreq, f · corpus size) — the form that
    * survives scale-up: "appears in more than f of all documents" is a
    * corpus-size-invariant definition of boilerplate, while any absolute
    * number eventually marks EVERY common phrase once the corpus grows
    * past cap/typical-df documents (observed: the absolute-40 cap that
    * drops 6% of tokens on 500 docs drops ~100% on 5,000). The fraction
    * path adds one broadcast 1-row corpus-count to the (tiny) gram-df
    * frame; the default `None` keeps the plan join-free.
    */
  def removeBoilerplate(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      maxDocFreq: Int = 10,
      maxDocFraction: Option[Double] = None): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    require(maxDocFreq >= 1, s"maxDocFreq must be >= 1, got $maxDocFreq")
    require(maxDocFraction.forall(f => f > 0 && f <= 1),
      s"maxDocFraction must be in (0, 1], got $maxDocFraction")
    val id = col(idCol)
    // a NULL text must behave as zero tokens, not poison the row
    // (size(NULL) is NULL and would surface as NULL n_dropped)
    val base = graft.prep.Preprocessing.spread(df)
      .select(id, TextFunctions.safeLowerTokens(col(textCol)).as("toks"))
    // positional n-grams: gram at p covers token positions [p, p+n-1].
    // sequence() guarded — Spark's sequence(0, negative) DESCENDS.
    val withGrams = base.withColumn("grams",
      when(size(col("toks")) >= n,
        transform(sequence(lit(0), size(col("toks")) - n),
          i => concat_ws(" ", slice(col("toks"), i + 1, lit(n)))))
        .otherwise(array().cast("array<string>")))
    // posexplode_OUTER, not posexplode (r21): the inner generator makes
    // the optimizer infer `size(grams) > 0` below it
    // (InferFiltersFromGenerate), and predicate pushdown then drags that
    // filter — with the ENTIRE tokenize+gram HOF chain inlined — below
    // the spread() exchange, so every consumer subtree re-evaluated the
    // expensive transforms in the 1-task scan stage (measured: two serial
    // 3.5 s single-task stages inside q_corpus_build at sf0.1). The outer
    // generator infers nothing, the projection stays ABOVE the exchange
    // (32-way), and the one null row an empty-gram doc emits is dropped
    // right here — same rows, tokenization evaluated once per doc.
    val gramPost = withGrams.select(id,
      posexplode_outer(col("grams")).as(Seq("gpos", "gram")))
      .filter(col("gram").isNotNull)
    // document frequency over DISTINCT (doc, gram): a gram repeated inside
    // one doc is repetition (q_text_repetition's signal), not boilerplate
    val gramDf = gramPost.select(id, col("gram")).distinct()
      .groupBy(col("gram")).agg(count(lit(1)).as("df_cnt"))
    val frequent = maxDocFraction match {
      case None =>
        gramDf.filter(col("df_cnt") > maxDocFreq).select(col("gram"))
      case Some(f) =>
        gramDf.crossJoin(broadcast(base.agg(count(lit(1)).as("__n"))))
          .filter(col("df_cnt") >
            greatest(lit(maxDocFreq.toDouble), lit(f) * col("__n")))
          .select(col("gram"))
    }
    // r21 (guide §2.3/§2.4 — shuffle fewer bytes, remove shuffles): the
    // excision used to explode EVERY token into a row, anti-join the
    // (doc, pos) stream against the covered positions, and reassemble with
    // a groupBy(doc) collect_list + array_sort — three token-scale
    // exchanges (covered.distinct, the anti join, the reassembly) for what
    // is a per-document positional filter. Instead: aggregate the covered
    // positions into ONE set per document (collect_set dedups, so the
    // separate distinct() exchange disappears; only boilerplate-covered
    // positions shuffle, never the full token stream), join that
    // doc-cardinality frame back to the tokenized docs, and excise
    // in-array: array_except(all positions, covered) keeps original order
    // and runs on a hash set (O(tokens) per doc), element_at rebuilds the
    // text. Same output bit-for-bit (oracle-checked at 3 SFs): kept
    // positions ascend exactly like the sorted (pos, tok) structs did, and
    // a fully-covered or empty doc yields ('' , 0, n_tokens) through the
    // same coalesce spine.
    val covered = gramPost.join(frequent, Seq("gram"))
      .select(id, explode(sequence(col("gpos"), col("gpos") + (n - 1)))
        .as("pos"))
    val dropSets = covered.groupBy(id)
      .agg(collect_set(col("pos")).as("__drop"))
    // sequence() guarded again: sequence(0, -1) on an empty doc DESCENDS
    val allPos = when(size(col("toks")) > 0,
      sequence(lit(0), size(col("toks")) - 1))
      .otherwise(array().cast("array<int>"))
    val keptPos = array_except(allPos,
      coalesce(col("__drop"), array().cast("array<int>")))
    base.join(dropSets, Seq(idCol), "left_outer")
      .select(id,
        concat_ws(" ",
          transform(keptPos, p => element_at(col("toks"), p + 1)))
          .as("text_clean"),
        size(keptPos).cast("long").as("n_kept"),
        (size(col("toks")) - size(keptPos)).cast("long").as("n_dropped"))
  }
}
