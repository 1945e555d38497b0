package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Tables._
import graft.sim.Knn

/** Dedup + similarity-search query catalog (documents / embeddings tables).
  *
  * Exact-arithmetic entries carry DuckDB oracles; the LSH-based entries
  * (minhash / simhash / srp buckets) depend on xxhash64, which has no DuckDB
  * equivalent — those are deterministic (seeded) but verified by the
  * rows-only check plus ScalaTest invariants (see DedupSpec).
  */
object DedupQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // exact dedup groups on canonical fingerprint
    "q_dedup_exact" -> ((s, d) =>
      Dedup.exactGroups(documents(s, d), "doc_id", "text")),

    // bigram Jaccard near-dup pairs, blocked by lang
    "q_dedup_jaccard" -> ((s, d) =>
      Dedup.jaccardPairs(documents(s, d), "doc_id", "text",
        blockCols = Seq("lang"), n = 2, threshold = 0.3)),

    // MinHash + LSH candidate pairs, exact-Jaccard verified (rows-only check)
    "q_dedup_minhash" -> ((s, d) =>
      Dedup.minhashPairs(documents(s, d), "doc_id", "text",
        shingleN = 2, numHashes = 64, bands = 16, threshold = 0.3)),

    // SimHash near-dup pairs within Hamming distance 3 (rows-only check)
    "q_dedup_simhash" -> ((s, d) =>
      Dedup.simhashPairs(documents(s, d), "doc_id", "text", maxHamming = 3)),

    // embedding-cosine near-dup pairs (exact all-pairs — oracled)
    "q_dedup_cosine" -> ((s, d) =>
      Knn.cosinePairs(embeddings(s, d), "vec_id", "embedding", threshold = 0.4)),

    // brute-force cosine top-5 for query vectors vec_id < 10 (oracled)
    "q_knn_brute" -> ((s, d) => {
      val emb = embeddings(s, d)
      Knn.bruteForceTopK(emb.filter(col("vec_id") < 10), emb,
        "vec_id", "embedding", k = 5)
    }),

    // SRP-LSH bucketed ANN, same query set (rows-only check; recall
    // validated against q_knn_brute in ScalaTest)
    "q_knn_lsh" -> ((s, d) => {
      val emb = embeddings(s, d)
      Knn.lshTopK(emb.filter(col("vec_id") < 10), emb,
        "vec_id", "embedding", k = 5, numPlanes = 4)
    }),

    // IVF coarse-quantizer ANN — the billion-vector layout (rows-only)
    "q_knn_ivf" -> ((s, d) => {
      val emb = embeddings(s, d)
      Knn.ivfTopK(emb.filter(col("vec_id") < 10), emb,
        "vec_id", "embedding", k = 5, nlist = 8, nprobe = 2)
    }),

    // End-to-end corpus curation: quality filter -> language filter ->
    // exact dedup -> per-language token statistics. The composability
    // showcase — one declarative plan, fully DuckDB-oracled.
    "q_curation_pipeline" -> ((s, d) => {
      val docs = documents(s, d)
      val scored = docs.select(col("doc_id"), col("text"), col("lang"),
          graft.text.TextFunctions.tokenCount(col("text")).as("n_tokens"),
          graft.text.TextFunctions.fingerprint(col("text")).as("fp"))
        .filter(col("n_tokens") >= 5)
        .filter(col("lang").isin("en", "de", "fr", "es"))
      // min (not first): identical texts could in principle carry different
      // lang labels — min is deterministic on both engines
      val deduped = scored.groupBy(col("fp"))
        .agg(min(col("doc_id")).as("doc_id"),
          min(col("lang")).as("lang"), min(col("n_tokens")).as("n_tokens"))
      deduped.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).cast("long").as("total_tokens"),
          round(sum(col("n_tokens")).cast("double") / count(lit(1)), 6)
            .as("avg_tokens"))
    })
  )

  private val shinglesSql =
    """list_distinct(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]))"""
  private val toksSql =
    """list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '')"""

  val oracles: Map[String, String] = Map(
    "q_dedup_exact" ->
      """SELECT md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp,
         min(doc_id) AS keep_id, count(*) AS dup_cnt
         FROM documents GROUP BY 1""",

    "q_dedup_jaccard" ->
      s"""WITH t AS (SELECT doc_id, lang, $shinglesSql AS sh
            FROM (SELECT doc_id, lang, $toksSql AS toks FROM documents)
            WHERE len(toks) >= 2)
          SELECT id_a, id_b, jaccard FROM (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
              round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
                (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6) AS jaccard
            FROM t a JOIN t b ON a.lang = b.lang AND a.doc_id < b.doc_id) p
          WHERE jaccard >= 0.3""",

    "q_dedup_cosine" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
         SELECT id_a, id_b, cosine_sim FROM (
           SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             round(CASE WHEN sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)) > 0
               THEN list_dot_product(a.v, b.v) /
                 (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
               ELSE 0.0 END, 6) AS cosine_sim
           FROM e a JOIN e b ON a.vec_id < b.vec_id) p
         WHERE cosine_sim >= 0.4""",

    "q_curation_pipeline" ->
      """WITH scored AS (
           SELECT doc_id, lang,
             len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS n_tokens,
             md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
           FROM documents
           WHERE len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) >= 5
             AND lang IN ('en','de','fr','es')),
         deduped AS (
           SELECT fp, min(doc_id) AS doc_id,
             min(lang) AS lang, min(n_tokens) AS n_tokens
           FROM scored GROUP BY fp)
         SELECT lang, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           round(CAST(sum(n_tokens) AS DOUBLE) / count(*), 6) AS avg_tokens
         FROM deduped GROUP BY lang""",

    "q_knn_brute" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
          q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
          scored AS (SELECT q.query_id, c.vec_id AS neighbor_id,
            CASE WHEN sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(c.v, c.v)) > 0
              THEN list_dot_product(q.qv, c.v) /
                (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(c.v, c.v)))
              ELSE 0.0 END AS sim
            FROM q JOIN e c ON q.query_id <> c.vec_id),
          ranked AS (SELECT query_id, neighbor_id,
            CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS BIGINT) AS rank,
            round(sim, 6) AS cosine_sim
            FROM scored)
         SELECT query_id, neighbor_id, rank, cosine_sim FROM ranked WHERE rank <= 5"""
  )
}
