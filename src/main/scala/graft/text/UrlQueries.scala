package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Tables

/** Crawl-grade URL canonicalization + domain-level curation — content
  * dedup ([[graft.dedup.Dedup]]) collapses what the pages SAY; real crawl
  * curation first collapses what the pages ARE (the same resource fetched
  * as `HTTP://Host:80/a/?b=2&a=1#frag` and `http://host/a?a=1&b=2`), and
  * profiles per-domain before any content loads. Everything here is a pure
  * codegen'd string projection (lower/regexp/split/sort — no UDF, no
  * network), so it runs at scan speed on 100 TB of crawl metadata and is
  * value-oracled bit-for-bit against DuckDB.
  *
  * Canonical form: lowercase scheme+host, default port stripped (443 for
  * https, 80 for http — others kept), fragment dropped, trailing path
  * slashes trimmed (root stays `/`, empty path becomes `/`), query params
  * sorted lexicographically. `www.` is deliberately KEPT — stripping it
  * conflates distinct hosts on registries where they differ.
  */
object UrlQueries {

  /** Lowercased `host:port` portion. */
  private def hostport(url: Column): Column =
    lower(regexp_extract(url, "://([^/?#]*)", 1))

  /** Host with any `:port` suffix removed (already lowercased). */
  def urlHost(url: Column): Column =
    regexp_replace(hostport(url), ":[0-9]+$", "")

  /** Canonical URL as a single expression tree over built-ins. */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val host = urlHost(url)
    val port = regexp_extract(hostport(url), ":([0-9]+)$", 1)
    val keepPort = (port =!= "") &&
      !((scheme === "https" && port === "443") || (scheme === "http" && port === "80"))
    val path0 = regexp_extract(url, "://[^/?#]*([^?#]*)", 1)
    val pathTrim = regexp_replace(path0, "/+$", "")
    val path = when(pathTrim === "", lit("/")).otherwise(pathTrim)
    val q = regexp_extract(url, "\\?([^#]*)", 1)
    val sq = when(q === "", lit(""))
      .otherwise(array_join(array_sort(split(q, "&")), "&"))
    concat(
      scheme, lit("://"), host,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      path,
      when(sq =!= "", concat(lit("?"), sq)).otherwise(lit("")))
  }

  /** Deterministic messy raw URL per document — the fixture has no url
    * column, so one is derived from (doc_id, source) with the exact noise
    * canonicalization must collapse: upper/lower case host, explicit
    * default port, trailing slash, shuffled query-param order, fragment.
    * Same arithmetic in the oracle, so raw and canonical forms are both
    * value-checked.
    */
  private def rawUrl: Column = concat(
    lit("https://"),
    when(pmod(col("doc_id"), lit(3)) === 0, lit("WWW.")).otherwise(lit("www.")),
    col("source"), lit(".Example.com"),
    when(pmod(col("doc_id"), lit(5)) === 0, lit(":443")).otherwise(lit("")),
    lit("/docs/"), pmod(col("doc_id"), lit(10)).cast("string"),
    when(pmod(col("doc_id"), lit(4)) === 0, lit("/")).otherwise(lit("")),
    when(pmod(col("doc_id"), lit(2)) === 0,
      concat(lit("?b="), pmod(col("doc_id"), lit(4)).cast("string"),
        lit("&a="), pmod(col("doc_id"), lit(2)).cast("string")))
      .otherwise(
        concat(lit("?a="), pmod(col("doc_id"), lit(2)).cast("string"),
          lit("&b="), pmod(col("doc_id"), lit(4)).cast("string"))),
    when(pmod(col("doc_id"), lit(6)) === 0, lit("#sec")).otherwise(lit("")))

  private def withUrls(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), rawUrl.as("raw_url"))
      .withColumn("canon_url", canonicalizeUrl(col("raw_url")))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Per-doc canonicalization — the projection itself, value-oracled.
    "q_url_canon" -> ((s, d) => withUrls(s, d)
      .select(col("doc_id"), col("raw_url"), col("canon_url"))),

    // Canonical-URL dedup: one keeper (min doc_id) per canonical resource.
    // Same hash-groupBy shape as exact content dedup — shuffles narrow
    // (canon_url, doc_id) rows only, never document payloads.
    "q_url_dedup" -> ((s, d) => withUrls(s, d)
      .groupBy(col("canon_url"))
      .agg(min(col("doc_id")).as("keep_doc_id"),
        count(lit(1)).as("n_docs"))),

    // Per-domain cap sampling — the "don't let one domain dominate the
    // corpus" curation step (crawl sets are power-law by domain; a cap
    // bounds any single host's share of the training mix). The keep
    // decision is an md5-keyed deterministic rank within the domain
    // ([[graft.prep.DeterministicSampling]] doctrine: a pure function of
    // doc_id, so reruns/engine swaps/audits replay the same keep set —
    // rand() can't). Window partitions by domain, so domains fill
    // executors in parallel; for a single mega-domain beyond one
    // partition, the two-phase variant (count per domain → broadcast
    // keep-rate → threshold the same md5 draw) trades exactness of the
    // cap for no per-domain sort — same draw column, same replay story.
    "q_domain_cap" -> ((s, d) => {
      val cap = 40
      val urls = withUrls(s, d).withColumn("domain", urlHost(col("raw_url")))
        .withColumn("draw", graft.prep.DeterministicSampling.uniformDraw(col("doc_id")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("domain")).orderBy(col("draw"), col("doc_id"))
      urls.withColumn("rk", row_number().over(w))
        .select(col("doc_id"), col("domain"),
          col("rk").cast("long").as("rk"),
          (col("rk") <= cap).as("kept"))
    }),

    // Per-domain curation stats: docs, distinct canonical resources,
    // dup ratio, corpus share — the decide-before-fetch report (which
    // domains to crawl deeper, which to cap). Total via a broadcast
    // 1-row aggregate, not a global window.
    "q_domain_stats" -> ((s, d) => {
      val urls = withUrls(s, d).withColumn("domain", urlHost(col("raw_url")))
      val perDomain = urls.groupBy(col("domain"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("canon_url")).as("n_canon"))
      val total = urls.agg(count(lit(1)).as("_total"))
      perDomain.crossJoin(broadcast(total))
        .select(col("domain"), col("n_docs"), col("n_canon"),
          round(lit(1.0) - col("n_canon") / col("n_docs"), 6).as("dup_ratio"),
          round(col("n_docs") / col("_total"), 6).as("share"))
    }))

  /** Raw-URL synthesis + canonicalization as shared SQL CTEs (mirrors
    * [[rawUrl]] / [[canonicalizeUrl]] stage for stage).
    */
  private val urlCtes =
    """WITH u AS (
      |  SELECT doc_id,
      |         'https://' || CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE 'www.' END
      |         || source || '.Example.com'
      |         || CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END
      |         || '/docs/' || CAST(doc_id % 10 AS VARCHAR)
      |         || CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END
      |         || CASE WHEN doc_id % 2 = 0
      |                 THEN '?b=' || CAST(doc_id % 4 AS VARCHAR) || '&a=' || CAST(doc_id % 2 AS VARCHAR)
      |                 ELSE '?a=' || CAST(doc_id % 2 AS VARCHAR) || '&b=' || CAST(doc_id % 4 AS VARCHAR) END
      |         || CASE WHEN doc_id % 6 = 0 THEN '#sec' ELSE '' END AS raw_url
      |  FROM documents
      |), parts AS (
      |  SELECT doc_id, raw_url,
      |         lower(regexp_extract(raw_url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
      |         lower(regexp_extract(raw_url, '://([^/?#]*)', 1)) AS hostport,
      |         regexp_extract(raw_url, '://[^/?#]*([^?#]*)', 1) AS path0,
      |         regexp_extract(raw_url, '\?([^#]*)', 1) AS q
      |  FROM u
      |), norm AS (
      |  SELECT doc_id, raw_url, scheme,
      |         regexp_replace(hostport, ':[0-9]+$', '') AS host,
      |         regexp_extract(hostport, ':([0-9]+)$', 1) AS port,
      |         CASE WHEN regexp_replace(path0, '/+$', '') = '' THEN '/'
      |              ELSE regexp_replace(path0, '/+$', '') END AS path,
      |         CASE WHEN q = '' THEN ''
      |              ELSE array_to_string(list_sort(string_split(q, '&')), '&') END AS sq
      |  FROM parts
      |), canon AS (
      |  SELECT doc_id, raw_url, host AS domain,
      |         scheme || '://' || host
      |         || CASE WHEN port <> '' AND NOT ((scheme = 'https' AND port = '443')
      |                                       OR (scheme = 'http' AND port = '80'))
      |                 THEN ':' || port ELSE '' END
      |         || path
      |         || CASE WHEN sq <> '' THEN '?' || sq ELSE '' END AS canon_url
      |  FROM norm
      |)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_url_canon" ->
      (urlCtes + "\nSELECT doc_id, raw_url, canon_url FROM canon"),

    "q_url_dedup" ->
      (urlCtes + """
        |SELECT canon_url, MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_docs
        |FROM canon GROUP BY canon_url""".stripMargin),

    "q_domain_cap" ->
      (urlCtes + """
        |SELECT doc_id, domain, rk, rk <= 40 AS kept FROM (
        |  SELECT doc_id, domain,
        |         CAST(row_number() OVER (
        |           PARTITION BY domain
        |           ORDER BY CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT),
        |                    doc_id) AS BIGINT) AS rk
        |  FROM canon)""".stripMargin),

    "q_domain_stats" ->
      (urlCtes + """
        |, per AS (
        |  SELECT domain, COUNT(*) AS n_docs,
        |         COUNT(DISTINCT canon_url) AS n_canon
        |  FROM canon GROUP BY domain
        |)
        |SELECT domain, n_docs, n_canon,
        |       ROUND(1.0 - n_canon / CAST(n_docs AS DOUBLE), 6) AS dup_ratio,
        |       ROUND(n_docs / CAST((SELECT COUNT(*) FROM canon) AS DOUBLE), 6) AS share
        |FROM per""".stripMargin))
}
