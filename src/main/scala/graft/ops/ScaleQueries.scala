package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Catalog entries for the scale-pattern operators: shapes whose whole
  * point is surviving hot keys and data-scale permutations ([[SaltedAgg]],
  * [[graft.prep.ShuffleShard]]); values stay bit-exact, so both are
  * value-oracled.
  */
object ScaleQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Two-stage salted aggregation over the 3-value l_returnflag key —
    // the canonical hot-key histogram: the salted result is bit-identical
    // to the direct groupBy (associative long sums), which is exactly
    // what the oracle's plain GROUP BY replays.
    "q_salted_agg" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(
        col("l_returnflag"),
        col("l_orderkey"), col("l_linenumber"),
        floor(col("l_extendedprice") * 100d + lit(0.5d)).cast("long").as("cents"),
        floor(col("l_quantity") + lit(0.5d)).cast("long").as("qty"))
      SaltedAgg.sumCount(li, Seq("l_returnflag"), Seq("cents", "qty"),
        saltOn = Seq("l_orderkey", "l_linenumber"), salts = 16)
    }),

    // Deterministic corpus shuffle + sharding: seeded-md5 global order,
    // distributed two-pass exact rank, shard/pos hash-checked per row
    // against the SQL row_number replay.
    "q_shuffle_shard" -> ((s, d) =>
      graft.prep.ShuffleShard.shard(Tables.documents(s, d), "doc_id",
        seed = "epoch0", shardSize = 1000L)),

    // Dominant principal direction: ONE distributed Gram pass, then exact
    // integer power iteration on the driver's d×d readout — every step
    // replayed bit-for-bit by the oracle's unrolled CTE chain.
    "q_pca_power" -> ((s, d) =>
      graft.sim.Pca.directionReadout(Tables.embeddings(s, d), "embedding",
        dim = 8, iters = 6)),

    // The data-scale face of the same pipeline: broadcast-literal integer
    // dot per row + TakeOrderedAndProject top-10 by |projection|.
    "q_pca_project" -> ((s, d) =>
      graft.sim.Pca.projectTopK(Tables.embeddings(s, d), "vec_id",
        "embedding", dim = 8, iters = 6, k = 10)),

    // Per-group top-k as a bounded aggregate (no WindowExec, no full-data
    // sort-exchange): shuffle carries k rows per (group, partition).
    "q_topk_agg" -> ((s, d) =>
      TopKAgg.topK(Tables.orders(s, d), Seq("o_orderpriority"),
        "o_orderkey", "o_totalprice", k = 3)),

    // Pareto frontier on (price, size), both minimized: local skyline per
    // partition, final pass over per-partition frontiers only.
    "q_skyline" -> ((s, d) =>
      Skyline.skyline(Tables.part(s, d), Seq("p_retailprice", "p_size"))
        .select(col("p_partkey"), col("p_retailprice"),
          col("p_size").cast("long").as("p_size"))),

    // Golden record per user over events, with nulls planted
    // deterministically (click rows carry no value) so the per-column
    // latest-NON-NULL rule does real work — one hash aggregate, no
    // window-per-column.
    "q_golden_record" -> ((s, d) => {
      val e = Tables.events(s, d).withColumn("v",
        when(col("event_type") === "click", lit(null).cast("double"))
          .otherwise(col("value")))
      Survivorship.goldenRecord(e, "user_id", "ts", "event_id",
        Seq("event_type", "v"))
    }),

    // Interval coalescing: each event opens a 5-minute validity span;
    // overlapping spans per user merge into islands. Exact microsecond
    // longs end to end.
    "q_interval_merge" -> ((s, d) => {
      val iv = Tables.events(s, d).select(col("user_id"),
        unix_micros(col("ts")).as("s"),
        (unix_micros(col("ts")) + lit(300000000L)).as("e"))
      IntervalMerge.merge(iv, "user_id", "s", "e")
    }),

    // Export integrity manifest over the sharded corpus: per-shard counts,
    // dense-position bounds, and an order-independent content checksum —
    // what a training job validates before reading a shard.
    "q_shard_manifest" -> ((s, d) =>
      graft.prep.ShuffleShard.shard(Tables.documents(s, d), "doc_id",
          seed = "epoch0", shardSize = 1000L)
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("pos")).as("pos_lo"), max(col("pos")).as("pos_hi"),
          sum(conv(substring(md5(col("id").cast("string")), 1, 8), 16, 10)
            .cast("long")).as("checksum"))))

  val oracles: Map[String, String] = Map(
    "q_salted_agg" ->
      """SELECT l_returnflag, count(*) AS n,
        |  CAST(sum(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents,
        |  CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem GROUP BY 1""".stripMargin,

    "q_shuffle_shard" ->
      """SELECT doc_id AS id, rn // 1000 AS shard, rn % 1000 AS pos
        |FROM (
        |  SELECT doc_id,
        |    row_number() OVER (ORDER BY md5('epoch0:' || doc_id), doc_id) - 1 AS rn
        |  FROM documents) t""".stripMargin,

    "q_pca_power" -> graft.sim.Pca.oracleSql("vec_id", dim = 8, iters = 6,
      fin = "SELECT i, v FROM v6"),

    "q_pca_project" -> graft.sim.Pca.oracleSql("vec_id", dim = 8, iters = 6,
      fin = """, proj AS (
        |  SELECT q.id AS id, CAST(sum(q.q[v.i] * v.v) AS BIGINT) AS score
        |  FROM q, v6 v GROUP BY 1)
        |SELECT id, score FROM proj
        |ORDER BY abs(score) DESC, id LIMIT 10""".stripMargin),

    "q_topk_agg" ->
      """SELECT o_orderpriority, rn AS rank, o_orderkey, o_totalprice
        |FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 3""".stripMargin,

    "q_skyline" ->
      """SELECT p_partkey, p_retailprice, CAST(p_size AS BIGINT) AS p_size
        |FROM part p
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM part q
        |  WHERE q.p_retailprice <= p.p_retailprice AND q.p_size <= p.p_size
        |    AND (q.p_retailprice < p.p_retailprice OR q.p_size < p.p_size))"""
        .stripMargin,

    "q_golden_record" ->
      """WITH base AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    CASE WHEN event_type = 'click' THEN NULL ELSE value END AS v
        |  FROM events),
        |et AS (
        |  SELECT user_id, event_type FROM (
        |    SELECT user_id, event_type, row_number() OVER (
        |      PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM base WHERE event_type IS NOT NULL) t WHERE rn = 1),
        |vv AS (
        |  SELECT user_id, v FROM (
        |    SELECT user_id, v, row_number() OVER (
        |      PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM base WHERE v IS NOT NULL) t WHERE rn = 1),
        |agg AS (
        |  SELECT user_id, max(ts) AS last_ts, count(*) AS n
        |  FROM base GROUP BY 1)
        |SELECT agg.user_id, et.event_type, vv.v, agg.last_ts, agg.n
        |FROM agg
        |LEFT JOIN et ON agg.user_id = et.user_id
        |LEFT JOIN vv ON agg.user_id = vv.user_id""".stripMargin,

    "q_interval_merge" ->
      """WITH iv AS (
        |  SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) + 300000000 AS e
        |  FROM events),
        |m AS (
        |  SELECT user_id, s, e, max(e) OVER (PARTITION BY user_id
        |    ORDER BY s, e ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |    AS pm
        |  FROM iv),
        |f AS (
        |  SELECT user_id, s, e,
        |    CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END AS ni
        |  FROM m),
        |g AS (
        |  SELECT user_id, s, e, sum(ni) OVER (PARTITION BY user_id
        |    ORDER BY s, e ROWS UNBOUNDED PRECEDING) AS island
        |  FROM f)
        |SELECT user_id, CAST(island AS BIGINT) AS island,
        |  min(s) AS start, max(e) AS "end", count(*) AS n_rows
        |FROM g GROUP BY 1, 2""".stripMargin,

    "q_shard_manifest" ->
      """WITH r AS (
        |  SELECT doc_id AS id,
        |    row_number() OVER (ORDER BY md5('epoch0:' || doc_id), doc_id) - 1
        |      AS rn
        |  FROM documents),
        |sh AS (SELECT id, rn // 1000 AS shard, rn % 1000 AS pos FROM r)
        |SELECT shard, count(*) AS n_docs, min(pos) AS pos_lo,
        |  max(pos) AS pos_hi,
        |  CAST(sum(CAST('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 8)
        |    AS BIGINT)) AS BIGINT) AS checksum
        |FROM sh GROUP BY 1""".stripMargin)
}
