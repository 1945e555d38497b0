package graft.layout

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.ops.Tables

/** Partitioned-table layout + the dynamic-partition-pruning proof — the
  * other half of the file-skipping story next to [[ZOrder]]: Z-order cuts
  * files WITHIN a partition via footer min/max boxes; date partitioning
  * cuts whole directories before any footer is opened, and DPP extends
  * that to runtime — a join against a filtered dimension prunes fact
  * partitions using the dim's VALUES, discovered during execution, not
  * just static predicates.
  */
object Partitioning {

  private val written = scala.collection.concurrent.TrieMap.empty[String, String]

  /** One-time (per JVM × sf dir × fixture generation) materialization of
    * orders partitioned by order month (`o_month=yyyy-MM/` directories) —
    * the layout a production fact table ships with, here built on demand so
    * catalog queries can exercise partition-wise plans against it. The dir
    * name carries the source file's (mtime, size) so a fixture refresh
    * between rounds can never serve a stale layout. `repartition` on the
    * partition column first: without it every input task writes a file
    * into every month dir (tasks × partitions small files — the
    * anti-pattern [[Compaction]] exists to clean up).
    */
  def partitionedOrdersDir(spark: SparkSession, sfDir: String): String =
    written.synchronized {
      written.getOrElseUpdate(sfDir, {
        val src = new java.io.File(s"$sfDir/orders.parquet")
        val stamp = s"${src.lastModified()}_${src.length()}"
        val dir = new java.io.File(
          sys.props("java.io.tmpdir"),
          s"graft_orders_by_month_${math.abs(sfDir.hashCode)}_$stamp")
        if (!new java.io.File(dir, "_SUCCESS").exists()) {
          Tables.orders(spark, sfDir)
            .withColumn("o_month", date_format(col("o_orderdate"), "yyyy-MM"))
            .repartition(col("o_month"))
            .write.mode("overwrite").partitionBy("o_month")
            .parquet(dir.getAbsolutePath)
        }
        dir.getAbsolutePath
      })
    }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Monthly order volume/revenue restricted to months where a selective
    // lineitem pattern shipped (returned, max-quantity, deep-discount
    // rows). The month set is computed AT RUNTIME from the dim side, so a
    // static partition filter cannot express it — the fact scan must carry
    // a dynamicpruning partition filter (PlanShapeSpec pins it) and read
    // only the qualifying month directories. At 100 TB: the dim subquery
    // broadcasts, and the fact side opens ~3% of its partitions instead
    // of all 80.
    "q_dpp" -> ((s, d) => {
      val fact = s.read.parquet(partitionedOrdersDir(s, d))
      val dim = Tables.lineitem(s, d)
        .filter(col("l_returnflag") === "R" &&
          col("l_quantity") > 49 && col("l_discount") > 0.09)
        .select(date_format(col("l_shipdate"), "yyyy-MM").as("o_month"))
        .distinct()
      fact.join(broadcast(dim), Seq("o_month"))
        .groupBy(col("o_month"))
        .agg(
          count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast(DecimalType(28, 6)))
            .cast("double").as("total_price"))
    }))

  val oracles: Map[String, String] = Map(
    // Values are layout-independent: the same join/agg over the original
    // (unpartitioned) orders — DuckDB proves the partitioned path changed
    // WHERE bytes were read, not WHAT was computed.
    "q_dpp" ->
      """WITH dim AS (
        |  SELECT DISTINCT strftime(l_shipdate, '%Y-%m') AS o_month
        |  FROM lineitem
        |  WHERE l_returnflag = 'R' AND l_quantity > 49 AND l_discount > 0.09
        |)
        |SELECT strftime(o.o_orderdate, '%Y-%m') AS o_month,
        |       COUNT(*) AS n_orders,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total_price
        |FROM orders o JOIN dim ON strftime(o.o_orderdate, '%Y-%m') = dim.o_month
        |GROUP BY 1""".stripMargin)
}
