package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole ScalaTest run (JVM-wide lazy val —
  * Spark session startup dominates small-suite runtime otherwise).
  */
object SparkFixture {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

trait SparkSpec {
  lazy val spark: SparkSession = SparkFixture.spark
}
