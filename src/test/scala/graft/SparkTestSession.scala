package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (small + deterministic). */
object SparkTestSession {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    // bucketed-table tests need a catalog-backed warehouse; keep it in target/
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
    .getOrCreate()
}

trait SparkTest {
  lazy val spark: SparkSession = SparkTestSession.spark
}
