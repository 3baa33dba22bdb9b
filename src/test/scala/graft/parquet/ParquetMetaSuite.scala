package graft.parquet

import graft.SparkTest
import graft.parquet.implicits._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ParquetMetaSuite extends AnyFunSuite with SparkTest {
  import spark.implicits._

  val lineitem = "/root/testdata/sf0.001/lineitem.parquet"
  val orders = "/root/testdata/sf0.001/orders.parquet"

  test("parquetMetadata reports file facts matching the data") {
    val meta = spark.read.parquetMetadata(lineitem)
    assert(meta.columns.toSeq === Seq("filename", "blocks", "compressedBytes",
      "uncompressedBytes", "rows", "columns", "values", "nulls", "createdBy", "schema",
      "encryption", "keyValues"))
    val rows = meta.select(sum($"rows")).as[Long].head()
    val actual = spark.read.parquet(lineitem).count()
    assert(rows === actual)
    assert(meta.count() >= 1)
  }

  test("parquetMetadata over multiple paths") {
    val meta = spark.read.parquetMetadata(lineitem, orders)
    val files = meta.select($"filename").as[String].collect().toSet
    assert(files.exists(_.contains("lineitem")) && files.exists(_.contains("orders")))
  }

  test("parquetSchema lists leaf columns") {
    val schema = spark.read.parquetSchema(lineitem)
    val cols = schema.select($"columnName").as[String].collect().toSet
    assert(cols.contains("l_orderkey") && cols.contains("l_shipdate"))
    assert(schema.filter($"type" === "DOUBLE").count() > 0)
  }

  test("parquetBlocks row counts sum to table size") {
    val blocks = spark.read.parquetBlocks(lineitem)
    assert(blocks.select(sum($"rows")).as[Long].head() === spark.read.parquet(lineitem).count())
    assert(blocks.select(min($"block")).as[Long].head() === 1L)
  }

  test("parquetBlockColumns exposes codecs and stats") {
    val bc = spark.read.parquetBlockColumns(lineitem)
    val cols = bc.select($"column").as[String].collect().toSet
    assert(cols.contains("l_orderkey"))
    val nulls = bc.filter($"nulls".isNull || $"nulls" < 0).count()
    assert(nulls === 0) // all stats readable on plain files
    assert(bc.filter($"encrypted" === true).count() === 0)
  }

  test("parquetPartitions covers all rows exactly once") {
    val parts = spark.read.parquetPartitions(lineitem)
    assert(parts.select(sum($"rows")).as[Long].head() === spark.read.parquet(lineitem).count())
    assert(parts.select(countDistinct($"partition")).as[Long].head() === parts.count())
  }

  test("parquetPartitions respects maxPartitionBytes") {
    val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "8192")
      val parts = spark.read.parquetPartitions(lineitem)
      assert(parts.count() > 1) // small splits => several partitions
      assert(parts.select(sum($"rows")).as[Long].head() === spark.read.parquet(lineitem).count())
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
  }

  test("explicit parallelism controls task count") {
    val meta = spark.read.parquetMetadata(2, lineitem, orders)
    assert(meta.rdd.getNumPartitions === 2)
  }

  test("ZoneMap pruning report matches the actual data ranges per group") {
    import graft.parquet.ZoneMap
    val d = java.nio.file.Files.createTempDirectory("graft_zm").toString + "/zm"
    spark.range(0, 40000).toDF("k")
      .repartition(1).sortWithinPartitions("k")
      .write.option("parquet.block.size", "65536").parquet(d)
    val rep = ZoneMap.pruningReport(spark, Seq(d), "k", 0.0, 1000.0)
      .orderBy("block").collect()
    assert(rep.length > 1) // tiny block size -> several row groups
    // referee: re-derive each group's true min/max by reading the data in
    // block order (file is sorted + single part, so groups are contiguous)
    var offset = 0L
    rep.foreach { r =>
      val n = r.getAs[Long]("n_values")
      val lo = offset              // first value of this group
      val hi = offset + n - 1      // last value
      val expected = hi < 0.0 || lo > 1000.0
      assert(r.getAs[Boolean]("skippable") === expected,
        s"block ${r.getAs[Long]("block")}: [$lo,$hi]")
      offset += n
    }
    assert(offset === 40000L)
    val sum = ZoneMap.pruningSummary(spark, Seq(d), "k", 0.0, 1000.0).collect().head
    assert(sum.getAs[Long]("n_blocks") === rep.length.toLong)
    assert(sum.getAs[Double]("skip_fraction") > 0.5) // most groups above 1000
  }
}
