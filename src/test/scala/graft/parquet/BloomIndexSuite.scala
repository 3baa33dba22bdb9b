package graft.parquet

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bloom sidecar index: no-false-negative pruning, skip counts, readback. */
class BloomIndexSuite extends AnyFunSuite with SparkTest {

  import spark.implicits._

  test("BloomBits never false-negatives and rarely false-positives") {
    val bits = new Array[Long](1 << (16 - 6))
    val inserted = (0 until 500).map(i => i * 2654435761L)
    inserted.foreach(h => BloomBits.insert(bits, h, 16, 5))
    inserted.foreach(h => assert(BloomBits.mightContain(bits, h, 16, 5)))
    val fps = (0 until 10000).count(i =>
      BloomBits.mightContain(bits, i * 40503L + 17, 16, 5))
    // 500 keys in 65536 bits, k=5: fpp ~ 0.4% — allow a wide margin
    assert(fps < 300, s"false-positive count too high: $fps")
  }

  private def writeRanged(dir: String): Unit = {
    (0 until 8000).map(i => (i.toLong, i % 100, s"p$i"))
      .toDF("key", "grp", "payload")
      .repartitionByRange(8, col("key"))
      .write.mode("overwrite").parquet(dir)
  }

  test("pruned read equals the direct filtered read and skips files") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bloom").toString + "/data"
    writeRanged(dir)
    BloomIndex.writeBloomIndex(spark, dir, "key", logBits = 18, k = 5)
    val probe = Seq(5L, 4242L)
    val report = BloomIndex.pruningReport(spark, dir, "key", probe)
    assert(report.size == 8, s"one sidecar row per file: ${report.size}")
    val kept = report.count(_._2)
    assert(kept >= 1 && kept < 8, s"range-clustered keys must skip files: kept=$kept")

    val pruned = BloomIndex.prunedParquet(spark, dir, "key", probe)
      .orderBy("key").collect().toSeq
    val direct = spark.read.parquet(dir).filter(col("key").isin(probe: _*))
      .orderBy("key").collect().toSeq
    assert(pruned == direct && pruned.nonEmpty)
  }

  test("sidecar directory is invisible to plain reads of the data dir") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bloomv").toString + "/data"
    writeRanged(dir)
    val before = spark.read.parquet(dir).count()
    BloomIndex.writeBloomIndex(spark, dir, "key")
    assert(spark.read.parquet(dir).count() == before,
      "underscore sidecar must not join the data scan")
    assert(spark.read.parquet(dir).columns.toSeq == Seq("key", "grp", "payload"))
  }

  test("probing only absent keys reads nothing or prunes everything") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bloomn").toString + "/data"
    writeRanged(dir)
    BloomIndex.writeBloomIndex(spark, dir, "key", logBits = 18, k = 5)
    val res = BloomIndex.prunedParquet(spark, dir, "key", Seq(999999L))
    assert(res.count() == 0)
  }

  test("string columns probe through the same cast-then-hash path") {
    val dir = java.nio.file.Files.createTempDirectory("graft_blooms").toString + "/data"
    (0 until 2000).map(i => (i, s"user_$i")).toDF("id", "name")
      .repartitionByRange(4, col("id"))
      .write.mode("overwrite").parquet(dir)
    BloomIndex.writeBloomIndex(spark, dir, "name", logBits = 18, k = 5)
    val got = BloomIndex.prunedParquet(spark, dir, "name", Seq("user_77"))
      .select("id").as[Int].collect().toSeq
    assert(got == Seq(77))
  }
}
