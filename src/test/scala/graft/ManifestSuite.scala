package graft

import graft.write.Manifest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Export manifest: clean verify, and every drift class flips ok. */
class ManifestSuite extends AnyFunSuite with SparkTest {

  import spark.implicits._

  private def freshExport(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_man").toString + "/out"
    (0 until 3000).map(i => (i.toLong, s"doc$i", i % 7))
      .toDF("id", "text", "grp")
      .repartition(4)
      .write.mode("overwrite").parquet(dir)
    // writeWithManifest overwrites; reuse its manifest-from-disk path
    Manifest.writeWithManifest(
      spark.read.parquet(dir), dir + "2")
    dir + "2"
  }

  test("a clean snapshot verifies: every file ok, totals exact") {
    val dir = freshExport()
    val per = Manifest.verifyManifest(spark, dir).collect()
    assert(per.nonEmpty && per.forall(_.getAs[Boolean]("ok")))
    val s = Manifest.verifySummary(spark, dir).head()
    assert(s.getAs[Long]("total_rows") == 3000L)
    assert(s.getAs[Boolean]("all_ok"))
  }

  test("fingerprint is independent of row order and partitioning") {
    val dir = java.nio.file.Files.createTempDirectory("graft_man2").toString
    val df = (0 until 500).map(i => (i.toLong, s"d$i")).toDF("id", "text")
    Manifest.writeWithManifest(df.coalesce(1), s"$dir/a")
    Manifest.writeWithManifest(
      df.orderBy(desc("id")).coalesce(1), s"$dir/b")
    val fa = spark.read.parquet(Manifest.manifestPath(s"$dir/a"))
      .select("rows", "fingerprint").head()
    val fb = spark.read.parquet(Manifest.manifestPath(s"$dir/b"))
      .select("rows", "fingerprint").head()
    assert(fa == fb, "same content must fingerprint identically regardless of order")
  }

  test("a deleted file flips its row and the summary") {
    val dir = freshExport()
    val victim = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
      .head
    assert(victim.delete())
    val bad = Manifest.verifyManifest(spark, dir)
      .filter(!col("ok")).collect()
    assert(bad.length == 1)
    assert(bad.head.getAs[Any]("rows_actual") == null, "missing file: no actual side")
    assert(!Manifest.verifySummary(spark, dir).head().getAs[Boolean]("all_ok"))
  }

  test("an extra (foreign) file flips verification") {
    val dir = freshExport()
    // sneak one more parquet file into the directory
    Seq((999999L, "intruder", 0)).toDF("id", "text", "grp")
      .coalesce(1).write.mode("append").parquet(dir)
    val bad = Manifest.verifyManifest(spark, dir).filter(!col("ok")).collect()
    assert(bad.length == 1)
    assert(bad.head.getAs[Any]("rows_expected") == null, "extra file: no expected side")
    assert(!Manifest.verifySummary(spark, dir).head().getAs[Boolean]("all_ok"))
  }
}
